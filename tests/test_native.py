"""Native C++ host-kernel tests: identical behavior to the Python fallback."""

import itertools

import numpy as np
import pytest

from qpn_tpu.utils import native


def test_native_builds():
    # the image ships g++; the library must build and load
    assert native.native_available()


def test_recipe_product_matches_itertools():
    J = [{1, 2}, {5}, {6, 7, 8}]
    got = {tuple(r) for r in native.recipe_product(J, 1000)}
    want = set(itertools.product(*[sorted(s) for s in J]))
    assert got == want


def test_recipe_product_cap():
    J = [{1, 2}] * 12            # 4096 combos
    out = native.recipe_product(J, 100)
    assert out.shape == (100, 12)
    assert len({tuple(r) for r in out}) == 100


def test_dedupe_rows_quantized():
    data = np.array([
        [0.1234567, 1.0],
        [0.1234572, 1.0],        # same at 5 digits
        [0.1234467, 1.0],        # different
        [0.1234567, 1.0],        # duplicate of row 0
    ])
    keep = native.dedupe_rows_mask(data)
    assert keep.tolist() == [True, False, True, False]


def test_dedupe_rows_inf_safe():
    data = np.array([[1e200, 0.0], [1e200, 0.0], [-1e200, 0.0]])
    keep = native.dedupe_rows_mask(data)
    assert keep.tolist() == [True, False, True]


def test_quantize_hash_consistency():
    data = np.random.default_rng(0).standard_normal((50, 4))
    h1 = native.quantize_hash(data)
    h2 = native.quantize_hash(data + 1e-9)   # below 5-digit resolution
    assert np.array_equal(h1, h2)
    h3 = native.quantize_hash(data + 1e-3)
    assert not np.array_equal(h1, h3)


def test_native_rounding_matches_numpy_half_to_even():
    """np.round is half-to-even; the native kernels must agree or piece
    hashes/dedup masks differ between machines with and without g++."""
    from qpn_tpu.utils import native
    rows = np.array([[0.5e-5], [0.0], [1.5e-5], [2.5e-5], [-0.5e-5]])
    mask = np.asarray(native.dedupe_rows_mask(rows, 5))
    # np.round: 0.5->0, 1.5->2, 2.5->2, -0.5->0  =>  rows 0,1,4 dedupe;
    # rows 2,3 dedupe
    np.testing.assert_array_equal(mask, [True, False, True, False, False])


def test_native_recipe_product_empty_row():
    """A row with an empty choice list means ZERO recipes (itertools
    semantics); the native kernel must not read past its offsets."""
    from qpn_tpu.utils import native
    assert native.recipe_product([{1}, set(), {2}], 100).shape == (0, 3)
    assert native.recipe_product([set()], 100).shape == (0, 1)
