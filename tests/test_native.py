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
