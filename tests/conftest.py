"""Test harness config: run all tests on a virtual 8-device CPU mesh so the
multi-chip sharding paths execute without TPU hardware.

Environment note: this image's sitecustomize force-registers the axon TPU
plugin and overrides JAX_PLATFORMS with "axon,cpu" (see
/root/.axon_site/axon/register/pjrt.py:112), so the env-var route is not
enough — the platform must be switched back with jax.config.update before
any backend is initialized."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

os.environ.setdefault("QPN_PALLAS_STRICT", "1")   # kernel failures fail tests

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
