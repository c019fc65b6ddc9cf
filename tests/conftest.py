"""Test config: force the CPU backend with 8 virtual devices so multi-chip
sharding tests run anywhere (the JAX idiom for meshes without hardware);
device-vs-golden parity on real TPU is exercised by bench.py instead."""

import os

# Force CPU even when a TPU plugin pre-imported jax at interpreter boot (the
# axon sitecustomize does) — env alone is not enough, the config update is.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def oracle():
    """The reference binary as a parity oracle; skips if unavailable."""
    from tests.oracle.build_oracle import build_oracle, run_oracle

    if build_oracle() is None:
        pytest.skip("reference sources not available")
    return run_oracle
