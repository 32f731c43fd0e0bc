"""Test harness: run the whole suite on a virtual 8-device CPU mesh.

The axon sitecustomize forces ``jax_platforms="axon,cpu"`` (one real TPU
chip). Tests must be hermetic and exercise multi-device sharding, so we
flip JAX to CPU with 8 fake devices BEFORE any backend is initialised
(SURVEY.md §4 item 3: distributed-without-a-cluster).
"""

import os
import pathlib

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
# Separate persistent-compile-cache namespace for CPU runs, keyed by a
# host-CPU-feature fingerprint ({host} expands in deeplio_tpu.__init__):
# CPU AOT artifacts loaded on a host with different machine features risk
# SIGILL (round-2 multichip dryrun tail).
os.environ.setdefault("DEEPLIO_JAX_CACHE", str(
    pathlib.Path(__file__).resolve().parents[1] / ".jax_cache_cpu-{host}"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 fake CPU devices, got {len(devs)}"
    return devs
