"""Test configuration: force CPU with 8 virtual devices.

Must run before jax initializes a backend; tests exercise the multi-chip
sharding paths on a virtual 8-device CPU mesh and Pallas kernels in
interpreter mode.
"""

import os

# NOTE: the environment presets JAX_PLATFORMS=axon (real TPU tunnel) and its
# boot hook re-forces it, so the env var alone is not enough — the
# jax.config.update("jax_platforms") call below is what actually wins.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# persistent compilation cache: re-runs of the suite skip XLA compiles
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.abspath(_cache_dir))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def small_skybox():
    """Deterministic small skybox texture, fp32 (64, 128, 4) of k/255."""
    from bhr_tpu.io.skybox import load_skybox

    return load_skybox(None, seed=7, shape=(64, 128))


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)
