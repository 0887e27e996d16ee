"""Test configuration: force CPU backend with an 8-device virtual mesh so
multi-chip sharding paths are exercised without TPU hardware (SURVEY.md §4).
Must run before jax is imported anywhere."""

import os

# Hard-set (not setdefault): the environment may pre-select a TPU platform
# (e.g. JAX_PLATFORMS=axon on tunneled-chip hosts) and tests must never
# contend with benchmark runs for the real chip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Some environments install a site hook that force-sets jax.config's
# jax_platforms (e.g. to "axon,cpu") at import time, silently overriding the
# env var above — the whole suite then runs on the remote TPU tunnel. Pin the
# config itself, which wins over the hook.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite's cost is XLA compile time, not
# compute; cache compiles across runs (and driver rounds).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault(
    "JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1"
)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
