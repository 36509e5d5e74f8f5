"""Test configuration: run JAX on a fake 8-device CPU backend.

This is the TPU-world equivalent of a fake multi-chip cluster (SURVEY.md §4):
sharding/pjit paths compile and execute against 8 virtual devices without
real hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell may export 'axon'
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")

# Hermetic persistent-compile-cache handling (round-5 SIGABRT fix): loading
# CPU AOT entries from the persistent cache aborts the process in this
# environment — even same-session, same-machine entries (measured: the full
# test_training module dies with SIGABRT in the first topo-device DP train
# step when a per-session tmp cache is enabled, and is green without it;
# tests/test_cache_hermetic.py pins the control). enable_compilation_cache()
# is therefore a no-op on the CPU backend, and the suite NEVER sets
# jax_compilation_cache_dir. The env pin below is defense in depth: if any
# code force-enables the cache anyway, it lands in a fresh per-session tmp
# dir, not the shared user-level cache.
import tempfile  # noqa: E402

_CACHE_TMP = tempfile.mkdtemp(prefix="dhoct-test-xla-cache-")
os.environ["DHOCT_COMPILATION_CACHE"] = _CACHE_TMP

# The axon sitecustomize (PYTHONPATH=/root/.axon_site) pins JAX_PLATFORMS to
# the TPU tunnel before conftest runs; the config API still wins.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
