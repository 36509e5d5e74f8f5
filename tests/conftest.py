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
