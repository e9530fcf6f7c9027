"""Test harness configuration (SURVEY §4: multi-host tests without a pod
via a virtual CPU device mesh).

Must run before jax is imported anywhere: forces the CPU backend with 8
virtual devices and strips the axon TPU-tunnel plugin from the path (it
can block on its relay socket even when unused)."""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
os.environ["PYTHONPATH"] = ":".join(
    p for p in os.environ.get("PYTHONPATH", "").split(":")
    if ".axon_site" not in p)

# The axon sitecustomize imports jax at interpreter startup and calls
# jax.config.update("jax_platforms", "axon,cpu"), which silently
# overrides the JAX_PLATFORMS env var above — tests would then run on
# the TPU tunnel and golden images (CPU renders) would mismatch. Force
# the config back before any backend is initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
