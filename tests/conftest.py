"""Test configuration: force an 8-device CPU mesh before jax is imported
anywhere, so multi-chip sharding paths are exercised without TPUs.

NOTE: this environment pre-sets JAX_PLATFORMS=axon (a TPU plugin) which
wins over later JAX_PLATFORMS assignments; JAX_PLATFORM_NAME=cpu reliably
overrides it.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
# bit-exact f32 matmuls for parity tests
jax.config.update("jax_default_matmul_precision", "highest")


def pytest_report_header(config):
    return f"jax devices: {jax.devices()}"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute tests (paper-geometry parity); run by default, "
        "deselect with -m 'not slow' for a quick pass")
