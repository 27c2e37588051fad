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
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # 8 virtual device threads time-slice ONE core here; XLA:CPU kills
    # the whole process (SIGABRT) when a collective's participants don't
    # all arrive within its default 40 s — on heavy 8-device programs
    # (3-axis gpipe + zero1) that's routine starvation, not a deadlock
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
              " --xla_cpu_collective_call_terminate_timeout_seconds=600")
os.environ["XLA_FLAGS"] = flags

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
