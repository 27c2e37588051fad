"""Executable expiry condition for the ``check_vma=False`` workaround in
``svpc_tpu/parallel/pipeline.py`` (round-4 VERDICT item 5).

``gpipe`` permanently opts out of shard_map's varying-manual analysis to
dodge a real XLA:CPU backward-collective failure class (trace-time vma
carry mismatch on jax 0.8.x; the collective rendezvous deadlock when the
mismatch is pcast-repaired — see tools/probe_check_vma.py).  Nothing in
the suite would otherwise notice a JAX upgrade fixing the underlying bug
(the workaround would live on by archaeology) or changing its failure
mode.  This canary re-runs the reproducer with ``check_vma=True`` in a
subprocess under a timeout every suite run:

  * probe fails / times out  -> the workaround is still justified; PASS.
  * probe runs clean with correct gradients -> the justification has
    EXPIRED; this test fails with retirement instructions.
"""

import os
import subprocess
import sys

import pytest

_PROBE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools", "probe_check_vma.py")


@pytest.mark.slow
def test_check_vma_workaround_still_justified():
    # fresh subprocess: the probe must own its platform/device-count env
    # and a hang must be killable without taking the suite down
    env = dict(os.environ)
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if not f.startswith("--xla_force_host_platform_device_count")]
    flags.append("--xla_force_host_platform_device_count=8")
    # let a true deadlock surface as XLA's collective-timeout abort well
    # inside the subprocess timeout instead of as a kill
    flags = [f for f in flags if "collective_call" not in f]
    flags += ["--xla_cpu_collective_call_warn_stuck_timeout_seconds=60",
              "--xla_cpu_collective_call_terminate_timeout_seconds=120"]
    env["XLA_FLAGS"] = " ".join(flags)

    try:
        proc = subprocess.run(
            [sys.executable, _PROBE], env=env, timeout=420,
            capture_output=True, text=True)
    except subprocess.TimeoutExpired as e:
        # hang = the deadlock class still exists: workaround justified
        out = (e.stdout or b"").decode() if isinstance(e.stdout, bytes) \
            else (e.stdout or "")
        assert "completed" not in out or "CLEAN" not in out
        return

    if proc.returncode == 2:
        pytest.skip("probe could not get 8 virtual devices")
    assert proc.returncode != 0, (
        "check_vma=True now runs CLEAN with correct gradients on the "
        "dp2xpp2xtp2 reproducer — the XLA:CPU failure this workaround "
        "dodges is gone on this jax/jaxlib version.  Retire it "
        "deliberately: flip the `check_vma` default in "
        "svpc_tpu/parallel/pipeline.py::gpipe to True, re-run the "
        "pipeline parity ladder (tests/test_pipeline.py, tests/"
        "test_zero1.py) and the multichip dryrun, and update the "
        "shard_map comment + this canary.  Probe output:\n"
        + proc.stdout + proc.stderr)
    # any non-zero outcome (trace rejection, wrong grads, collective
    # abort, crash) = the failure class persists: workaround justified
