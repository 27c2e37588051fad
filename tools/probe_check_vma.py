"""Reproducer for the XLA:CPU gpipe backward-collective deadlock.

This is the executable expiry condition for ``check_vma=False`` in
``svpc_tpu/parallel/pipeline.py`` (see the comment at the shard_map
call): with varying-manual analysis ON, the transposed tick gating makes
shard_map insert ``psum_invariant`` all-reduces in the backward scan body
that are dataflow-independent of that tick's reversed ``ppermute``;
XLA:CPU's concurrent thunk executor can order the two collectives
differently on different devices — a cross-device rendezvous deadlock,
reproduced deterministically under dp2×pp2×tp2 on the 8-virtual-device
host (2026-08-21, jax 0.8.x).

Run standalone (the canary test runs it in a subprocess under a timeout):

    JAX_PLATFORM_NAME=cpu JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python tools/probe_check_vma.py

Observed failure modes of ``check_vma=True`` on this configuration, any
of which keeps the workaround justified:

  * trace-time: the scan carry's varying-manual axes mismatch ({dp} in,
    {dp,pp} out after the ppermute) — the CURRENT mode on jax 0.8.x;
    repairing it with ``pcast`` is exactly what introduces the
    invariance-repair collectives that deadlocked the backward.
  * run-time: the cross-device collective rendezvous deadlock above
    (hang, or XLA:CPU's collective-timeout abort).
  * wrong gradients: an invariance miscompute (worse than the deadlock).

Exit codes:
  0 — forward + backward completed WITH ``check_vma=True`` and the
      gradients matched the sequential stack: the underlying bug is gone
      and the workaround should be retired (tests/test_vma_canary.py
      turns this into a loud failure with instructions).
  1 — completed but gradients were WRONG.
  3 — trace/compile-time rejection (the current mode).
  (hang / collective-timeout abort) — the deadlock class still exists;
      the canary treats any non-zero/timeout outcome as "workaround
      still justified".
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from svpc_tpu.parallel.mesh import make_mesh
    from svpc_tpu.parallel.pipeline import gpipe, pin_stacked_tp

    devices = jax.devices()
    if len(devices) < 8:
        print(f"probe needs 8 devices, have {len(devices)}", file=sys.stderr)
        return 2

    # Same geometry as tests/test_pipeline.py::test_gpipe_composes_with_dp_tp
    # — the configuration the deadlock was reproduced under — but with
    # check_vma=True (the one flag under probe).
    from svpc_tpu.config import tiny_test_config
    from svpc_tpu.parallel.pipeline import (encoder_stage_fn,
                                            init_stacked_encoder)

    cfg = tiny_test_config("video").model
    rng = jax.random.PRNGKey(0)
    n_layers, B, L = 4, 8, 6
    stacked = init_stacked_encoder(cfg, rng, n_layers, (B, L))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, L, cfg.hidden_size),
                          jnp.float32)
    mask = jnp.ones((B, L), jnp.float32)
    stage_fn = encoder_stage_fn(cfg)

    mesh = make_mesh(2, 2, 2)
    n_micro = 2
    mbs = (x.reshape(n_micro, -1, *x.shape[1:]),
           mask.reshape(n_micro, -1, mask.shape[1]))

    def loss_pipe(p):
        y, _ = gpipe(stage_fn, pin_stacked_tp(p, mesh), mbs, mesh,
                     batch_axis="dp", check_vma=True)
        return jnp.sum(y ** 2)

    def loss_seq(p):
        act = (x, mask)
        for i in range(n_layers):
            p_i = jax.tree_util.tree_map(lambda a: a[i], p)
            act = stage_fn(p_i, act)
        return jnp.sum(act[0] ** 2)

    print("probe: compiling + running gpipe backward with check_vma=True "
          "on dp2xpp2xtp2 ...", flush=True)
    try:
        l_p, g_p = jax.jit(jax.value_and_grad(loss_pipe))(stacked)
        l_p = float(l_p)  # sync — the deadlock (if any) surfaces here
    except Exception as e:  # noqa: BLE001 — any rejection = still broken
        print(f"probe: check_vma=True rejected at trace/compile time "
              f"({type(e).__name__}): {str(e).splitlines()[0][:200]}",
              flush=True)
        return 3
    print(f"probe: completed, loss={l_p:.4f}; checking gradients",
          flush=True)

    l_s, g_s = jax.jit(jax.value_and_grad(loss_seq))(stacked)
    if not np.isclose(l_p, float(l_s), rtol=1e-5):
        print(f"probe: LOSS MISMATCH {l_p} vs {float(l_s)}", flush=True)
        return 1
    flat_s = dict(jax.tree_util.tree_leaves_with_path(g_s))
    for path, leaf in jax.tree_util.tree_leaves_with_path(g_p):
        if not np.allclose(np.asarray(leaf), np.asarray(flat_s[path]),
                           rtol=2e-4, atol=1e-4):
            print(f"probe: GRAD MISMATCH at {jax.tree_util.keystr(path)}",
                  flush=True)
            return 1
    print("probe: check_vma=True ran CLEAN with correct gradients",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
