"""Pallas fused attention vs XLA's fused attention, across geometries.

The data behind the `use_pallas` default (off): at svpc geometry
(<=128-token clips, 768 hidden) XLA's automatic fusion wins; the Pallas
kernel takes over as sequences grow past the VMEM-friendly tile sizes it
blocks for. Run on a real TPU:

  python tools/bench_attention.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from svpc_tpu.ops.pallas_attention import fused_attention
    from svpc_tpu.model.layers import attention_core
    from svpc_tpu.runtime import init_runtime

    init_runtime()
    heads, h = 12, 768
    rows = []
    for n, l in [(96, 122), (96, 256), (32, 512), (16, 1024),
                 (8, 2048), (4, 4096)]:
        q = jax.random.normal(jax.random.PRNGKey(0), (n, l, h), jnp.bfloat16)
        mask = jnp.ones((n, 1, l), jnp.bfloat16)

        xla_fn = jax.jit(lambda q, m: attention_core(
            q, q, q, m, num_heads=heads, dropout_rate=0.0,
            deterministic=True))
        pl_fn = jax.jit(lambda q, m: fused_attention(q, q, q, m, heads))

        def bench(fn):
            out = fn(q, mask)
            out[0, 0, 0].astype(jnp.float32).item()
            t0 = time.perf_counter()
            for _ in range(20):
                out = fn(q, mask)
            out[0, 0, 0].astype(jnp.float32).item()
            return (time.perf_counter() - t0) / 20 * 1e3

        t_xla = bench(xla_fn)
        t_pl = bench(pl_fn)
        rows.append(dict(batch=n, seq=l, xla_ms=round(t_xla, 3),
                         pallas_ms=round(t_pl, 3),
                         winner="pallas" if t_pl < t_xla else "xla"))
        print(json.dumps(rows[-1]))


if __name__ == "__main__":
    main()
