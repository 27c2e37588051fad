"""AOT memory accounting of the pipeline-parallel train program at depth.

docs/DESIGN.md §5 claims (a) pipeline parallelism is "worth it only for
deeper trunks than the 2+2 flagship" and (b) "remat recovers the 1F1B
memory footprint".  This tool replaces both assertions with numbers
(round-4 VERDICT item 1), using the same `compiled.memory_analysis()`
treatment the remat feature got in BASELINE.md — XLA's own per-device
accounting of the EXACT train executable `cli.train` would run:

  * ``flat``  — the single-chip / pure-dp program at a depth sweep
    (per-device bytes of a dp mesh = the single-chip program at the
    local batch, so this leg runs on the REAL TPU chip when available);
  * ``pp``    — the dp2xpp2 gpipe program with pipeline-RESIDENT params
    + Adam moments + EMA (stacked `layers` subtrees sharded
    P("pp", ...)), compiled over the 4-virtual-CPU-device mesh (no
    multi-chip hardware here; byte accounting is structural);
  * both with and without remat.

Per config it records per-device argument bytes (params + optimizer
state + batch; donation aliases them), temp bytes (activation /
backward scratch — the quantity the DESIGN claims are about), and the
exact param+moment+EMA resident bytes computed from the sharded state
pytree (must read ~1/pp under pp).  A bubble model
(``(pp-1)/(n_micro+pp-1)``) turns the flat throughput into the
pp-adjusted prediction so the crossover depth can be stated.

Usage (writes tools/pp_memory_r05.json, prints a table):

    python tools/bench_pp_memory.py            # flat leg (TPU if available)
    python tools/bench_pp_memory.py --pp-cpu   # pp leg (self-execs with a
                                               # forced 4-device CPU host)

Results analysed in BASELINE.md ("Pipeline memory at depth") and
docs/DESIGN.md §5.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "pp_memory_r05.json")

# local (per-dp-shard) batch: held FIXED across flat and pp configs so
# per-device activation bytes are comparable; 8 full-step videos = 96
# clips per shard, the same composition bench.py times.
LOCAL_BATCH = 8
DEPTHS_FLAT = (2, 4, 8, 16, 32)
DEPTHS_PP = (8, 16)


def _mem(compiled):
    ms = compiled.memory_analysis()
    return {
        "arg_bytes": int(ms.argument_size_in_bytes),
        "out_bytes": int(ms.output_size_in_bytes),
        "alias_bytes": int(ms.alias_size_in_bytes),
        "temp_bytes": int(ms.temp_size_in_bytes),
        "code_bytes": int(ms.generated_code_size_in_bytes),
    }


def _state_bytes(state, n_shards=1):
    """Exact per-device resident bytes of params + Adam moments + EMA,
    from the state pytree itself (shard-aware when leaves are sharded)."""
    import jax

    def leaf_bytes(x):
        if hasattr(x, "addressable_shards") and x.addressable_shards:
            sh = x.addressable_shards[0].data
            return sh.size * sh.dtype.itemsize
        return x.size * x.dtype.itemsize

    total = 0
    for leaf in jax.tree_util.tree_leaves(
            (state.params, state.opt_state, state.ema_shadow)):
        total += leaf_bytes(leaf)
    return total


def _cfg(depth, remat):
    from svpc_tpu.config import Config, ModelConfig, TrainConfig
    # the bench/production configuration: bf16 compute, bf16 Adam/EMA
    return Config(
        model=ModelConfig(model_mode="full", compute_dtype="bfloat16",
                          num_hidden_layers=depth, remat=remat),
        train=TrainConfig(optimizer_dtype="bfloat16"))


def _batch(cfg, batch_size):
    import jax.numpy as jnp
    from svpc_tpu.data.packing import pack_batch
    from svpc_tpu.data.synthetic import synthetic_batch
    b = synthetic_batch(cfg, batch_size=batch_size, seed=0,
                        full_steps=True)
    clips = float(b["step_mask"].sum())
    b = pack_batch(b, cfg.model.max_t_len, clip_multiple=16)
    return {k: jnp.asarray(v) for k, v in b.items()}, clips


def measure_flat(depth, remat):
    """Single-device program == the per-device view of any pure-dp mesh
    at the same local batch."""
    import jax
    import jax.numpy as jnp
    from svpc_tpu.model import SVPCModel
    from svpc_tpu.precision import precision_scope
    from svpc_tpu.train.optim import make_optimizer, training_rng
    from svpc_tpu.train.state import TrainState
    from svpc_tpu.train.step import make_train_step

    cfg = _cfg(depth, remat)
    model = SVPCModel(cfg.model)
    batch, clips = _batch(cfg, LOCAL_BATCH)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2)}
    with precision_scope(cfg.model):
        abstract = jax.eval_shape(
            lambda: model.init(rngs, batch, deterministic=True))
        params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                              abstract)
        tx = make_optimizer(cfg.train, steps_per_epoch=100)
        state = TrainState.create(params, tx, use_ema=True,
                                  ema_dtype="bfloat16")
        rng = training_rng(3, cfg.train.rng_impl)
        compiled = jax.jit(make_train_step(model, tx, cfg),
                           donate_argnums=0).lower(
            state, batch, rng).compile()
    rec = dict(config="flat", depth=depth, remat=remat,
               local_batch=LOCAL_BATCH, clips_per_device=clips,
               devices=1, state_bytes=_state_bytes(state), **_mem(compiled))
    import jax as _j
    rec["backend"] = _j.devices()[0].platform
    return rec


def measure_pp(depth, remat, dp=2, pp=2, n_micro=2):
    """The real dp×pp gpipe train program with pipeline-resident state."""
    import jax
    import jax.numpy as jnp
    from svpc_tpu.model import SVPCModel
    from svpc_tpu.parallel.mesh import (make_mesh, replicated_sharding,
                                        shard_batch, shard_params,
                                        state_shardings)
    from svpc_tpu.parallel.pipeline import stack_trunk_params
    from svpc_tpu.precision import precision_scope
    from svpc_tpu.train.optim import make_optimizer, training_rng
    from svpc_tpu.train.state import TrainState
    from svpc_tpu.train.step import make_train_step

    cfg = _cfg(depth, remat)
    cfg = cfg.replace_train(pp_size=pp, dp_size=dp,
                            pp_microbatches=n_micro)
    mesh = make_mesh(dp, 1, pp)
    model = SVPCModel(cfg.model, pp_mesh=mesh)
    # global batch: LOCAL_BATCH per dp shard
    from svpc_tpu.data.packing import pack_batch
    from svpc_tpu.data.synthetic import synthetic_batch
    gb = synthetic_batch(cfg, batch_size=LOCAL_BATCH * dp, seed=0,
                         full_steps=True)
    clips = float(gb["step_mask"].sum()) / dp
    gb = pack_batch(gb, cfg.model.max_t_len, clip_multiple=16,
                    dp_shards=dp)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2)}
    with precision_scope(cfg.model):
        jb = jax.device_put({k: jnp.asarray(v) for k, v in gb.items()},
                            replicated_sharding(mesh))
        abstract = jax.eval_shape(
            lambda: model.init(rngs, jb, deterministic=True))
        params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                              abstract)
        # the exact placement ladder train() uses for --pp_size (no
        # zero1): stack trunks, create state, then one whole-state
        # shard_params pass — params, Adam moments and EMA all land on
        # the resident P("pp", ...) layout (train/loop.py:444-464)
        params = {"params": stack_trunk_params(params["params"])}
        tx = make_optimizer(cfg.train, steps_per_epoch=100)
        state = TrainState.create(params, tx, use_ema=True,
                                  ema_dtype="bfloat16")
        state = shard_params(mesh, state)
        sharded = shard_batch(mesh, gb)
        rng = training_rng(3, cfg.train.rng_impl)
        out_sh = (state_shardings(state), replicated_sharding(mesh))
        compiled = jax.jit(make_train_step(model, tx, cfg),
                           donate_argnums=0,
                           out_shardings=out_sh).lower(
            state, sharded, rng).compile()
    rec = dict(config=f"dp{dp}xpp{pp}", depth=depth, remat=remat,
               local_batch=LOCAL_BATCH, clips_per_device=clips,
               devices=dp * pp, n_micro=n_micro,
               bubble=round((pp - 1) / (n_micro + pp - 1), 4),
               state_bytes=_state_bytes(state), **_mem(compiled))
    rec["backend"] = jax.devices()[0].platform
    return rec


def _append(rec):
    recs = []
    if os.path.exists(OUT):
        with open(OUT) as f:
            recs = json.load(f)
    # replace any earlier record of the same configuration
    key = (rec["config"], rec["depth"], rec["remat"], rec["backend"])
    recs = [r for r in recs
            if (r["config"], r["depth"], r["remat"], r["backend"]) != key]
    recs.append(rec)
    with open(OUT, "w") as f:
        json.dump(recs, f, indent=1)


def _show(rec):
    gb = 1 / (1024 ** 3)
    print(f"{rec['config']:>10} d={rec['depth']:<3} "
          f"remat={int(rec['remat'])} [{rec['backend']}] "
          f"args={rec['arg_bytes'] * gb:6.2f}G "
          f"temp={rec['temp_bytes'] * gb:6.2f}G "
          f"state={rec['state_bytes'] * gb:6.2f}G "
          f"alias={rec['alias_bytes'] * gb:6.2f}G", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pp-cpu", action="store_true",
                    help="measure the dp2xpp2 leg on a forced 4-device "
                         "CPU host (self-exec)")
    ap.add_argument("--depths", type=str, default="")
    ap.add_argument("--inner", action="store_true", help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.pp_cpu and not args.inner:
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from __graft_entry__ import _dryrun_env
        env = _dryrun_env(4)
        cmd = [sys.executable, os.path.abspath(__file__), "--pp-cpu",
               "--inner"]
        if args.depths:
            cmd += ["--depths", args.depths]
        sys.exit(subprocess.run(cmd, env=env).returncode)

    if args.pp_cpu:
        depths = ([int(d) for d in args.depths.split(",")]
                  if args.depths else DEPTHS_PP)
        for d in depths:
            for remat in (False, True):
                rec = measure_pp(d, remat)
                _append(rec)
                _show(rec)
    else:
        depths = ([int(d) for d in args.depths.split(",")]
                  if args.depths else DEPTHS_FLAT)
        for d in depths:
            for remat in (False, True):
                rec = measure_flat(d, remat)
                _append(rec)
                _show(rec)


if __name__ == "__main__":
    main()
