"""Training state + checkpointing.

Unlike the reference (which saves only model weights — no optimizer/EMA
state, so no true mid-training resume; train.py:401-405), checkpoints here
carry params, optimizer moments, EMA shadow, step and epoch, enabling
exact resume.  Orbax is used for async-capable, sharding-aware IO.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from svpc_tpu.config import Config


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    ema_shadow: Any          # None disables EMA
    step: jnp.ndarray        # global iteration counter (niter)
    epoch: jnp.ndarray

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation,
               use_ema: bool, ema_dtype: Optional[str] = None
               ) -> "TrainState":
        """``ema_dtype="bfloat16"`` stores the EMA shadow rounded
        (TrainConfig.optimizer_dtype); blending stays f32 (optim.py)."""
        def shadow(p):
            if ema_dtype == "bfloat16":
                return p.astype(jnp.bfloat16)
            return jnp.copy(p)
        return cls(
            params=params,
            opt_state=tx.init(params["params"]),
            ema_shadow=(jax.tree.map(shadow, params["params"])
                        if use_ema else None),
            step=jnp.zeros((), jnp.int32),
            epoch=jnp.zeros((), jnp.int32),
        )

    def eval_params(self):
        """Parameters used for evaluation: the EMA shadow when enabled
        (reference evaluates the EMA-assigned model, train.py:393-395).
        A bf16 shadow is widened back to the parameter dtype so eval
        numerics are governed solely by ModelConfig.compute_dtype."""
        if self.ema_shadow is None:
            return self.params
        shadow = jax.tree.map(lambda s, p: s.astype(p.dtype),
                              self.ema_shadow, self.params["params"])
        return {"params": shadow}


def save_checkpoint(ckpt_dir: str, state: TrainState, cfg: Config,
                    name: str = "checkpoint") -> str:
    import shutil

    import orbax.checkpoint as ocp
    path = os.path.abspath(os.path.join(ckpt_dir, name))
    ckptr = ocp.StandardCheckpointer()
    payload = dict(
        params=state.params, opt_state=state.opt_state,
        ema_shadow=state.ema_shadow, step=state.step, epoch=state.epoch)
    payload = {k: v for k, v in payload.items() if v is not None}
    # write beside, swap after: overwriting in place (rmtree-then-save)
    # would leave NO checkpoint at all if the process dies mid-save —
    # fatal for the frequent checkpoint_last rewrites mid-epoch
    # checkpointing does.  The old checkpoint survives until the new one
    # is complete; load_checkpoint falls back to the .swp if a crash
    # lands between the rmtree and the rename below.
    tmp = path + ".swp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    ckptr.save(tmp, payload)
    ckptr.wait_until_finished()
    if os.path.exists(path):
        shutil.rmtree(path)
    os.rename(tmp, path)
    cfg.to_json(path + ".cfg.json")
    return path


def load_checkpoint(path: str, state: TrainState) -> TrainState:
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    template = dict(
        params=state.params, opt_state=state.opt_state,
        ema_shadow=state.ema_shadow, step=state.step, epoch=state.epoch)
    template = {k: v for k, v in template.items() if v is not None}
    path = os.path.abspath(path)
    if not os.path.exists(path) and os.path.exists(path + ".swp"):
        # crash landed inside save_checkpoint's swap window: the fully
        # written replacement is the recovery point
        path = path + ".swp"
    try:
        restored = ckptr.restore(path, template)
    except Exception as first_err:  # noqa: BLE001 — layout fallback below
        # layout bridge: a pp-trained checkpoint stores the trunks
        # pipeline-resident (stacked `layers` subtrees,
        # parallel/pipeline.stack_trunk_params) while a non-pp template
        # expects layer_i families — and vice versa when a pp run resumes
        # a non-pp checkpoint.  Retry through the CONVERTED template and
        # return values in the caller's layout.
        from svpc_tpu.parallel.pipeline import (
            has_stacked_trunks, stack_trunk_params, unstack_trunk_params)
        if has_stacked_trunks(template):
            alt, back = unstack_trunk_params(template), stack_trunk_params
        else:
            alt, back = stack_trunk_params(template), unstack_trunk_params
        if jax.tree_util.tree_structure(alt) == \
                jax.tree_util.tree_structure(template):
            raise first_err  # no trunks to convert — a genuine mismatch
        try:
            restored = back(ckptr.restore(path, alt))
        except Exception:
            raise first_err  # surface the original, unconverted error
    return state.replace(**restored)
