"""Parity at the flagship (paper) geometry.

The main parity suite (test_parity.py) runs a miniature geometry for
speed; every BASELINE.md claim, however, is stated against the
experiment-of-record config (hidden 768, 12 heads, Lv=100, Lt=22,
3072-dim features — reference src/train.py:471-509 +
scripts/train.sh:19-21).  This file asserts forward-loss and
token-for-token greedy parity directly at that geometry on 2 videos,
for all four ablation modes of record (BASELINE.json: MODEL_TYPE in
{v, vi, viv, vivt}; round-1 VERDICT item 2).
"""

import numpy as np
import pytest

from tests import reference_bridge as rb

pytestmark = [
    pytest.mark.skipif(not rb.reference_available(),
                       reason="reference repo not mounted"),
    pytest.mark.slow,
]

N_VIDEOS = 2

# reference mode names for vivt / viv / vi / v
MODES = ["full", "reason_copy", "copy", "video"]


@pytest.fixture(scope="module", params=MODES)
def paper_setup(request):
    mode = request.param
    names, feat_dir, dur_file = rb.setup_features(
        N_VIDEOS, feat_dims=(2048, 1024), tag="_paper")
    ref_model, ref_ds, _ = rb.build_reference(
        mode, feat_dir, dur_file, geom=rb.PAPER_GEOM, dims=rb.PAPER_DIMS)
    cfg, ours_ds = rb.build_ours(
        mode, feat_dir, dur_file, geom=rb.PAPER_GEOM, dims=rb.PAPER_DIMS)
    assert cfg.model.hidden_size == 768
    assert cfg.model.num_attention_heads == 12
    assert cfg.model.max_v_len == 100 and cfg.model.max_t_len == 22
    rb.patch_deterministic_gumbel()
    return ref_model, ref_ds, cfg, ours_ds


def test_forward_parity_paper_geometry(paper_setup):
    import torch

    ref_model, ref_ds, cfg, ours_ds = paper_setup
    idx = list(range(N_VIDEOS))
    inputs, metas, ingr = rb.reference_batch(ref_ds, idx)

    with torch.no_grad():
        total, pred_list, ent_list, ac_list = ref_model(
            inputs["input_ids_list"], inputs["video_features_list"],
            inputs["input_masks_list"], inputs["token_type_ids_list"],
            inputs["input_labels_list"], inputs["ingr_input_ids"],
            inputs["ingr_masks"], inputs["ingr_sep_masks"],
            inputs["batch_step_num"], inputs["ingr_id_dict"],
            inputs["extra_zeros"], inputs["alignments"], inputs["actions"],
            predict=False)

    from svpc_tpu.data.pipeline import batch_examples
    batch = batch_examples([ours_ds[i] for i in idx])
    model, params, jbatch = rb.import_weights_into(cfg, ref_model, batch)
    out = model.apply(params, jbatch, deterministic=True,
                      rngs={"gumbel": __import__("jax").random.PRNGKey(0)})

    np.testing.assert_allclose(float(out.total_loss), float(total),
                               rtol=2e-4)
    for b, pred in enumerate(pred_list):
        ref_scores = pred.numpy()          # (S_b, T, C_b)
        s_b, t, c_b = ref_scores.shape
        got = np.asarray(out.prediction_scores)[b, :s_b, :, :c_b]
        np.testing.assert_allclose(got, ref_scores, rtol=5e-3, atol=2e-5,
                                   err_msg=f"scores mismatch ex {b}")


def test_gradient_parity_paper_geometry():
    """Per-leaf backward parity vs torch autograd AT THE FLAGSHIP
    geometry (full mode — the superset of backward surfaces: gumbel ST,
    copy-scatter, reasoner renormalizations, guarded losses).  Extends
    tests/test_train_parity.py's miniature-geometry proof to the
    experiment of record; same calibrated bound (1e-4 x global gradient
    scale — the measured f32-vs-f64 band of either framework is ~2e-7 of
    scale there)."""
    import jax
    import torch

    dims = dict(rb.PAPER_DIMS, hidden_dropout_prob=0.0,
                attention_probs_dropout_prob=0.0)
    names, feat_dir, dur_file = rb.setup_features(
        N_VIDEOS, feat_dims=(2048, 1024), tag="_paper")
    ref_model, ref_ds, _ = rb.build_reference(
        "full", feat_dir, dur_file, geom=rb.PAPER_GEOM, dims=dims)
    cfg, ours_ds = rb.build_ours(
        "full", feat_dir, dur_file, geom=rb.PAPER_GEOM, dims=dims)
    rb.patch_deterministic_gumbel()

    idx = list(range(N_VIDEOS))
    inputs, metas, ingr = rb.reference_batch(ref_ds, idx)
    ref_model.zero_grad()
    total, *_ = ref_model(
        inputs["input_ids_list"], inputs["video_features_list"],
        inputs["input_masks_list"], inputs["token_type_ids_list"],
        inputs["input_labels_list"], inputs["ingr_input_ids"],
        inputs["ingr_masks"], inputs["ingr_sep_masks"],
        inputs["batch_step_num"], inputs["ingr_id_dict"],
        inputs["extra_zeros"], inputs["alignments"], inputs["actions"],
        predict=False)
    total.backward()
    ref_grads = {n: p.grad.detach().numpy().copy()
                 for n, p in ref_model.named_parameters()
                 if p.grad is not None}

    from svpc_tpu.data.pipeline import batch_examples
    batch = batch_examples([ours_ds[i] for i in idx])
    model, params, jbatch = rb.import_weights_into(cfg, ref_model, batch)

    def loss_fn(p):
        out = model.apply({"params": p}, jbatch, deterministic=True,
                          rngs={"gumbel": jax.random.PRNGKey(0)})
        return out.total_loss

    np.testing.assert_allclose(float(loss_fn(params["params"])),
                               float(total.detach()), rtol=2e-4)

    from flax.traverse_util import flatten_dict
    from svpc_tpu.model.import_torch import build_mapping
    got = {"/".join(k): np.asarray(v) for k, v in
           flatten_dict(jax.grad(loss_fn)(params["params"])).items()}
    mapping = build_mapping("full", cfg.model.num_hidden_layers)
    assert set(got) == set(mapping)
    ref = {}
    for f_key, (t_key, transform) in mapping.items():
        if t_key not in ref_grads and t_key + ".weight" in ref_grads:
            t_key = t_key + ".weight"
        v = ref_grads[t_key]
        ref[f_key] = v.T if transform == "T" else v
    gscale = max(np.abs(g).max() for g in ref.values())
    assert gscale > 0
    for key, rg in ref.items():
        err = np.abs(got[key] - rg).max()
        assert err <= 1e-4 * gscale, (
            f"leaf {key}: grad absmax err {err:.3e} "
            f"(global scale {gscale:.3e})")


@pytest.fixture(scope="module")
def paper_ours():
    """Our model alone at the paper geometry (no torch build): the
    packed/beam production-layout gates (round-2 VERDICT item 4) compare
    the framework against itself, so reference weights are unnecessary —
    a seeded random init at 768-d exercises the same programs."""
    import jax
    import jax.numpy as jnp
    from svpc_tpu.data.pipeline import batch_examples
    from svpc_tpu.model import SVPCModel

    names, feat_dir, dur_file = rb.setup_features(
        N_VIDEOS, feat_dims=(2048, 1024), tag="_paper")
    cfg, ds = rb.build_ours("full", feat_dir, dur_file,
                            geom=rb.PAPER_GEOM, dims=rb.PAPER_DIMS)
    model = SVPCModel(cfg.model)
    batch = batch_examples([ds[i] for i in range(N_VIDEOS)])
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    rngs = {"params": jax.random.PRNGKey(42),
            "dropout": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2)}
    params = model.init(rngs, jbatch, deterministic=True)
    from svpc_tpu.data.packing import pack_batch
    packed = pack_batch(batch, cfg.model.max_t_len, clip_multiple=16)
    jpacked = {k: jnp.asarray(v) for k, v in packed.items()}
    return cfg, model, params, jbatch, jpacked


def test_packed_matches_dense_paper_geometry(paper_ours):
    """The production training layout (packed clips) must reproduce the
    dense grid at the FLAGSHIP geometry — losses and real-step prediction
    scores — turning BASELINE.md's one-off chip observation into a
    repeatable gate."""
    import jax

    cfg, model, params, jbatch, jpacked = paper_ours
    rngs = {"gumbel": jax.random.PRNGKey(0)}
    out_d = model.apply(params, jbatch, deterministic=True, rngs=rngs)
    out_p = model.apply(params, jpacked, deterministic=True, rngs=rngs)
    np.testing.assert_allclose(float(out_p.total_loss),
                               float(out_d.total_loss), rtol=1e-6)
    # packed scores live per real clip; gather the dense grid's rows
    cv = np.asarray(jpacked["clip_video"])
    cs = np.asarray(jpacked["clip_step"])
    cm = np.asarray(jpacked["clip_mask"]).astype(bool)
    dense_rows = np.asarray(out_d.prediction_scores)[cv[cm], cs[cm]]
    packed_rows = np.asarray(out_p.prediction_scores)[cm, 0]
    # XLA tiles the 768-d encoder matmuls differently at the two batch
    # shapes (B*S=24 dense rows vs N=32 packed rows), so scores carry
    # f32 reduction-order noise (measured 3.3e-5 rel on 0.01% of
    # elements); the DECISION-level invariant — greedy tokens exactly
    # equal — is the next test
    np.testing.assert_allclose(packed_rows, dense_rows,
                               rtol=1e-4, atol=1e-6)


def test_packed_greedy_matches_dense_paper_geometry(paper_ours):
    """Greedy tokens from the packed layout equal the dense grid's
    token-for-token at 768-d (the packed layout is what production
    decode/eval runs)."""
    from svpc_tpu.decode.greedy import greedy_decode

    cfg, model, params, jbatch, jpacked = paper_ours
    ids_d = np.asarray(greedy_decode(model, params, jbatch))
    ids_p = np.asarray(greedy_decode(model, params, jpacked))
    mask = np.asarray(jbatch["step_mask"])[..., None].astype(ids_d.dtype)
    np.testing.assert_array_equal(ids_d * mask, ids_p)


def test_beam_nbest_paper_geometry(paper_ours):
    """Beam search at 768-d: beam ranking is deterministic and
    well-ordered (scores descending, rank 0 == the n_best=1 output), and
    the packed layout emits identical ranked hypotheses."""
    from svpc_tpu.decode.beam import beam_decode

    cfg, model, params, jbatch, jpacked = paper_ours
    tokens, scores = beam_decode(model, params, jbatch, beam_size=3,
                                 n_best=2)
    tokens, scores = np.asarray(tokens), np.asarray(scores)
    best = np.asarray(beam_decode(model, params, jbatch, beam_size=3))
    np.testing.assert_array_equal(tokens[:, 0], best)
    smask = np.asarray(jbatch["step_mask"]).astype(bool)
    assert (scores[:, 0][smask] >= scores[:, 1][smask]).all()

    p_tokens, p_scores = beam_decode(model, params, jpacked, beam_size=3,
                                     n_best=2)
    mask = smask[:, None, :, None]
    np.testing.assert_array_equal(tokens * mask, np.asarray(p_tokens))
    np.testing.assert_allclose(np.asarray(p_scores) * smask[:, None, :],
                               scores * smask[:, None, :],
                               rtol=1e-6, atol=1e-7)


def test_greedy_parity_paper_geometry(paper_setup):
    import torch
    from types import SimpleNamespace

    ref_model, ref_ds, cfg, ours_ds = paper_setup
    idx = list(range(N_VIDEOS))
    inputs, metas, ingr = rb.reference_batch(ref_ds, idx)

    from src.translator import Translator
    checkpoint = {"model_cfg": ref_model.config,
                  "model": ref_model.state_dict()}
    translator = Translator(SimpleNamespace(cuda=False), checkpoint,
                            model=ref_model)
    with torch.no_grad():
        dec_seq_list, _ = translator.translate_batch_greedy(
            inputs["input_ids_list"], inputs["video_features_list"],
            inputs["input_masks_list"], inputs["token_type_ids_list"],
            [e["ingr_ids"] for e in ingr], [e["ingr_mask"] for e in ingr],
            [torch.LongTensor(e["ingr_sep_mask"]) for e in ingr],
            [e["ingr_id_dict"] for e in ingr],
            [e["oov_word_dict"] for e in ingr],
            inputs["alignments"], inputs["actions"],
            inputs["batch_step_num"], ref_model)

    # the reference mutates input_ids in-place — rebuild our batch fresh
    from svpc_tpu.data.pipeline import batch_examples
    batch = batch_examples([ours_ds[i] for i in idx])
    model, params, jbatch = rb.import_weights_into(cfg, ref_model, batch)

    from svpc_tpu.decode.greedy import greedy_decode
    got = np.asarray(greedy_decode(model, params, jbatch))  # (B, S, T)

    for b, ref_seq in enumerate(dec_seq_list):
        ref_tokens = ref_seq.numpy()       # (S_b, T)
        s_b = ref_tokens.shape[0]
        mismatch = (got[b, :s_b] != ref_tokens)
        assert not mismatch.any(), (
            f"ex {b}: {mismatch.sum()} token mismatches\n"
            f"ref:\n{ref_tokens}\ngot:\n{got[b, :s_b]}")


def test_training_trajectory_parity_paper_geometry():
    """K=3 full reference training steps (backward -> clip_grad_norm_(1)
    -> BertAdam -> warmup-aware EMA, src/train.py:126-143) AT THE
    FLAGSHIP geometry, full mode — extends test_train_parity.py's
    miniature K-step proof to the experiment of record (round-3 VERDICT
    item 7).  Same assertion design: per-step loss sequence + aggregate
    delta-L2 ratio (per-element bounds are ill-posed under BertAdam's
    sign-like m/sqrt(v); see tests/test_train_parity.py docstring)."""
    import jax
    import torch

    # LR 1e-4 (vs the miniature test's 1e-3): BertAdam's first updates
    # are sign-like with magnitude ~3.16*lr_t PER ELEMENT regardless of
    # gradient scale, and at 44M params lr 1e-3 moves the loss +58% in
    # one step — far outside the regime where two correct f32
    # realizations stay within a meaningful loss tolerance.  1e-4 still
    # moves every parameter measurably (the delta-L2 assertions below
    # have a healthy denominator) and the clip still fires.
    K_STEPS, LR, WARMUP, T_TOTAL = 3, 1e-4, 0.2, 50
    # reasoner_dropout_prob zeroes the reference's hardcoded p=0.4
    # action-selector dropout (model.py:757) — the torch side is in
    # eval(), so leaving it on would make only OUR side stochastic
    dims = dict(rb.PAPER_DIMS, hidden_dropout_prob=0.0,
                attention_probs_dropout_prob=0.0,
                reasoner_dropout_prob=0.0)
    names, feat_dir, dur_file = rb.setup_features(
        N_VIDEOS, feat_dims=(2048, 1024), tag="_paper")
    ref_model, ref_ds, _ = rb.build_reference(
        "full", feat_dir, dur_file, geom=rb.PAPER_GEOM, dims=dims)
    # importable only after build_reference put the reference on sys.path
    from src.rtransformer.optimization import EMA, BertAdam
    cfg, ours_ds = rb.build_ours(
        "full", feat_dir, dur_file, geom=rb.PAPER_GEOM, dims=dims)
    rb.patch_deterministic_gumbel()

    idx = list(range(N_VIDEOS))
    from svpc_tpu.data.pipeline import batch_examples
    batch = batch_examples([ours_ds[i] for i in idx])
    model, params, jbatch = rb.import_weights_into(cfg, ref_model, batch)

    from flax.traverse_util import flatten_dict
    from svpc_tpu.model.import_torch import build_mapping

    def mapped(state):
        out = {}
        for f_key, (t_key, transform) in build_mapping(
                "full", cfg.model.num_hidden_layers).items():
            if t_key not in state and t_key + ".weight" in state:
                t_key = t_key + ".weight"
            v = state[t_key]
            out[f_key] = v.T if transform == "T" else v
        return out

    init = mapped({n: p.detach().numpy().copy()
                   for n, p in ref_model.named_parameters()})

    # --- torch side (grouping per train.py:339-343) ---
    no_decay = ["bias", "LayerNorm.bias", "LayerNorm.weight"]
    named = list(ref_model.named_parameters())
    groups = [
        {"params": [p for n, p in named
                    if not any(nd in n for nd in no_decay)],
         "weight_decay": 0.01},
        {"params": [p for n, p in named
                    if any(nd in n for nd in no_decay)],
         "weight_decay": 0.0},
    ]
    opt = BertAdam(groups, lr=LR, warmup=WARMUP, t_total=T_TOTAL,
                   schedule="warmup_linear")
    ema = EMA(0.9999)
    for n, p in named:
        if p.requires_grad:
            ema.register(n, p.data)
    ref_losses = []
    for k in range(K_STEPS):
        opt.zero_grad()
        inputs, metas, ingr = rb.reference_batch(ref_ds, idx)
        total, *_ = ref_model(
            inputs["input_ids_list"], inputs["video_features_list"],
            inputs["input_masks_list"], inputs["token_type_ids_list"],
            inputs["input_labels_list"], inputs["ingr_input_ids"],
            inputs["ingr_masks"], inputs["ingr_sep_masks"],
            inputs["batch_step_num"], inputs["ingr_id_dict"],
            inputs["extra_zeros"], inputs["alignments"], inputs["actions"],
            predict=False)
        ref_losses.append(float(total.detach()))
        total.backward()
        torch.nn.utils.clip_grad_norm_(ref_model.parameters(), 1.0)
        opt.step()
        ema(ref_model, k)
    ref_final = mapped({n: p.detach().numpy().copy()
                        for n, p in ref_model.named_parameters()})
    ref_shadow = mapped({n: v.numpy().copy()
                         for n, v in ema.shadow.items()})

    # --- our side: the production train step machinery ---
    from svpc_tpu.train.optim import make_optimizer
    from svpc_tpu.train.state import TrainState
    from svpc_tpu.train.step import make_train_step

    tcfg = cfg.replace_train(lr=LR, lr_warmup_proportion=WARMUP,
                             n_epoch=10, grad_clip=1.0, ema_decay=0.9999)
    tx = make_optimizer(tcfg.train, steps_per_epoch=T_TOTAL // 10,
                        model_mode=cfg.model.model_mode,
                        n_layers=cfg.model.num_hidden_layers)
    state = TrainState.create(params, tx, use_ema=True)
    step = jax.jit(make_train_step(model, tx, tcfg))
    rng = jax.random.PRNGKey(11)
    our_losses = []
    for _ in range(K_STEPS):
        state, metrics = step(state, jbatch, rng)
        our_losses.append(float(metrics["loss"]))
    got_final = {"/".join(k): np.asarray(v) for k, v in
                 flatten_dict(state.params["params"]).items()}
    got_shadow = {"/".join(k): np.asarray(v) for k, v in
                  flatten_dict(state.ema_shadow).items()}

    np.testing.assert_allclose(our_losses, ref_losses, rtol=1e-3,
                               err_msg="paper-geometry loss sequence")

    def compare(got, ref, what):
        num = den = 0.0
        for key, rv in ref.items():
            d_got = (got[key] - init[key]).astype(np.float64)
            d_ref = (rv - init[key]).astype(np.float64)
            num += float(np.sum((d_got - d_ref) ** 2))
            den += float(np.sum(d_ref ** 2))
        assert den > 0, "params did not move"
        ratio = (num / den) ** 0.5
        assert ratio <= 0.10, (
            f"paper {what}: aggregate delta L2 ratio {ratio:.4f}")

    compare(got_final, ref_final, "param")
    compare(got_shadow, ref_shadow, "ema")
