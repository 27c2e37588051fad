"""End-to-end reference-checkpoint interop: a torch-saved .chkpt file
imports into svpc_tpu and decodes token-for-token like the reference."""

import os
import tempfile

import numpy as np
import pytest

from tests import reference_bridge as rb

pytestmark = pytest.mark.skipif(
    not rb.reference_available(), reason="reference repo not mounted")


def test_torch_chkpt_roundtrip_decode():
    import torch
    from types import SimpleNamespace

    names, feat_dir, dur_file = rb.setup_features(2)
    ref_model, ref_ds, ref_cfg = rb.build_reference("reason_copy",
                                                    feat_dir, dur_file)
    cfg, ours_ds = rb.build_ours("reason_copy", feat_dir, dur_file)

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "model.chkpt")
        torch.save({"model": ref_model.state_dict(),
                    "model_cfg": ref_model.config,
                    "opt": None, "epoch": 0}, path)

        from svpc_tpu.model.load_reference import import_reference_checkpoint
        loaded_cfg, model, params = import_reference_checkpoint(path, cfg)

    assert loaded_cfg.model.model_mode == "reason_copy"
    assert loaded_cfg.model.hidden_size == ref_cfg["hidden_size"]

    # decode through the imported params and compare with the reference
    inputs, metas, ingr = rb.reference_batch(ref_ds, [0, 1])
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

    import jax.numpy as jnp
    from svpc_tpu.data.pipeline import batch_examples
    from svpc_tpu.decode.greedy import greedy_decode
    batch = {k: jnp.asarray(v)
             for k, v in batch_examples([ours_ds[0], ours_ds[1]]).items()}
    got = np.asarray(greedy_decode(model, params, batch))
    for b, ref_seq in enumerate(dec_seq_list):
        ref_tokens = ref_seq.numpy()
        assert (got[b, :ref_tokens.shape[0]] == ref_tokens).all()


def test_export_chkpt_runs_under_reference():
    """The reverse direction: a checkpoint trained in this framework
    exports to a reference-format .chkpt that the reference's strict
    load_state_dict accepts (test.py:382-383) and decodes token-for-token
    identically."""
    import jax
    import torch
    from types import SimpleNamespace

    names, feat_dir, dur_file = rb.setup_features(2)
    ref_model, ref_ds, ref_cfg = rb.build_reference("full", feat_dir,
                                                    dur_file)
    cfg, ours_ds = rb.build_ours("full", feat_dir, dur_file)

    # random params from OUR initializer — the tensors the reference gets
    # are genuinely ours
    import jax.numpy as jnp
    from svpc_tpu.data.pipeline import batch_examples
    from svpc_tpu.model import SVPCModel
    model = SVPCModel(cfg.model)
    batch = {k: jnp.asarray(v)
             for k, v in batch_examples([ours_ds[0], ours_ds[1]]).items()}
    rngs = {"params": jax.random.PRNGKey(42),
            "dropout": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2)}
    params = model.init(rngs, batch, deterministic=True)

    import os
    import tempfile
    from svpc_tpu.model.import_torch import export_reference_checkpoint
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ours.chkpt")
        export_reference_checkpoint(path, params, cfg, epoch=3)
        ckpt = torch.load(path, map_location="cpu", weights_only=False)

    assert ckpt["epoch"] == 3
    assert ckpt["model_cfg"]["model_mode"] == "full"
    ref_model.load_state_dict(ckpt["model"])  # strict=True by default

    inputs, metas, ingr = rb.reference_batch(ref_ds, [0, 1])
    from src.translator import Translator
    translator = Translator(SimpleNamespace(cuda=False),
                            {"model_cfg": ref_model.config,
                             "model": ckpt["model"]}, model=ref_model)
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

    from svpc_tpu.decode.greedy import greedy_decode
    got = np.asarray(greedy_decode(model, params, batch))
    for b, ref_seq in enumerate(dec_seq_list):
        ref_tokens = ref_seq.numpy()
        assert (got[b, :ref_tokens.shape[0]] == ref_tokens).all()


def test_import_rejects_nonvocab_shape_mismatch():
    """Only vocab-dim params (word-embedding tables, LM head) may differ
    in shape (tp padding); any other mismatch must raise loudly instead
    of being silently zero-padded into weight corruption."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest
    from svpc_tpu.config import tiny_test_config
    from svpc_tpu.data.synthetic import synthetic_batch
    from svpc_tpu.model import SVPCModel
    from svpc_tpu.model.import_torch import (export_state_dict,
                                             import_state_dict)

    cfg = tiny_test_config("full")
    model = SVPCModel(cfg.model)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(cfg, batch_size=1, seed=0).items()}
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2)}
    params = jax.device_get(model.init(rngs, batch, deterministic=True))
    n_layers = cfg.model.num_hidden_layers
    sd = export_state_dict(params, "full", n_layers)

    # same-shape import roundtrips fine
    import_state_dict(params, sd, "full", n_layers)

    # shrink a NON-vocab tensor (encoder FFN kernel): must raise, not pad
    bad = dict(sd)
    key = next(k for k in bad if "intermediate" in k and k.endswith("weight"))
    bad[key] = np.asarray(bad[key])[:-1]
    with pytest.raises(ValueError, match="shape mismatch"):
        import_state_dict(params, bad, "full", n_layers)

    # shrink a VOCAB tensor without declaring pad sizes: still a loud
    # error — a checkpoint built against a different word2idx must not be
    # silently zero-filled into degraded decodes
    bad = dict(sd)
    vkey = "text_embeddings.word_embeddings.weight"
    bad[vkey] = np.asarray(bad[vkey])[:-1]
    with pytest.raises(ValueError, match="shape mismatch"):
        import_state_dict(params, bad, "full", n_layers)
    # ... and even WITH pad sizes, only exactly vocab_size -> padded size
    # may grow; an off-by-more source is a wrong-vocab error
    V = cfg.model.vocab_size
    with pytest.raises(ValueError, match="shape mismatch"):
        import_state_dict(params, bad, "full", n_layers,
                          vocab_size=V, padded_vocab_size=V)


def test_import_pads_vocab_dims_exactly():
    """tp-padded template + declared sizes: vocab-axis tensors grow from
    exactly vocab_size to exactly padded_vocab_size with zero fill."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from svpc_tpu.config import tiny_test_config
    from svpc_tpu.data.synthetic import synthetic_batch
    from svpc_tpu.model import SVPCModel
    from svpc_tpu.model.import_torch import (export_state_dict,
                                             import_state_dict)

    cfg = tiny_test_config("full")
    model = SVPCModel(cfg.model)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(cfg, batch_size=1, seed=0).items()}
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2)}
    params = jax.device_get(model.init(rngs, batch, deterministic=True))
    n_layers = cfg.model.num_hidden_layers
    sd = export_state_dict(params, "full", n_layers)

    # pick a multiple that does NOT divide the tiny vocab (64) so the
    # padded size genuinely grows
    cfg_p = cfg.replace_model(vocab_pad_multiple=10)
    Vp = cfg_p.model.padded_vocab_size
    assert Vp > cfg.model.vocab_size
    model_p = SVPCModel(cfg_p.model)
    batch_p = {k: jnp.asarray(v)
               for k, v in synthetic_batch(cfg_p, batch_size=1,
                                           seed=0).items()}
    params_p = jax.device_get(model_p.init(rngs, batch_p,
                                           deterministic=True))
    got = import_state_dict(params_p, sd, "full", n_layers,
                            vocab_size=cfg.model.vocab_size,
                            padded_vocab_size=Vp)
    emb = got["params"]["text_embeddings"]["word_embeddings"]["embedding"]
    assert emb.shape[0] == Vp
    np.testing.assert_array_equal(
        np.asarray(emb[:cfg.model.vocab_size]),
        sd["text_embeddings.word_embeddings.weight"])
    assert not np.asarray(emb[cfg.model.vocab_size:]).any()


def test_import_reference_checkpoint_keeps_vocab_padding():
    """`--torch_checkpoint --tp_size N` surface: the caller's
    vocab_pad_multiple must survive import_reference_checkpoint (it is a
    field of *our* config, absent from the reference model_cfg) — if it
    silently reset to 1 the vocab tables would replicate instead of
    sharding under tp."""
    import torch

    names, feat_dir, dur_file = rb.setup_features(1)
    ref_model, _, _ = rb.build_reference("reason_copy", feat_dir, dur_file)
    cfg, _ = rb.build_ours("reason_copy", feat_dir, dur_file)
    # a multiple that does not divide the mini vocab, so padding is real
    cfg = cfg.replace_model(vocab_pad_multiple=10)

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "model.chkpt")
        torch.save({"model": ref_model.state_dict(),
                    "model_cfg": ref_model.config,
                    "opt": None, "epoch": 0}, path)
        from svpc_tpu.model.load_reference import import_reference_checkpoint
        loaded_cfg, _, params = import_reference_checkpoint(path, cfg)

    assert loaded_cfg.model.vocab_pad_multiple == 10
    Vp = loaded_cfg.model.padded_vocab_size
    assert Vp % 10 == 0 and Vp > loaded_cfg.model.vocab_size
    emb = params["params"]["text_embeddings"]["word_embeddings"]["embedding"]
    assert emb.shape[0] == Vp
    ref_emb = ref_model.state_dict()[
        "text_embeddings.word_embeddings.weight"].numpy()
    np.testing.assert_array_equal(
        np.asarray(emb[:loaded_cfg.model.vocab_size]), ref_emb)
    assert not np.asarray(emb[loaded_cfg.model.vocab_size:]).any()


def test_export_slices_only_vocab_dims_at_coincidental_sizes():
    """A geometry where hidden_size == padded vocab must not get its
    hidden dims truncated on export (the old any-dim heuristic did)."""
    import jax
    import jax.numpy as jnp
    from svpc_tpu.config import tiny_test_config
    from svpc_tpu.data.synthetic import synthetic_batch
    from svpc_tpu.model import SVPCModel
    from svpc_tpu.model.import_torch import export_state_dict

    # vocab 63 padded to 64 == hidden_size 64
    cfg = tiny_test_config("full")
    cfg = cfg.replace_model(vocab_size=63, vocab_pad_multiple=2,
                            hidden_size=64, intermediate_size=64,
                            lstm_hidden_size=64)
    assert cfg.model.padded_vocab_size == 64
    model = SVPCModel(cfg.model)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(cfg, batch_size=1, seed=0).items()}
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2)}
    params = jax.device_get(model.init(rngs, batch, deterministic=True))
    sd = export_state_dict(params, "full", cfg.model.num_hidden_layers,
                           vocab_size=63, padded_vocab_size=64)
    # vocab-dim params sliced back to 63...
    assert sd["text_embeddings.word_embeddings.weight"].shape[0] == 63
    assert sd["decoder_classifier.decoder.weight"].shape[0] == 63
    assert sd["decoder_classifier.bias"].shape[0] == 63
    # ...while coincidentally-64 hidden dims stay intact
    q = next(v for k, v in sd.items()
             if k.endswith("attention.self.query.weight"))
    assert q.shape == (64, 64)
