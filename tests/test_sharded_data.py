"""Per-host sharded batch construction (round-4 VERDICT item 6; SURVEY
§2.4 "per-host data loading").

The default multihost mode is exact-global: every process builds the
identical batch and transfers 1/process_count of it.  The opt-in
``--multihost_sharded_data`` mode builds only the blocks a process's own
devices hold (``pack_examples(only_shards=...)`` +
``mesh.local_dp_shards``).  These tests pin the mechanism single-process:

  * a shard's restricted build is BITWISE the full build's block;
  * assembling per-device arrays from per-shard restricted builds (what
    each process would transfer) equals placing the full global build on
    the virtual 8-device mesh;
  * the expensive work (lazy feature fills) drops ~dp-fold;
  * ``local_dp_shards`` partitions exactly and covers all shards on a
    single process.
"""

import numpy as np
import pytest

from tests import reference_bridge as rb


def _examples(n=8, seed=13):
    from svpc_tpu.config import tiny_test_config
    from svpc_tpu.data.pipeline import Example
    from svpc_tpu.data.synthetic import synthetic_batch

    cfg = tiny_test_config("full")
    bn = synthetic_batch(cfg, n, seed=seed)
    exs = [Example(arrays={k: v[i] for k, v in bn.items()}, meta={})
           for i in range(n)]
    return cfg, exs


def _builds(cfg, exs, B, dp):
    from svpc_tpu.data.packing import pack_examples
    T = cfg.model.max_t_len
    full = pack_examples(exs, T, batch_size=B, clip_multiple=2,
                         dp_shards=dp)
    per_shard = [pack_examples(exs, T, batch_size=B, clip_multiple=2,
                               dp_shards=dp, only_shards={g})
                 for g in range(dp)]
    return full, per_shard


def _block(arr, g, dp):
    """Shard g's contiguous block of a packed-batch array (both the
    per-video (B, ...) arrays and the (N*dp, ...) clip arrays are
    blocked by shard along axis 0)."""
    rows = arr.shape[0] // dp
    return arr[g * rows:(g + 1) * rows]


def test_only_shards_blocks_bitwise():
    """Each restricted build's owned block == the full build's block,
    and the dp restricted builds combined reproduce the full build
    exactly (every key, every byte)."""
    from svpc_tpu.data.packing import pack_examples

    cfg, exs = _examples()
    B, dp = 8, 4
    full, per_shard = _builds(cfg, exs, B, dp)
    # the all-fill reference: a build that owns NO shard
    empty = pack_examples(exs, cfg.model.max_t_len, batch_size=B,
                          clip_multiple=2, dp_shards=dp, only_shards=set())
    for k, want in full.items():
        combined = np.concatenate(
            [_block(per_shard[g][k], g, dp) for g in range(dp)], axis=0)
        np.testing.assert_array_equal(combined, want, err_msg=k)
        # unowned blocks stay fill-valued (no partial/garbage writes)
        for g in range(1, dp):
            np.testing.assert_array_equal(
                _block(per_shard[0][k], g, dp), _block(empty[k], g, dp),
                err_msg=f"{k}: shard-0 build leaked into block {g}")


def test_placement_equality_on_mesh():
    """Simulated multi-process transfer: for every device, slice ITS
    rows from the restricted build of the shard it owns, assemble the
    global array — must equal device-placing the full global build
    (what assemble_global_batch does when each process really only
    built its own blocks)."""
    import jax
    from svpc_tpu.parallel.mesh import batch_sharding, make_mesh

    cfg, exs = _examples()
    dp, tp = 4, 2
    B = 8
    full, per_shard = _builds(cfg, exs, B, dp)
    mesh = make_mesh(dp, tp)
    sh = batch_sharding(mesh)
    for k, host in full.items():
        want = np.asarray(jax.device_get(jax.device_put(host, sh)))
        imap = sh.addressable_devices_indices_map(host.shape)
        rows = host.shape[0] // dp
        shards = []
        for d, idx in imap.items():
            sl = idx[0]
            g = sl.start // rows  # owning dp shard of this device's rows
            shards.append(jax.device_put(per_shard[g][k][idx], d))
        arr = jax.make_array_from_single_device_arrays(
            host.shape, sh, shards)
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(arr)), want, err_msg=k)


def test_local_dp_shards_cover_and_match_index_map():
    import jax
    from svpc_tpu.parallel.mesh import (batch_sharding, local_dp_shards,
                                        make_mesh)

    for dp, tp in [(4, 2), (8, 1), (2, 2)]:
        mesh = make_mesh(dp, tp)
        owned = local_dp_shards(mesh)
        # single process: every shard is local
        assert owned == set(range(dp)), (dp, tp, owned)
        # and the set is exactly what the placement index map implies
        imap = batch_sharding(mesh).addressable_devices_indices_map((dp,))
        from_map = set()
        for idx in imap.values():
            from_map.update(range(*idx[0].indices(dp)))
        assert owned == from_map


@pytest.mark.skipif(not rb.reference_available(),
                    reason="reference repo not mounted")
def test_feature_fill_work_drops(monkeypatch):
    """The dominant host cost — the lazy feature fill — runs only for
    owned shards: restricted to 1 of 2 shards, fills drop to that
    shard's videos."""
    from svpc_tpu.data import pipeline as pl
    from svpc_tpu.data.packing import pack_examples
    from svpc_tpu.data.pipeline import CaptionDataset

    # isolated fixture dir: 4 videos in the SHARED dir would leak a 4th
    # video into the parity datasets (setup_features docstring)
    names, feat_dir, dur_file = rb.setup_features(4, tag="sharded4")
    cfg, _ = rb.build_ours("full", feat_dir, dur_file)
    ds = CaptionDataset(cfg, "val", num_steps=rb.GEOM["max_n_sen"],
                        lazy_features=True)
    exs = [ds[i] for i in range(4)]
    assert "video_feature" not in exs[0].arrays  # really lazy

    calls = []
    real = pl.fill_features_from_ref
    monkeypatch.setattr(pl, "fill_features_from_ref",
                        lambda ref, dst: (calls.append(ref["name"]),
                                          real(ref, dst))[1])
    T = cfg.model.max_t_len
    pack_examples(exs, T, batch_size=4, clip_multiple=2, dp_shards=2)
    full_fills = len(calls)
    assert full_fills == 4
    calls.clear()
    restricted = pack_examples(exs, T, batch_size=4, clip_multiple=2,
                               dp_shards=2, only_shards={1})
    assert len(calls) == 2, calls  # only shard 1's two videos filled
    # and the built block matches the full build's
    fullb = pack_examples(exs, T, batch_size=4, clip_multiple=2,
                          dp_shards=2)
    N = fullb["clip_video"].shape[0] // 2
    np.testing.assert_array_equal(
        restricted["clip_video_feature"][N:],
        fullb["clip_video_feature"][N:])
    assert not restricted["clip_video_feature"][:N].any()


def test_sharded_mode_requires_packed_layout():
    from svpc_tpu.config import TrainConfig
    with pytest.raises(ValueError, match="packed layout"):
        TrainConfig(multihost_sharded_data=True, pack_clips=False)
