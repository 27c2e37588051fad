"""Lazy feature pipeline: examples carry a feature reference instead of
the materialized (S, Lv, D) array, and the batch builders fill the final
buffers straight from the mmap'd .npy files (one feature copy total).
Must be bit-identical to the eager path, with and without the native
packer."""

import numpy as np
import pytest

from tests import reference_bridge as rb

pytestmark = pytest.mark.skipif(
    not rb.reference_available(), reason="reference repo not mounted")


def _datasets(use_native):
    from svpc_tpu.data.pipeline import CaptionDataset
    names, feat_dir, dur_file = rb.setup_features(3)
    cfg, eager = rb.build_ours("full", feat_dir, dur_file)
    eager.use_native = use_native
    lazy = CaptionDataset(cfg, "val", num_steps=rb.GEOM["max_n_sen"],
                          use_native=use_native, lazy_features=True)
    return cfg, eager, lazy


@pytest.mark.parametrize("use_native", [True, False])
def test_lazy_packed_batches_bit_identical(use_native):
    from svpc_tpu.data.packing import pack_examples

    cfg, eager, lazy = _datasets(use_native)
    assert len(eager) == len(lazy) >= 2
    ex_eager = [eager[i] for i in range(len(eager))]
    ex_lazy = [lazy[i] for i in range(len(lazy))]
    assert "video_feature" not in ex_lazy[0].arrays
    assert "feature_ref" in ex_lazy[0].meta

    a = pack_examples(ex_eager, cfg.model.max_t_len, clip_multiple=2,
                      v_multiple=4)
    b = pack_examples(ex_lazy, cfg.model.max_t_len, clip_multiple=2,
                      v_multiple=4)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


@pytest.mark.parametrize("use_native", [True, False])
def test_lazy_dense_batches_bit_identical(use_native):
    from svpc_tpu.data.pipeline import batch_examples

    cfg, eager, lazy = _datasets(use_native)
    a = batch_examples([eager[i] for i in range(len(eager))])
    b = batch_examples([lazy[i] for i in range(len(lazy))])
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_lazy_valid_lengths_match_packer():
    """Header-math valid lengths must equal what the packer computes."""
    cfg, eager, lazy = _datasets(True)
    for i in range(len(lazy)):
        ref = lazy[i].meta["feature_ref"]
        # eager arrays encode valid+2 in the video-span mask rows
        n = int(eager[i].arrays["step_mask"].sum())
        Lv = cfg.model.max_v_len
        mask_valid = eager[i].arrays["input_mask"][:n, :Lv].sum(axis=-1)
        np.testing.assert_array_equal(ref["valid"] + 2, mask_valid)


def test_mmap_cache_controls():
    """Cache clear/enable round-trip: packing still works after clearing
    and with the cache disabled (fresh mappings)."""
    from svpc_tpu.native import (mmap_cache_clear, mmap_cache_enable,
                                 pack_video_native, get_lib)
    if get_lib() is None:
        pytest.skip("native packer unavailable")
    import numpy as np
    names, feat_dir, dur_file = rb.setup_features(3)
    import os, json
    anns = json.load(open(os.path.join(
        rb.REFERENCE_ROOT,
        "densevid_eval/yc2_data/bosselut_split_yc2_val_anet_format.json")))
    name = names[0]
    from svpc_tpu.data.anet import load_durations
    frm2sec = load_durations(dur_file)[name]
    ts = np.asarray(anns[name]["timestamps"], np.float64)
    args = (os.path.join(feat_dir, f"{name}_resnet.npy"),
            os.path.join(feat_dir, f"{name}_bn.npy"), ts, frm2sec, 16, 16, 24)
    a = pack_video_native(*args)
    mmap_cache_clear()
    b = pack_video_native(*args)
    mmap_cache_enable(False)
    try:
        c = pack_video_native(*args)
    finally:
        mmap_cache_enable(True)
    for other in (b, c):
        np.testing.assert_array_equal(a[0], other[0])
        np.testing.assert_array_equal(a[1], other[1])
