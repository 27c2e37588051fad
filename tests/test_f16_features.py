"""Half-precision feature stores: the native packer's '<f2' read must be
bit-exact vs numpy's float16 -> float32 cast, and a converted store must
be a drop-in for the pipeline."""

import os

import numpy as np
import pytest

from tests import reference_bridge as rb

pytestmark = pytest.mark.skipif(
    not rb.reference_available(), reason="reference repo not mounted")


def test_half_to_float_bit_exact_all_values(tmp_path):
    """Every representable f16 value (incl. subnormals, inf, NaN) through
    the native packer equals numpy's widening cast."""
    from svpc_tpu.native import pack_video_native

    all_bits = np.arange(65536, dtype=np.uint16)
    h = all_bits.view(np.float16)
    cols = 2048
    rows = 65536 // cols  # 32 rows x 2048 covers every f16 bit pattern
    resnet = h.reshape(rows, cols).astype(np.float16)
    bn = np.zeros((rows, 1024), np.float16)
    np.save(tmp_path / "v_resnet.npy", resnet)
    np.save(tmp_path / "v_bn.npy", bn)

    # one clip spanning all rows: frm2sec=1, ts [0, rows-1]
    res = pack_video_native(str(tmp_path / "v_resnet.npy"),
                            str(tmp_path / "v_bn.npy"),
                            np.array([[0.0, float(rows - 1)]]),
                            1.0, rows + 2, rows + 2, cols + 1024)
    assert res is not None, "native packer unavailable"
    out, valid = res
    assert int(valid[0]) == rows
    got = out[0, 1:rows + 1, :cols]
    want = resnet.astype(np.float32)
    # NaNs compare by NaN-ness, not payload: the F16C hardware widening
    # quiets signaling NaNs (sets the quiet bit) where numpy's software
    # path may preserve the payload — irrelevant for finite feature data
    nan = np.isnan(want)
    np.testing.assert_array_equal(np.isnan(got), nan)
    np.testing.assert_array_equal(got.view(np.uint32)[~nan],
                                  want.view(np.uint32)[~nan])


def test_converted_store_drop_in(tmp_path):
    """convert_features + the lazy pipeline: the f16 store's packed batch
    equals the numpy-computed f16->f32 result exactly, and matches the
    f32 store to f16 rounding."""
    from svpc_tpu.cli.convert_features import convert_tree
    from svpc_tpu.data.pipeline import CaptionDataset
    from svpc_tpu.data.packing import pack_examples

    names, feat_dir, dur_file = rb.setup_features(3)
    out_dir = str(tmp_path / "f16")
    n = convert_tree(feat_dir, out_dir)
    assert n >= 6  # 3 videos x 2 files

    cfg, ds32 = rb.build_ours("copy", feat_dir, dur_file)
    import dataclasses
    cfg16 = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, video_feature_dir=out_dir))

    def packed(c, use_native):
        ds = CaptionDataset(c, "val", num_steps=rb.GEOM["max_n_sen"],
                            use_native=use_native, lazy_features=True)
        return pack_examples([ds[i] for i in range(len(ds))],
                             c.model.max_t_len, clip_multiple=2)

    native16 = packed(cfg16, True)
    numpy16 = packed(cfg16, False)
    f32 = packed(cfg, True)
    # native f2 read == numpy f16 load + cast, bit-exact
    np.testing.assert_array_equal(native16["clip_video_feature"],
                                  numpy16["clip_video_feature"])
    # and equals the f32 store up to f16 rounding
    np.testing.assert_allclose(native16["clip_video_feature"],
                               f32["clip_video_feature"],
                               rtol=1e-3, atol=1e-4)
    for k in native16:
        if k != "clip_video_feature":
            np.testing.assert_array_equal(native16[k], f32[k], err_msg=k)
