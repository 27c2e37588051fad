"""Length-grouped shuffling: exact epoch coverage, stochastic order, and
reduced padded work under packing."""

import numpy as np
import pytest

from tests import reference_bridge as rb

pytestmark = pytest.mark.skipif(
    not rb.reference_available(), reason="reference repo not mounted")


def test_length_group_covers_epoch_and_reduces_work():
    # NOTE: keep n_videos <= test_parity.N_VIDEOS — setup_features shares
    # one on-disk fixture dir, and datasets include every video whose
    # features exist (fix_missing semantics)
    names, feat_dir, dur_file = rb.setup_features(3)
    cfg, ds = rb.build_ours("video", feat_dir, dur_file)

    def epoch_names(**kw):
        seen = []
        for _, metas in ds.batches(2, shuffle=True, seed=7, **kw):
            seen.extend(m["name"] for m in metas)
        return seen

    uniform = epoch_names()
    grouped = epoch_names(length_group=2)
    assert sorted(uniform) == sorted(grouped)      # same videos, once each
    assert len(grouped) == len(ds)

    # grouped batches are sorted by work within each window: the spread of
    # work keys inside a batch can't exceed the uniform shuffle's on
    # average (deterministic check: every grouped batch is a contiguous
    # run of the window's sorted order)
    keys = {ds.data[i]["name"]: ds.work_key(i) for i in range(len(ds))}
    def batch_spread(names_list, bs=2):
        spread = 0
        for i in range(0, len(names_list), bs):
            b = [keys[n][0] for n in names_list[i:i + bs]]
            spread += max(b) - min(b)
        return spread
    assert batch_spread(grouped) <= batch_spread(uniform)
