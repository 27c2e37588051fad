"""Serving subsystem (svpc_tpu/serving.py + cli/serve.py): the compiled-
once decode service must reproduce the offline eval path exactly, the
dynamic batcher must coalesce concurrent requests, and the HTTP daemon
must answer the documented API.  (The reference has no online inference
at all — SURVEY §2: every entry point is an offline split script.)"""

import json
import threading
import time
import urllib.error
import urllib.request

import pytest

from tests import reference_bridge as rb

pytestmark = pytest.mark.skipif(
    not rb.reference_available(), reason="reference repo not mounted")


def _build_service(batch_videos=2, beam_size=0, warmup=True):
    import jax
    import jax.numpy as jnp
    from svpc_tpu.data.pipeline import batch_examples
    from svpc_tpu.model import SVPCModel
    from svpc_tpu.serving import CaptionService

    names, feat_dir, dur_file = rb.setup_features(3)
    cfg, ds = rb.build_ours("reason_copy", feat_dir, dur_file)
    cfg = cfg.replace_train(val_batch_size=batch_videos)

    model = SVPCModel(cfg.model)
    batch = {k: jnp.asarray(v) for k, v in batch_examples([ds[0]]).items()}
    rngs = {"params": jax.random.PRNGKey(7),
            "dropout": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2)}
    params = model.init(rngs, batch, deterministic=True)
    service = CaptionService(cfg, model, params,
                             batch_videos=batch_videos,
                             beam_size=beam_size, warmup=warmup)
    return service, cfg, ds, model, params


@pytest.fixture(scope="module")
def served():
    """One compiled 2-slot service shared by the read-only tests."""
    return _build_service(batch_videos=2)


def _specs(ds):
    return {e["name"]: {"timestamps": e["timestamps"],
                        "ingredients": e["ingredients"]}
            for e in ds.data}


def test_service_matches_offline_eval(served):
    """caption() over user specs == run_greedy_eval over the annotated
    dataset, sentence for sentence (decode never reads GT text)."""
    from svpc_tpu.train.loop import run_greedy_eval

    service, cfg, ds, model, params = served
    sub = run_greedy_eval(model, params, ds, cfg)

    got = service.caption(_specs(ds))
    assert set(got) == set(sub["results"])
    for vid, clips in sub["results"].items():
        assert [c["sentence"] for c in got[vid]] == \
            [c["sentence"] for c in clips]
        assert [c["timestamp"] for c in got[vid]] == \
            [c["timestamp"] for c in clips]


def test_warmup_and_request_batches_share_one_program_shape(served):
    """The zero-filled warmup batch must have exactly the shapes/dtypes of
    a real request batch — the 'no compile on first request' guarantee."""
    from svpc_tpu.serving import dummy_example

    service, cfg, ds, _, _ = served
    dummy = dummy_example(cfg, service.max_clips, ds.action_vocab_size)
    entry = service.make_entry(ds.data[0]["name"], {
        "timestamps": ds.data[0]["timestamps"],
        "ingredients": ds.data[0]["ingredients"]})
    real = service.example_for(entry)

    builder = service._builders[service._buckets[-1]]
    warm = builder([dummy], service.batch_videos)
    req = builder([real], service.batch_videos)
    assert set(warm) == set(req)
    for k in warm:
        assert warm[k].shape == req[k].shape, k
        assert warm[k].dtype == req[k].dtype, k


def test_make_entry_validation():
    from svpc_tpu.serving import ServingError

    # request validation never touches the device: no warmup/compile
    service, cfg, ds, _, _ = _build_service(batch_videos=1, warmup=False)
    with pytest.raises(ServingError, match="timestamp"):
        service.make_entry("vid", {"ingredients": []})
    with pytest.raises(ServingError, match="at least one"):
        service.make_entry("vid", {"timestamps": [], "ingredients": []})
    with pytest.raises(ServingError, match="no feature files"):
        service.make_entry("no_such_video",
                           {"timestamps": [[0.0, 1.0]], "ingredients": []})
    # valid spec without ingredients key is accepted (video-only requests)
    entry = service.make_entry(ds.data[0]["name"],
                               {"timestamps": [[0.0, 1.0]]})
    assert entry["ingredients"] == []
    # timestamps are validated the way the span math needs them: finite,
    # non-negative, ordered — and coerced to real floats (a JSON client
    # may send "0.0" strings or Infinity, which json.loads accepts)
    vid = ds.data[0]["name"]
    for bad_ts in ([[-1.0, 2.0]], [[3.0, 1.0]], [[0.0, float("inf")]],
                   [[float("nan"), 1.0]], [[0.0]], [[0.0, 1.0, 2.0]],
                   ["ab"], [None]):
        with pytest.raises(ServingError, match="timestamp"):
            service.make_entry(vid, {"timestamps": bad_ts})
    entry = service.make_entry(vid, {"timestamps": [["0.0", "2.5"]]})
    assert entry["timestamps"] == [[0.0, 2.5]]
    assert all(isinstance(v, float) for t in entry["timestamps"]
               for v in t)


def test_pending_accounting_claimed_once():
    """A request abandoned mid-decode is counted by exactly one side
    (submitter's timeout OR the worker's bookkeeping), never both."""
    from svpc_tpu.serving import _Pending

    p = _Pending(example=None)
    assert p.claim_accounting() is True
    assert p.claim_accounting() is False  # second claimant loses


def test_dynamic_batcher_coalesces_and_matches(served):
    """Concurrent submits land in one device batch (up to batch_videos)
    and return the same sentences as the synchronous path."""
    from svpc_tpu.serving import DynamicBatcher

    service, cfg, ds, _, _ = served
    specs = _specs(ds)  # 3 videos > batch_videos=2 -> 2 batches minimum
    expected = service.caption(specs)

    batcher = DynamicBatcher(service, max_wait_ms=1000.0)
    results = {}
    errors = []
    barrier = threading.Barrier(len(specs))

    def worker(vid, spec):
        try:
            barrier.wait(timeout=10)
            entry = service.make_entry(vid, spec)
            results[vid] = batcher.submit(entry, timeout=120.0)
        except Exception as e:  # surface in the main thread
            errors.append((vid, e))

    threads = [threading.Thread(target=worker, args=(v, s))
               for v, s in specs.items()]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)
    batcher.close()

    assert not errors, errors
    for vid, payloads in results.items():
        assert [p["sentence"] for p in payloads] == \
            [c["sentence"] for c in expected[vid]]
    snap = batcher.stats.snapshot()
    assert snap["requests"] == len(specs)
    assert snap["batches"] == 2  # 3 requests coalesced into 2-slot batches
    assert snap["latency_ms"]["p50"] is not None


def test_clip_buckets_identical_and_picked(served):
    """Smaller clip buckets: light batches ride a smaller compiled shape
    with byte-identical sentences; the picker chooses the smallest
    covering bucket."""
    from svpc_tpu.serving import CaptionService

    service, cfg, ds, model, params = served
    expected = service.caption(_specs(ds))

    bucketed = CaptionService(cfg, model, params, batch_videos=2,
                              clip_buckets=[16], warmup=False)
    assert bucketed._buckets == [16, 32]  # worst case always covered
    one = bucketed.example_for(bucketed.make_entry(
        ds.data[0]["name"], _specs(ds)[ds.data[0]["name"]]))
    light = bucketed._pick_builder([one])([one], 2)
    assert light["clip_mask"].shape[0] == 16  # small bucket chosen
    full_batch = [bucketed.example_for(bucketed.make_entry(n, s))
                  for n, s in list(_specs(ds).items())[:2]]
    # force the big bucket only when the small one cannot cover the batch
    steps = sum(int(e.arrays["step_mask"].sum()) for e in full_batch)
    picked = bucketed._pick_builder(full_batch)(full_batch, 2)
    assert picked["clip_mask"].shape[0] == (16 if steps <= 16 else 32)

    got = bucketed.caption(_specs(ds))
    for vid, clips in expected.items():
        assert [c["sentence"] for c in got[vid]] == \
            [c["sentence"] for c in clips]


def test_mesh_sharded_serving_identical(served):
    """dp=2-sharded serving emits byte-identical sentences (request
    batches shard over the mesh, same layout as cli.evaluate's)."""
    import jax
    from svpc_tpu.parallel.mesh import make_mesh, shard_params
    from svpc_tpu.serving import CaptionService

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    service, cfg, ds, model, params = served
    expected = service.caption(_specs(ds))

    mesh = make_mesh(dp_size=2)
    sharded = dict(params)
    sharded["params"] = shard_params(mesh, sharded["params"])
    meshed = CaptionService(cfg, model, sharded, batch_videos=2,
                            mesh=mesh, warmup=False)
    got = meshed.caption(_specs(ds))
    for vid, clips in expected.items():
        assert [c["sentence"] for c in got[vid]] == \
            [c["sentence"] for c in clips]


def test_video_id_traversal_rejected(served, tmp_path):
    """video_id becomes a filesystem path (and upload WRITES it): ids
    that could escape the directory must be rejected up front."""
    import numpy as np
    from svpc_tpu.serving import CaptionService, ServingError

    service, cfg, ds, model, params = served
    for bad in ("../evil", "a/b", ".hidden", ""):
        with pytest.raises(ServingError, match="invalid video_id"):
            service.make_entry(bad, {"timestamps": [[0.0, 1.0]],
                                     "ingredients": []})

    # uploads land float32 regardless of the client's dtype (a f64 spool
    # file would demote the video off the native packer's fast path)
    up = CaptionService(cfg, model, params, batch_videos=1,
                        upload_dir=str(tmp_path / "spool"), warmup=False)
    feat_dim = cfg.model.video_feature_size
    import base64, io
    def b64(arr):
        buf = io.BytesIO(); np.save(buf, arr)
        return base64.b64encode(buf.getvalue()).decode()
    up.put_features("vid64", {"resnet": b64(np.zeros((5, feat_dim - 2))),
                              "bn": b64(np.zeros((5, 2)))},
                    duration=2.0, n_frames=60)
    saved = np.load(tmp_path / "spool" / "vid64_resnet.npy")
    assert saved.dtype == np.float32
    assert not list((tmp_path / "spool").glob("*.tmp.npy"))


def test_beam_serving_matches_offline_beam(served):
    """beam_size>1 serving emits the same sentences as the offline beam
    eval path."""
    from svpc_tpu.serving import CaptionService
    from svpc_tpu.train.loop import run_greedy_eval

    service0, cfg, ds, model, params = served
    beamed = CaptionService(cfg, model, params, batch_videos=2,
                            beam_size=2)
    sub = run_greedy_eval(model, params, ds, cfg, beam_size=2)
    got = beamed.caption(_specs(ds))
    for vid, clips in sub["results"].items():
        assert [c["sentence"] for c in got[vid]] == \
            [c["sentence"] for c in clips]


def test_nbest_serving_matches_offline_nbest(served):
    """n_best>1 serving carries ranked 'nbest' hypotheses+scores on every
    clip, byte-consistent with the offline run_nbest_eval path (round-2
    VERDICT item 5: the reference's --n_best surface, train.py:546-548,
    end-to-end online)."""
    import pytest
    from svpc_tpu.serving import CaptionService
    from svpc_tpu.train.loop import run_nbest_eval

    service0, cfg, ds, model, params = served
    with pytest.raises(ValueError, match="requires beam"):
        CaptionService(cfg, model, params, batch_videos=2, n_best=2,
                       warmup=False)
    with pytest.raises(ValueError, match="exceed beam_size"):
        CaptionService(cfg, model, params, batch_videos=2, beam_size=2,
                       n_best=3, warmup=False)

    nb = CaptionService(cfg, model, params, batch_videos=2, beam_size=3,
                        n_best=2)
    sub = run_nbest_eval(model, params, ds, cfg, beam_size=3, n_best=2)
    got = nb.caption(_specs(ds))
    for vid, clips in sub["results"].items():
        assert len(got[vid]) == len(clips)
        for mine, offline in zip(got[vid], clips):
            assert mine["sentence"] == offline["sentence"]
            assert mine["nbest"] == offline["nbest"]
            # rank 0 of nbest IS the sentence, ranked best-first
            assert mine["nbest"][0]["sentence"] == mine["sentence"]
            assert mine["nbest"][0]["score"] >= mine["nbest"][1]["score"]


def test_batcher_survives_decode_failure(served):
    """A failing device batch surfaces the error to its waiters and the
    worker keeps serving subsequent requests."""
    from svpc_tpu.serving import DynamicBatcher

    service, cfg, ds, _, _ = served
    specs = _specs(ds)
    vid = next(iter(specs))
    entry = service.make_entry(vid, specs[vid])
    expected = [c["sentence"]
                for c in service.caption({vid: specs[vid]})[vid]]

    batcher = DynamicBatcher(service, max_wait_ms=5.0)
    real_decode = service._decode
    boom = RuntimeError("injected device failure")
    service._decode = lambda *a, **k: (_ for _ in ()).throw(boom)
    try:
        with pytest.raises(RuntimeError, match="injected"):
            batcher.submit(entry, timeout=60.0)
    finally:
        service._decode = real_decode
    # the worker thread survived and the next request succeeds
    assert [p["sentence"]
            for p in batcher.submit(service.make_entry(vid, specs[vid]),
                                    timeout=120.0)] == expected
    snap = batcher.stats.snapshot()
    assert snap["errors"] == 1 and snap["batches"] == 1
    batcher.close()


def test_feature_upload_roundtrip(served, tmp_path):
    """A request carrying the feature arrays inline (base64 .npy +
    duration/n_frames) decodes identically to the disk-staged video —
    exercised through the HTTP daemon via the CaptionClient."""
    import numpy as np
    from svpc_tpu.cli.serve import start_server, stop_server
    from svpc_tpu.client import CaptionClient, CaptionClientError
    from svpc_tpu.serving import CaptionService, ServingError

    service0, cfg, ds, model, params = served
    names, feat_dir, dur_file = rb.setup_features(3)
    vid = ds.data[0]["name"]
    spec = _specs(ds)[vid]
    expected = [c["sentence"] for c in service0.caption({vid: spec})[vid]]

    # upload is opt-in: the plain service rejects inline features
    with pytest.raises(ServingError, match="disabled"):
        service0.make_entry(vid, dict(spec, features={}))

    resnet = np.load(f"{feat_dir}/{vid}_resnet.npy")
    bn = np.load(f"{feat_dir}/{vid}_bn.npy")
    dur_row = next(l for l in open(dur_file) if l.startswith(vid))
    _, duration, n_frames = dur_row.strip().split(",")

    service = CaptionService(cfg, model, params, batch_videos=1,
                             upload_dir=str(tmp_path / "spool"))
    server = start_server(service, port=0, max_wait_ms=5.0)
    host, port = server.server_address[:2]
    client = CaptionClient(f"http://{host}:{port}")
    try:
        resp = client.caption("brand_new_video", spec["timestamps"],
                              spec["ingredients"], resnet=resnet, bn=bn,
                              duration=float(duration),
                              n_frames=float(n_frames))
        assert [c["sentence"] for c in resp["captions"]] == expected

        # spool persists: a follow-up request without features works
        resp2 = client.caption("brand_new_video", spec["timestamps"],
                               spec["ingredients"])
        assert [c["sentence"] for c in resp2["captions"]] == expected

        # client-visible validation failures
        with pytest.raises(CaptionClientError) as ei:
            client.caption("v2", spec["timestamps"], [], resnet=resnet,
                           bn=bn, duration=None, n_frames=None)
        assert ei.value.code == 400 and "duration" in ei.value.message
        with pytest.raises(CaptionClientError) as ei:
            client.caption("v3", spec["timestamps"], [],
                           resnet=resnet[:, :4], bn=bn, duration=1.0,
                           n_frames=30)
        assert ei.value.code == 400
    finally:
        stop_server(server)


def test_http_server_end_to_end(served):
    """POST /v1/captions answers with the offline sentences; healthz and
    stats respond; bad requests get 400s."""
    from svpc_tpu.cli.serve import start_server, stop_server

    service, cfg, ds, _, _ = served
    specs = _specs(ds)
    expected = service.caption(specs)

    server = start_server(service, port=0, max_wait_ms=10.0)
    host, port = server.server_address[:2]
    base = f"http://{host}:{port}"
    try:
        health = json.load(urllib.request.urlopen(f"{base}/healthz",
                                                  timeout=30))
        assert health["status"] == "ok"
        assert health["batch_videos"] == 2
        assert health["decoder"] == "greedy"

        for vid, spec in specs.items():
            req = urllib.request.Request(
                f"{base}/v1/captions",
                data=json.dumps(dict(spec, video_id=vid)).encode(),
                headers={"Content-Type": "application/json"})
            resp = json.load(urllib.request.urlopen(req, timeout=120))
            assert resp["video_id"] == vid
            assert [c["sentence"] for c in resp["captions"]] == \
                [c["sentence"] for c in expected[vid]]

        stats = json.load(urllib.request.urlopen(f"{base}/v1/stats",
                                                 timeout=30))
        assert stats["requests"] == len(specs)

        # clips beyond the serving geometry are dropped VISIBLY
        vid = next(iter(specs))
        ts = (specs[vid]["timestamps"] * 4)[:service.max_clips + 2]
        req = urllib.request.Request(
            f"{base}/v1/captions",
            data=json.dumps({"video_id": vid, "timestamps": ts,
                             "ingredients": specs[vid]["ingredients"]}
                            ).encode(),
            headers={"Content-Type": "application/json"})
        resp = json.load(urllib.request.urlopen(req, timeout=120))
        assert resp["truncated_clips"] == 2
        assert len(resp["captions"]) == service.max_clips

        # bad requests: no video_id / unknown video -> 400 with a message
        for payload in ({"timestamps": [[0, 1]]},
                        {"video_id": "nope", "timestamps": [[0, 1]],
                         "ingredients": []}):
            req = urllib.request.Request(
                f"{base}/v1/captions", data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"})
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req, timeout=30)
            assert ei.value.code == 400
            assert "error" in json.load(ei.value)
        # client errors are visible to monitoring (stats endpoint)
        stats = json.load(urllib.request.urlopen(f"{base}/v1/stats",
                                                 timeout=30))
        assert stats["errors"] == 2
    finally:
        stop_server(server)


def test_http_chunked_rejected_and_bounded_drain(served):
    """A Transfer-Encoding body can't be drained by Content-Length math:
    it is refused with 411 + connection close (instead of desyncing the
    keep-alive stream), and drain() returns promptly once nothing is in
    flight."""
    import socket

    from svpc_tpu.cli.serve import start_server, stop_server

    service, cfg, ds, _, _ = served
    server = start_server(service, port=0, max_wait_ms=10.0)
    host, port = server.server_address[:2]
    try:
        s = socket.create_connection((host, port), timeout=30)
        s.sendall(b"POST /v1/captions HTTP/1.1\r\nHost: x\r\n"
                  b"Transfer-Encoding: chunked\r\n\r\n")
        status = s.recv(65536).split(b"\r\n", 1)[0]
        assert b"411" in status
        # the server closed its side rather than reading chunk framing
        s.settimeout(10)
        rest = s.recv(65536)
        while rest:
            rest = s.recv(65536)
        s.close()
        # nothing in flight -> drain is immediate, not a 30s join
        t0 = time.perf_counter()
        assert server.drain(timeout=5.0) is True
        assert time.perf_counter() - t0 < 5.0
    finally:
        stop_server(server)
