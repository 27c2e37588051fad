"""Online serving: a compiled-once decode service + dynamic request batching.

The reference has no serving story — its only inference surfaces are
offline scripts over pre-annotated splits (src/translate.py, src/test.py,
src/dump_memories.py), each of which loads the checkpoint, pads the whole
split and exits.  A production deployment has the opposite shape: requests
for ONE video arrive concurrently and must be answered at low latency
without ever paying an XLA compile.

TPU-first design:

  * ``CaptionService`` pins ONE serving geometry — ``batch_videos`` video
    slots x ``max_clips`` steps x ``max_v_len`` feature rows, with the
    packed clip budget rounded to the pack multiple — and jit-compiles the
    greedy (or beam) decoder for exactly that shape once at startup
    (``warmup``).  Fixed shapes are what make this cheap on TPU: every
    request batch re-enters the same XLA executable.
  * ``DynamicBatcher`` coalesces concurrent requests into one device batch
    (up to ``batch_videos`` videos or ``max_wait_ms``, whichever comes
    first).  A lone request still decodes immediately — padded video slots
    are masked (``clip_mask``/``step_mask``), so latency stays flat while
    throughput scales with concurrency.
  * Host work (tokenization, feature mmap fill) happens in the submitting
    thread via ``CaptionService.make_entry``/``example_for``; the single
    batcher thread only assembles batches and runs the device program.

The HTTP front-end lives in cli/serve.py; this module is transport-free
(threads + numpy + one jitted program) and fully testable offline.
"""

from __future__ import annotations

import collections
import logging
import math
import os
import queue
import threading
import time
from typing import Dict, List, Optional, Sequence

import numpy as np

from svpc_tpu import tokenization as tok
from svpc_tpu.config import Config
from svpc_tpu.data.pipeline import (CaptionDataset, Example, batch_examples,
                                    inference_entries, pad_batch_to)
from svpc_tpu.data.packing import round_up as _round_up
from svpc_tpu.data.packing import shard_clip_counts
from svpc_tpu.decode.postprocess import batch_to_sentences
from svpc_tpu.precision import precision_scope

logger = logging.getLogger(__name__)


class ServingError(ValueError):
    """Client-side request problem (maps to HTTP 400)."""


class DecodeFailure(RuntimeError):
    """Device-side batch failure, already counted in the serving stats
    by the batcher worker (maps to HTTP 502, not re-counted)."""


class DecodeTimeout(TimeoutError):
    """submit() gave up waiting for the batched decode (already counted
    by the submitter; maps to HTTP 503).  Distinct from a raw
    TimeoutError, which at the HTTP layer means the CLIENT's socket
    stalled and nothing more can be written to it."""


def dummy_example(cfg: Config, num_steps: int,
                  action_vocab_size: int) -> Example:
    """A zero-filled Example with exactly the shapes CaptionDataset.
    make_example produces at this geometry — used to warm the decode
    program (and as the abstract-restore sample batch) without touching
    any feature file.  One clip slot is marked real so the packer lays
    out a row; its [CLS]/[SEP] mask mirrors a 0-frame clip."""
    m = cfg.model
    S, L = num_steps, m.max_v_len + m.max_t_len
    arrays = dict(
        input_ids=np.zeros((S, L), np.int32),
        input_mask=np.zeros((S, L), np.float32),
        input_labels=np.full((S, L), tok.IGNORE, np.int32),
        token_type_ids=np.zeros((S, L), np.int32),
        video_feature=np.zeros((S, m.max_v_len, m.video_feature_size),
                               np.float32),
        step_mask=np.zeros((S,), np.float32),
        ingr_ids=np.zeros((m.max_i_len,), np.int32),
        ingr_mask=np.zeros((m.max_i_len,), np.int32),
        ingr_sep_mask=np.zeros((m.max_i_len,), np.int32),
        entity_mask=np.zeros((m.max_entities,), np.float32),
        copy_ids=np.zeros((m.max_entities, m.max_ingr_words), np.int32),
        copy_weights=np.zeros((m.max_entities, m.max_ingr_words),
                              np.float32),
        oov_count=np.asarray(0, np.int32),
        alignment=np.zeros((S, m.max_entities), np.float32),
        action=np.zeros((S, action_vocab_size), np.float32),
        action_row_mask=np.zeros((S,), np.float32),
    )
    arrays["step_mask"][0] = 1.0
    arrays["input_ids"][0, 0] = tok.CLS
    arrays["input_ids"][0, 1] = tok.SEP
    arrays["input_mask"][0, :2] = 1.0
    meta = dict(name="__warmup__", timestamps=[[0.0, 0.0]],
                gt_sentences=[""], oov_word_dict={}, n_steps=1,
                n_entities=0)
    return Example(arrays=arrays, meta=meta)


class CaptionService:
    """Decode captions for user video specs with one fixed-shape program.

    ``params`` are the eval parameters (EMA when trained with EMA).  The
    service owns a CaptionDataset shell (vocab, duration CSV, feature
    store) and a jitted decoder pinned to (batch_videos, max_clips,
    max_v_len) with the worst-case packed clip budget.
    """

    def __init__(self, cfg: Config, model, params,
                 batch_videos: int = 8,
                 max_clips: Optional[int] = None,
                 beam_size: int = 0,
                 n_best: int = 1,
                 feature_store=None,
                 mesh=None,
                 clip_buckets: Optional[Sequence[int]] = None,
                 upload_dir: Optional[str] = None,
                 warmup: bool = True):
        import jax
        from svpc_tpu.runtime import transient_retry
        from svpc_tpu.train.loop import cast_transform, packing_builder

        max_clips = max_clips or cfg.model.max_n_sen
        if batch_videos < 1:
            raise ValueError(f"batch_videos must be >= 1, got {batch_videos}")
        if n_best < 1:
            raise ValueError(f"n_best must be >= 1, got {n_best}")
        if n_best > 1 and not (beam_size and beam_size > 1):
            raise ValueError(
                f"n_best={n_best} requires beam search (beam_size > 1); "
                "greedy decoding yields a single hypothesis")
        if n_best > max(beam_size, 1):
            raise ValueError(
                f"n_best={n_best} cannot exceed beam_size={beam_size}")
        # multi-chip serving: request batches shard over dp, params over
        # the tp rules (same layout cli.evaluate's mesh-sharded eval uses)
        self._mesh = mesh
        dp = mesh.shape.get("dp", 1) if mesh is not None else 1
        if batch_videos % dp:
            raise ValueError(
                f"batch_videos={batch_videos} must be a multiple of the "
                f"dp mesh axis ({dp})")
        cfg = cfg.replace_train(val_batch_size=batch_videos)
        self.cfg = cfg
        self.model = model
        self.params = params
        self.batch_videos = batch_videos
        self.beam_size = beam_size
        self.n_best = n_best
        self.ds = CaptionDataset(cfg, "infer", num_steps=max_clips,
                                 entries=[], lazy_features=True,
                                 feature_store=feature_store)
        if self.ds.action_vocab_size != cfg.model.action_vocab_size:
            raise ValueError(
                f"verb vocab ({self.ds.action_vocab_size}) does not match "
                f"model action_vocab_size ({cfg.model.action_vocab_size})")

        # optional feature-upload spool: requests may carry the feature
        # arrays themselves (plus duration/n_frames for the frm2sec math)
        # instead of relying on files pre-staged under video_feature_dir
        self._upload_dir = upload_dir
        self._upload_lock = threading.Lock()
        self.up_ds: Optional[CaptionDataset] = None
        if upload_dir:
            from svpc_tpu.data.features import FeatureStore
            os.makedirs(upload_dir, exist_ok=True)
            self.up_ds = CaptionDataset(
                cfg, "infer", num_steps=max_clips, entries=[],
                lazy_features=True, feature_store=FeatureStore(upload_dir))
            self.up_ds.frame_to_second = {}  # rows arrive per upload

        # packed clip budgets (per dp shard).  The worst case — every slot
        # a full video — is always covered; optional smaller ``clip_buckets``
        # let light batches (e.g. a lone request) ride a smaller compiled
        # shape, cutting the host->device feature transfer proportionally
        # (the dominant single-request cost on transfer-bound hosts).
        # Each bucket is one XLA program, all compiled at warmup.
        mult = cfg.train.pack_clip_multiple
        budget = _round_up((batch_videos // dp) * max_clips, mult)
        dropped = [int(b) for b in (clip_buckets or [])
                   if not 0 < int(b) < budget]
        if dropped:
            logger.warning(
                "clip_buckets %s outside (0, worst-case budget %d) have "
                "no effect and were ignored", dropped, budget)
        buckets = sorted({_round_up(int(b), mult)
                          for b in (clip_buckets or [])
                          if 0 < int(b) < budget} | {budget})
        self._buckets = buckets
        self._n_clips = budget
        builders = {n: packing_builder(cfg, mesh, n_clips=n,
                                       v_len=cfg.model.max_v_len)
                    for n in buckets}
        self._builders = (None if builders[budget] is None  # packing off
                          else builders)
        self._dp = dp
        self._transform = cast_transform(cfg)

        if beam_size and beam_size > 1:
            from svpc_tpu.decode.beam import beam_decode
            fn = jax.jit(lambda p, b: beam_decode(model, p, b,
                                                  beam_size=beam_size,
                                                  n_best=n_best))
        else:
            from svpc_tpu.decode.greedy import greedy_decode
            fn = jax.jit(lambda p, b: greedy_decode(model, p, b))
        self._decode = transient_retry(fn, what="serving decode")
        # device work is serialized anyway (one program, one chip); the
        # lock keeps direct multi-threaded decode_examples callers safe
        self._lock = threading.Lock()
        if warmup:
            self.warmup()

    @property
    def max_clips(self) -> int:
        return self.ds.num_steps

    def warmup(self) -> None:
        """Compile + run every decode program (one per clip bucket) on a
        zero batch so no real request ever pays the (20-40 s) XLA
        compile."""
        t0 = time.perf_counter()
        ex = dummy_example(self.cfg, self.max_clips,
                           self.ds.action_vocab_size)
        if self._builders is None:
            self.decode_examples([ex])
        else:
            for n in self._buckets:
                self._decode_batch(self._builders[n]([ex],
                                                     self.batch_videos))
        logger.info("serving decode program(s) ready in %.1fs "
                    "(B=%d videos x S=%d clips, packed bucket(s) %s)",
                    time.perf_counter() - t0, self.batch_videos,
                    self.max_clips, self._buckets)

    # ---------------------------------------------------------------- #
    # request validation / host-side example building
    # ---------------------------------------------------------------- #

    def put_features(self, video_id: str, features: Dict,
                     duration, n_frames) -> None:
        """Spool uploaded feature arrays (base64 .npy payloads) and the
        video's frm2sec row so subsequent requests can decode it."""
        import base64
        import io

        from svpc_tpu.data.anet import duration_to_frm2sec
        if self.up_ds is None:
            raise ServingError(
                "feature upload is disabled — start the daemon with "
                "--upload_dir")
        if not isinstance(features, dict) or \
                not {"resnet", "bn"} <= set(features):
            raise ServingError(
                "'features' must carry base64 .npy payloads under "
                "'resnet' and 'bn'")
        try:
            duration, n_frames = float(duration), float(n_frames)
        except (TypeError, ValueError):
            raise ServingError(
                "feature upload needs numeric 'duration' (seconds) and "
                "'n_frames' (the duration-CSV row for the frm2sec math)")
        if duration <= 0 or n_frames <= 0:
            raise ServingError("'duration' and 'n_frames' must be > 0")
        arrays = {}
        for kind in ("resnet", "bn"):
            try:
                arrays[kind] = np.load(
                    io.BytesIO(base64.b64decode(features[kind])),
                    allow_pickle=False)
            except Exception as e:
                raise ServingError(
                    f"features.{kind}: not a valid base64 .npy payload "
                    f"({e})")
        r, b = arrays["resnet"], arrays["bn"]
        want = self.cfg.model.video_feature_size
        if r.ndim != 2 or b.ndim != 2 or r.shape[0] != b.shape[0]:
            raise ServingError(
                f"feature arrays must be 2-D with equal rows; got "
                f"resnet{tuple(r.shape)} bn{tuple(b.shape)}")
        if r.shape[1] + b.shape[1] != want:
            raise ServingError(
                f"resnet+bn feature dims {r.shape[1]}+{b.shape[1]} != "
                f"model video_feature_size {want}")
        vn = self.up_ds.video_name(video_id)
        store = self.up_ds.store
        # big work (f32 casts + ~100s-of-MB disk writes) happens OUTSIDE
        # the lock under collision-free tmp names, so concurrent uploads
        # of unrelated videos don't queue behind each other
        staged = []  # (tmp, final)
        for kind, arr in arrays.items():
            if arr.dtype not in (np.float32, np.float16):
                # keep the spool on the native packer's f32/f16 fast
                # path (a f64 file would demote every later decode of
                # this video to the python fallback)
                arr = arr.astype(np.float32)
            # temp-write + atomic rename: a concurrent in-flight
            # decode holding the old file's mmap keeps reading the
            # old inode instead of seeing a truncated rewrite
            final = os.path.join(store.feature_dir, f"{vn}_{kind}.npy")
            tmp = (f"{final}.{os.getpid()}.{threading.get_ident()}"
                   ".tmp.npy")  # np.save keeps .npy-suffixed names
            np.save(tmp, arr)
            staged.append((tmp, final))
        with self._upload_lock:
            # only the publish step is serialized: the two renames of one
            # video land as a pair, so a racing RE-upload of the SAME id
            # can't interleave into a mixed resnet/bn pair on disk.  (A
            # re-upload concurrent with an in-flight decode of that video
            # can still be observed mixed by the decode's already-open
            # mmaps — the packer's hard row-bound guard fails that batch
            # cleanly rather than corrupting it.)
            for tmp, final in staged:
                os.replace(tmp, final)
            store.invalidate()  # re-uploads must drop cached rows/mmaps
            self.up_ds.frame_to_second[vn] = duration_to_frm2sec(
                duration, n_frames, self.cfg.data.dset_name,
                self.cfg.data.sampling_sec)

    def _owner(self, video_id: str) -> Optional[CaptionDataset]:
        """Dataset shell that can serve this video: uploads win (most
        recent information), then the configured feature dir."""
        if self.up_ds is not None:
            vn = self.up_ds.video_name(video_id)
            if self.up_ds.store.exists(vn) and \
                    vn in self.up_ds.frame_to_second:
                return self.up_ds
        vn = self.ds.video_name(video_id)
        if self.ds.store.exists(vn) and vn in self.ds.frame_to_second:
            return self.ds
        return None

    def make_entry(self, video_id: str, spec: Dict) -> dict:
        """Validate one request spec -> dataset entry.

        Raises ServingError with a client-usable message on bad input
        (unknown feature files, missing duration row, no timestamps).
        A spec carrying 'features' (+ 'duration'/'n_frames') uploads the
        video's feature arrays first."""
        if not isinstance(video_id, str) or not video_id \
                or os.sep in video_id \
                or (os.altsep and os.altsep in video_id) \
                or ".." in video_id or video_id.startswith("."):
            # ids become <id>_{resnet,bn}.npy paths (and upload WRITES
            # them) — reject anything that could escape the directory
            raise ServingError(f"invalid video_id {video_id!r}")
        if not isinstance(spec, dict) or "timestamps" not in spec:
            raise ServingError(
                "request must carry {'timestamps': [[start_s, end_s], ...],"
                " 'ingredients': [...]}")
        raw_ts = spec["timestamps"]
        if not isinstance(raw_ts, (list, tuple)) or not raw_ts:
            raise ServingError(f"{video_id}: needs at least one timestamp")
        ts = []  # coerced copy — downstream span math gets real floats
        for i, t in enumerate(raw_ts):
            try:
                if not isinstance(t, (list, tuple)) or len(t) != 2:
                    raise ValueError
                s, e = float(t[0]), float(t[1])
                # same rules as cli.validate_data's validate_video:
                # JSON Infinity/NaN parse fine but floor(inf) raises
                # downstream, and a negative start would turn into a
                # negative feature-row index
                if not (math.isfinite(s) and math.isfinite(e)
                        and 0 <= s <= e):
                    raise ValueError
            except (TypeError, ValueError):
                raise ServingError(
                    f"{video_id}: timestamp {i} must be a finite numeric "
                    f"[start_s, end_s] pair with 0 <= start <= end, "
                    f"got {t!r}")
            ts.append([s, e])
        if len(ts) > self.max_clips:
            logger.warning("%s: %d clips truncated to serving max_clips=%d",
                           video_id, len(ts), self.max_clips)
        if "features" in spec:
            self.put_features(video_id, spec["features"],
                              spec.get("duration"), spec.get("n_frames"))
        entry = inference_entries(
            {video_id: dict(timestamps=ts,
                            ingredients=list(spec.get("ingredients", [])),
                            sentences=spec.get("sentences"))},
            self.max_clips)[0]
        owner = self._owner(video_id)
        if owner is None:
            vn = self.ds.video_name(video_id)
            if not self.ds.store.exists(vn):
                raise ServingError(
                    f"{video_id}: no feature files (<vid>_resnet.npy + "
                    f"<vid>_bn.npy) under {self.ds.store.feature_dir}"
                    + (" — or upload them in the request ('features')"
                       if self.up_ds is not None else ""))
            raise ServingError(
                f"{video_id}: no duration row in "
                f"{self.cfg.data.duration_file}")
        entry["source"] = "upload" if owner is self.up_ds else "disk"
        return entry

    def example_for(self, entry: dict) -> Example:
        ds = (self.up_ds if entry.get("source") == "upload" else self.ds)
        return ds.make_example(entry)

    # ---------------------------------------------------------------- #
    # device batch decode
    # ---------------------------------------------------------------- #

    def _pick_builder(self, examples: Sequence[Example]):
        """Smallest clip bucket covering the batch's max per-shard real
        clip count (same shard-assignment formula as pack_examples —
        packing.shard_clip_counts)."""
        if len(self._buckets) == 1:
            return self._builders[self._buckets[-1]]
        steps = [int(e.arrays["step_mask"].sum()) for e in examples]
        shard_max = max(shard_clip_counts(steps, self.batch_videos,
                                          self._dp))
        n = next(b for b in self._buckets if shard_max <= b)
        return self._builders[n]

    def _decode_batch(self, batch):
        """Run the jitted decoder; returns host arrays — one (B, S, T)
        token grid, or the ``(tokens (B,n,S,T), scores (B,n,S))`` pair
        when the service was built with n_best > 1."""
        import jax
        if self._transform is not None:
            batch = self._transform(batch)
        if self._mesh is not None:
            from svpc_tpu.parallel.mesh import shard_batch
            batch = shard_batch(self._mesh, batch)
        with self._lock, precision_scope(self.cfg.model):
            return jax.tree.map(np.asarray, self._decode(self.params, batch))

    def decode_payloads(self, examples: Sequence[Example]
                        ) -> List[List[dict]]:
        """Decode up to ``batch_videos`` examples -> per-example per-clip
        payload dicts: ``{"sentence": str}``, plus ``"nbest":
        [{"sentence", "score"}, ...]`` ranked best-first when the service
        was built with ``n_best > 1`` — the same construction as the
        offline ``run_nbest_eval`` (train/loop.py), so HTTP responses stay
        consistent with the offline ``--n_best`` surface."""
        if len(examples) > self.batch_videos:
            raise ValueError(
                f"{len(examples)} examples > batch_videos={self.batch_videos}")
        if self._builders is not None:
            batch = self._pick_builder(examples)(list(examples),
                                                 self.batch_videos)
        else:
            batch = pad_batch_to(batch_examples(list(examples)),
                                 self.batch_videos)
        out = self._decode_batch(batch)
        metas = [e.meta for e in examples]
        if self.n_best > 1:
            tokens, scores = out
            per_rank = [batch_to_sentences(tokens[:, r], metas,
                                           self.ds.vocab)
                        for r in range(self.n_best)]
            return [[{"sentence": per_rank[0][b][s],
                      "nbest": [{"sentence": per_rank[r][b][s],
                                 "score": float(scores[b, r, s])}
                                for r in range(self.n_best)]}
                     for s in range(meta["n_steps"])]
                    for b, meta in enumerate(metas)]
        sentences = batch_to_sentences(out, metas, self.ds.vocab)
        return [[{"sentence": s} for s in sents] for sents in sentences]

    def decode_examples(self, examples: Sequence[Example]) -> List[List[str]]:
        """Decode up to ``batch_videos`` examples -> per-example sentence
        lists (one postprocessed sentence per real clip; rank 0 under
        n_best)."""
        return [[c["sentence"] for c in clips]
                for clips in self.decode_payloads(examples)]

    def caption(self, specs: Dict[str, Dict]) -> Dict[str, List[dict]]:
        """Synchronous convenience: decode a whole spec dict (chunked to
        the serving batch size) -> {vid: [{timestamp, sentence[, nbest]},
        ...]}."""
        entries = [self.make_entry(vid, spec) for vid, spec in specs.items()]
        out: Dict[str, List[dict]] = {}
        for lo in range(0, len(entries), self.batch_videos):
            chunk = entries[lo:lo + self.batch_videos]
            examples = [self.example_for(e) for e in chunk]
            for entry, clips in zip(chunk,
                                    self.decode_payloads(examples)):
                out[entry["name"]] = [
                    dict({"timestamp": entry["timestamps"][i]}, **c)
                    for i, c in enumerate(clips)]
        return out


class _Pending:
    __slots__ = ("example", "done", "result", "error", "t_submit",
                 "abandoned", "_acct_lock", "_accounted")

    def __init__(self, example: Example):
        self.example = example
        self.done = threading.Event()
        self.result: Optional[List[dict]] = None
        self.error: Optional[BaseException] = None
        self.t_submit = time.perf_counter()
        # set when the submitter gave up (timeout / closed batcher): the
        # worker drops it instead of wasting a batch slot on it
        self.abandoned = False
        self._acct_lock = threading.Lock()
        self._accounted = False

    def claim_accounting(self) -> bool:
        """Exactly-once stats ownership: a request abandoned mid-decode
        is counted by whoever claims it first (submitter's timeout error
        or the worker's batch bookkeeping), never both."""
        with self._acct_lock:
            if self._accounted:
                return False
            self._accounted = True
            return True


class ServingStats:
    """Thread-safe serving counters + latency quantiles."""

    def __init__(self, window: int = 1024):
        self._lock = threading.Lock()
        self.requests = 0
        self.errors = 0
        self.batches = 0
        self.videos = 0
        self.clips = 0
        self._lat = collections.deque(maxlen=window)
        self._batch_s = collections.deque(maxlen=window)

    def record_batch(self, n_videos: int, n_clips: int,
                     latencies: Sequence[float],
                     batch_seconds: Optional[float] = None) -> None:
        with self._lock:
            self.batches += 1
            self.videos += n_videos
            self.clips += n_clips
            self.requests += n_videos
            self._lat.extend(latencies)
            if batch_seconds is not None:
                self._batch_s.append(batch_seconds)

    def record_error(self, n: int = 1) -> None:
        with self._lock:
            self.errors += n
            self.requests += n

    @staticmethod
    def _quantiles(samples) -> dict:
        s = sorted(samples)
        q = (lambda p: round(s[min(len(s) - 1, int(p * len(s)))] * 1e3, 2)
             if s else None)
        return {"p50": q(0.50), "p90": q(0.90), "p99": q(0.99)}

    def snapshot(self) -> dict:
        with self._lock:
            return {
                "requests": self.requests,
                "errors": self.errors,
                "batches": self.batches,
                "videos": self.videos,
                "clips": self.clips,
                "mean_batch_videos": (round(self.videos / self.batches, 2)
                                      if self.batches else None),
                "latency_ms": self._quantiles(self._lat),
                "batch_ms": self._quantiles(self._batch_s),
            }


class DynamicBatcher:
    """Coalesce concurrent caption requests into fixed-shape device batches.

    One worker thread drains a queue: the first pending request opens a
    batch, further requests join until ``batch_videos`` slots fill or
    ``max_wait_ms`` passes, then the whole batch decodes in one device
    call.  submit() blocks the calling thread until its result is ready.
    """

    def __init__(self, service: CaptionService, max_wait_ms: float = 25.0,
                 max_batch: Optional[int] = None):
        self.service = service
        self.max_wait = max_wait_ms / 1e3
        self.max_batch = min(max_batch or service.batch_videos,
                             service.batch_videos)
        self.stats = ServingStats()
        self._q: queue.SimpleQueue = queue.SimpleQueue()
        self._closed = threading.Event()
        self._thread = threading.Thread(target=self._loop,
                                        name="svpc-batcher", daemon=True)
        self._thread.start()

    def submit(self, entry: dict, timeout: Optional[float] = 60.0
               ) -> List[dict]:
        """Build the example (in the caller's thread), queue it, wait for
        the batched decode; returns the per-clip payload dicts
        (``{"sentence": ...[, "nbest": ...]}`` — CaptionService.
        decode_payloads)."""
        if self._closed.is_set():
            raise RuntimeError("batcher is closed")
        # example-build failures propagate uncounted: the transport layer
        # owns client-error accounting (cli/serve.py records every 4xx),
        # so a bad request is never double-counted
        p = _Pending(self.service.example_for(entry))
        self._q.put(p)
        if self._closed.is_set() and not p.done.is_set():
            # closed concurrently with the put: the worker may already
            # have exited on the sentinel, so fail fast instead of
            # blocking the full timeout on a queue nobody drains
            p.abandoned = True
            if p.claim_accounting():
                self.stats.record_error()
            raise RuntimeError("batcher is closed")
        if not p.done.wait(timeout):
            # the worker skips abandoned pendings (no wasted batch slot);
            # claim_accounting keeps a request abandoned MID-decode from
            # being counted twice (here and in the worker's bookkeeping)
            p.abandoned = True
            if p.claim_accounting():
                self.stats.record_error()
            raise DecodeTimeout(
                f"decode did not complete within {timeout}s")
        if p.error is not None:
            raise p.error
        return p.result

    def close(self, timeout: float = 30.0) -> None:
        if not self._closed.is_set():
            self._closed.set()
            self._q.put(None)  # wake the worker
            self._thread.join(timeout)

    def _collect(self) -> Optional[List[_Pending]]:
        """Block for the first request, then fill the batch until the
        wait window closes or the batch is full."""
        first = self._q.get()
        if first is None:
            return None
        items = [first]
        deadline = time.perf_counter() + self.max_wait
        while len(items) < self.max_batch:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                nxt = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is None:
                break
            items.append(nxt)
        return items

    def _loop(self) -> None:
        while True:
            items = self._collect()
            if items is None:
                return
            items = [p for p in items if not p.abandoned]
            if not items:
                if self._closed.is_set() and self._q.empty():
                    return
                continue
            try:
                t0 = time.perf_counter()
                payloads = self.service.decode_payloads(
                    [p.example for p in items])
                batch_s = time.perf_counter() - t0
                for p, clips in zip(items, payloads):
                    p.result = clips
                # only requests still owned by a waiter count: one that
                # timed out mid-decode was already recorded as an error
                # by its submitter
                mine = [p for p in items if p.claim_accounting()]
                self.stats.record_batch(
                    len(mine),
                    sum(p.example.meta["n_steps"] for p in mine),
                    [time.perf_counter() - p.t_submit for p in mine],
                    batch_seconds=batch_s)
            except Exception as e:  # surface to every waiter
                logger.exception("batched decode failed")
                # wrapped so the transport layer knows this failure is
                # already counted here (no double accounting)
                err = DecodeFailure(f"batched decode failed: {e!r}")
                err.__cause__ = e
                for p in items:
                    p.error = err
                self.stats.record_error(
                    sum(1 for p in items if p.claim_accounting()))
            finally:
                for p in items:
                    p.done.set()
            if self._closed.is_set() and self._q.empty():
                return
