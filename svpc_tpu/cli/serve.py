"""Caption serving daemon: HTTP front-end over the dynamic batcher.

The reference has no online inference at all (SURVEY §2: every entry
point is an offline script over an annotated split).  This daemon loads
a checkpoint once, compiles ONE fixed-shape decode program, and answers
concurrent single-video requests with dynamic batching
(svpc_tpu/serving.py).

    python -m svpc_tpu.cli.serve --model_type vivt \
        --checkpoint run/checkpoint_best \
        --video_feature_dir features --duration_file durations.csv \
        --port 8700 --batch_videos 8 --max_wait_ms 25

API (JSON over HTTP):

  POST /v1/captions
      {"video_id": "...", "timestamps": [[start_s, end_s], ...],
       "ingredients": ["olive oil", ...]}
   -> {"video_id": "...",
       "captions": [{"timestamp": [s, e], "sentence": "..."} ...]}
      (features are read from --video_feature_dir/<vid>_{resnet,bn}.npy;
       the duration CSV must carry a row per video; with --use_beam
       --n_best N each caption also carries "nbest": ranked
       [{"sentence", "score"}] — the offline cli.evaluate surface,
       reference train.py:546-548)
  GET /healthz     -> {"status": "ok", ...model/serving geometry...}
  GET /v1/stats    -> request/batch counters + latency quantiles

Errors: 400 (bad spec / unknown video), 411 (chunked body), 502 (device
batch failed), 503 (decode timeout), 500.
"""

from __future__ import annotations

import argparse
import json
import logging
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from svpc_tpu.cli.common import (add_common_args, adopt_checkpoint_sidecar,
                                 config_from_args, reject_pp)
from svpc_tpu.serving import (CaptionService, DecodeFailure, DecodeTimeout,
                              DynamicBatcher, ServingError, dummy_example)

logger = logging.getLogger(__name__)


def load_serving_model(cfg, args):
    """(cfg, model, eval_params) without a populated dataset — the
    abstract checkpoint restore draws its sample batch from a zero-filled
    dummy example instead (serving starts with no videos on hand)."""
    if getattr(args, "torch_checkpoint", False):
        from svpc_tpu.model.load_reference import import_reference_checkpoint
        return import_reference_checkpoint(args.checkpoint, cfg)
    cfg = adopt_checkpoint_sidecar(cfg, args.checkpoint)
    from svpc_tpu.data.pipeline import batch_examples
    from svpc_tpu.train.loop import restore_train_state
    sample = batch_examples([dummy_example(cfg, cfg.model.max_n_sen,
                                           cfg.model.action_vocab_size)])
    model, state = restore_train_state(cfg, sample, args.checkpoint)
    return cfg, model, state.eval_params()


class CaptionHandler(BaseHTTPRequestHandler):
    """One handler per connection (ThreadingHTTPServer); the service and
    batcher hang off the server object."""

    protocol_version = "HTTP/1.1"
    # bounds a silent/stalled client: no single socket read or write can
    # block a handler (or a drain) for more than this
    timeout = 30
    # feature uploads are the big payloads: a 2h video's f32 resnet+bn
    # pair is ~180 MB, ~240 MB base64'd
    max_request_bytes = 1 << 30

    def log_message(self, fmt, *fmt_args):  # route to logging, not stderr
        logger.debug("%s - %s", self.address_string(), fmt % fmt_args)

    def _tracked(self, inner):
        """Bracket one request in the server's in-flight counter so a
        drain can wait (bounded) for requests that are mid-decode or
        mid-write — idle keep-alive connections don't count — and end
        keep-alive connections once draining starts."""
        srv = self.server
        with srv.inflight_lock:
            srv.inflight += 1
        try:
            inner()
        finally:
            if srv.draining.is_set():
                self.close_connection = True
            with srv.inflight_lock:
                srv.inflight -= 1
                srv.inflight_zero.notify_all()

    def do_GET(self):
        self._tracked(self._do_get)

    def do_POST(self):
        self._tracked(self._do_post)

    def _reply(self, code: int, obj: dict) -> None:
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _do_get(self):
        srv = self.server
        if self.path == "/healthz":
            svc = srv.service
            self._reply(200, {
                "status": "ok",
                "model_mode": svc.cfg.model.model_mode,
                "decoder": (f"beam{svc.beam_size}"
                            if svc.beam_size > 1 else "greedy"),
                "n_best": svc.n_best,
                "batch_videos": svc.batch_videos,
                "max_clips": svc.max_clips,
                "compute_dtype": svc.cfg.model.compute_dtype,
            })
        elif self.path == "/v1/stats":
            self._reply(200, srv.batcher.stats.snapshot())
        else:
            self._reply(404, {"error": f"unknown path {self.path}"})

    def _do_post(self):
        srv = self.server
        # always drain the body first: an early error reply would leave
        # the unread bytes to be parsed as the next request on this
        # HTTP/1.1 keep-alive connection
        if self.headers.get("Transfer-Encoding"):
            # a chunked body can't be drained by Content-Length math and
            # would desync the connection — refuse it outright
            self.close_connection = True
            srv.batcher.stats.record_error()
            self._reply(411, {"error": "chunked/transfer-encoded bodies "
                                       "unsupported; send Content-Length"})
            return
        try:
            length = int(self.headers.get("Content-Length", 0) or 0)
        except ValueError:
            length = -1
        if not 0 <= length <= self.max_request_bytes:
            # a negative length would block rfile.read() until EOF; an
            # absurd one would buffer it all before any validation
            self.close_connection = True
            srv.batcher.stats.record_error()
            self._reply(400, {"error": "bad Content-Length header "
                                       f"(0..{self.max_request_bytes})"})
            return
        body = self.rfile.read(length)
        if self.path != "/v1/captions":
            self._reply(404, {"error": f"unknown path {self.path}"})
            return
        try:
            req = json.loads(body or b"{}")
            if not isinstance(req, dict):
                raise ServingError("request body must be a JSON object")
            video_id = req.get("video_id")
            if not video_id:
                raise ServingError("request needs a 'video_id'")
            entry = srv.service.make_entry(video_id, req)
            payloads = srv.batcher.submit(entry,
                                          timeout=srv.request_timeout)
            resp = {
                "video_id": video_id,
                # each clip payload is {"sentence": ...} plus ranked
                # "nbest": [{sentence, score}] when serving with --n_best
                "captions": [dict({"timestamp": entry["timestamps"][i]},
                                  **c)
                             for i, c in enumerate(payloads)],
            }
            n_asked = len(req.get("timestamps") or [])
            if n_asked > len(entry["timestamps"]):
                # client-visible: clips beyond the serving geometry were
                # dropped, not silently mislaid
                resp["truncated_clips"] = n_asked - len(entry["timestamps"])
            self._reply(200, resp)
        except DecodeFailure as e:  # counted by the batcher worker
            self._reply(502, {"error": str(e)})
        except DecodeTimeout as e:  # submit() already recorded it
            self._reply(503, {"error": str(e)})
        except TimeoutError:
            # NOT a decode timeout: the client's socket stalled while we
            # were writing to it.  Nothing more can be sent — re-raise so
            # handle_one_request closes the connection (replying here
            # would block another full socket timeout on the same dead
            # pipe).
            logger.warning("client stalled mid-reply; dropping connection")
            raise
        except (ServingError, ValueError, json.JSONDecodeError) as e:
            srv.batcher.stats.record_error()
            self._reply(400, {"error": str(e)})
        except Exception as e:  # keep the daemon alive
            logger.exception("request failed")
            self._reply(500, {"error": f"{type(e).__name__}: {e}"})


class CaptionHTTPServer(ThreadingHTTPServer):
    # daemon handler threads: the process can ALWAYS exit (an actively-
    # sending keep-alive client can otherwise hold a non-daemon thread —
    # and therefore server_close()'s unbounded join — forever).  Graceful
    # drain is implemented explicitly instead: drain() waits up to a
    # deadline for the in-flight request count to reach zero, so normal
    # shutdowns still let every response finish writing.
    daemon_threads = True

    def __init__(self, addr, service: CaptionService,
                 batcher: DynamicBatcher, request_timeout: float = 60.0):
        super().__init__(addr, CaptionHandler)
        self.service = service
        self.batcher = batcher
        self.request_timeout = request_timeout
        self.draining = threading.Event()
        self.inflight = 0
        self.inflight_lock = threading.Lock()
        self.inflight_zero = threading.Condition(self.inflight_lock)

    def drain(self, timeout: float = 30.0) -> bool:
        """Stop keep-alive reuse and wait (bounded) for in-flight
        requests to finish; True if the server went quiet in time."""
        self.draining.set()
        deadline = time.monotonic() + timeout
        with self.inflight_lock:
            while self.inflight:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    return False
                self.inflight_zero.wait(remaining)
            return True


def start_server(service: CaptionService, host: str = "127.0.0.1",
                 port: int = 0, max_wait_ms: float = 25.0,
                 request_timeout: float = 60.0):
    """Build batcher + HTTP server and serve on a background thread;
    returns the server (its .server_address carries the bound port)."""
    batcher = DynamicBatcher(service, max_wait_ms=max_wait_ms)
    server = CaptionHTTPServer((host, port), service, batcher,
                               request_timeout)
    thread = threading.Thread(target=server.serve_forever,
                              name="svpc-http", daemon=True)
    thread.start()
    return server


def stop_server(server, drain_timeout: float = 30.0) -> None:
    server.shutdown()  # stop accepting new connections
    if not server.drain(drain_timeout):
        logger.warning("drain timed out with %d request(s) still in "
                       "flight; closing anyway", server.inflight)
    server.server_close()
    server.batcher.close()


def main(argv=None):
    from svpc_tpu.runtime import init_runtime
    init_runtime()
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)-10s: %(message)s")
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--torch_checkpoint", action="store_true",
                   help="--checkpoint is a reference PyTorch .chkpt file")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8700)
    p.add_argument("--batch_videos", type=int, default=8,
                   help="video slots per compiled decode batch (the "
                        "dynamic-batching ceiling)")
    p.add_argument("--max_clips", type=int, default=0,
                   help="clip slots per video (default: max_n_sen)")
    p.add_argument("--max_wait_ms", type=float, default=25.0,
                   help="how long the first request of a batch waits for "
                        "company before decoding")
    p.add_argument("--clip_buckets", default="",
                   help="comma-separated packed clip budgets below the "
                        "worst case (e.g. 16,32): light batches ride a "
                        "smaller compiled shape, cutting the per-request "
                        "feature transfer; each bucket is one XLA "
                        "program compiled at warmup")
    p.add_argument("--request_timeout", type=float, default=60.0)
    p.add_argument("--upload_dir", default="",
                   help="enable inline feature upload: requests may carry "
                        "base64 .npy 'features' (+ duration/n_frames) "
                        "spooled into this directory")
    p.add_argument("--use_beam", action="store_true")
    p.add_argument("--beam_size", type=int, default=2)
    p.add_argument("--n_best", type=int, default=1,
                   help="with --use_beam: each caption also carries the "
                        "top-N ranked hypotheses with scores ('nbest'), "
                        "matching cli.evaluate's offline --n_best surface")
    args = p.parse_args(argv)
    if args.n_best > 1 and not args.use_beam:
        p.error("--n_best > 1 requires --use_beam (greedy decode yields "
                "a single hypothesis)")
    if args.use_beam and args.n_best > args.beam_size:
        p.error(f"--n_best {args.n_best} cannot exceed "
                f"--beam_size {args.beam_size}")

    reject_pp(args, p)
    cfg = config_from_args(args)
    cfg, model, params = load_serving_model(cfg, args)
    # multi-chip serving: request batches shard over dp, params over the
    # tp rules (identical output — same layout as cli.evaluate's mesh)
    mesh = None
    if args.dp_size * args.tp_size > 1:
        from svpc_tpu.parallel.mesh import make_mesh, shard_params
        mesh = make_mesh(dp_size=args.dp_size, tp_size=args.tp_size)
        params = dict(params)
        params["params"] = shard_params(mesh, params["params"])
    buckets = ([int(b) for b in args.clip_buckets.split(",")]
               if args.clip_buckets else None)
    service = CaptionService(
        cfg, model, params, batch_videos=args.batch_videos,
        max_clips=args.max_clips or None,
        beam_size=args.beam_size if args.use_beam else 0,
        n_best=args.n_best if args.use_beam else 1, mesh=mesh,
        clip_buckets=buckets, upload_dir=args.upload_dir or None)
    server = start_server(service, args.host, args.port,
                          max_wait_ms=args.max_wait_ms,
                          request_timeout=args.request_timeout)
    host, port = server.server_address[:2]
    logger.info("serving on http://%s:%d (POST /v1/captions)", host, port)
    # SIGTERM (the orchestration kill) drains like Ctrl-C: stop accepting,
    # finish in-flight batches, then exit
    import signal
    stop_requested = threading.Event()
    signal.signal(signal.SIGTERM, lambda *_: stop_requested.set())
    try:
        while not stop_requested.wait(timeout=1.0):
            pass
        logger.info("SIGTERM: draining and shutting down")
    except KeyboardInterrupt:
        logger.info("shutting down")
    finally:
        stop_server(server)


if __name__ == "__main__":
    main()
