"""Standalone HTTP model server implementing the SageMaker container
contract.

The reference's ``sagemaker/inference.py`` handler functions are hosted by
the SageMaker *PyTorch serving stack* (torchserve behind the scenes), which
provides the actual HTTP listener. A TPU serving container has no such
stack, so this module is the TPU-native equivalent: a dependency-free
threaded HTTP server that speaks the same container interface SageMaker
probes —

    GET  /ping         -> 200 once the model is loaded (health check)
    POST /invocations  -> handler.input_fn -> predict_fn -> output_fn

Request/response bodies are exactly the reference's JSON schema
(sagemaker/inference.py:169-348): a single object or ``{"instances": [...]}``
with ``text`` / ``image_base64`` / ``image_url`` fields, answered with
``{"predictions": [{"class_predictions", "probabilities", "any_harmful"}]}``.

Run: ``mmharm-serve --model-dir /opt/ml/model [--port 8080]`` (SageMaker
containers conventionally listen on 8080). Device compute is a single jitted
forward shared by all request threads; JAX dispatch is thread-safe and
requests are internally batched per call by ``predict_fn``.
"""

from __future__ import annotations

import argparse
import json
import logging
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from multimodal_content_moderation_tpu.serving import handler as h

logger = logging.getLogger(__name__)


class _State:
    classifier = None
    lock = threading.Lock()
    batcher = None  # optional cross-request MicroBatcher
    whole_request_lock = False  # MMHARM_WHOLE_REQUEST_LOCK=1 disables
    # host-prep/device pipelining (strict FIFO request serialization)


class MicroBatcher:
    """Cross-request micro-batching for concurrent /invocations.

    The reference endpoint runs one B=1 torch forward per instance
    (sagemaker/inference.py:204-298). Here predict_fn already batches the
    instances WITHIN a request; this layer additionally coalesces instances
    from concurrently-waiting requests into one device batch: a request
    enqueues its instances and blocks; whichever thread finds the batcher
    idle becomes the leader, waits ``window_ms`` for stragglers, drains up
    to ``max_batch`` instances, runs them through ``predict``, then routes
    each requester its slice. Under low concurrency the window is the only
    added latency (a few ms); under high concurrency device batches grow and
    per-sample cost drops toward the offline rate.

    Adaptive routing: a request already carrying ``bypass_n`` or more
    instances gains nothing from coalescing — it IS a device batch — and
    measured end-to-end the window + worker hop costs batch traffic ~20%
    (145.5 -> 117.2 samples/s, tools/bench_serving.py). Such requests skip
    the queue and run directly on the calling thread (still serialized at
    the device by the shared lock inside ``predict``), so small-request
    coalescing and full-batch throughput coexist under mixed traffic.

    Enable with MMHARM_MICROBATCH_MS>0 (mmharm-serve env knob);
    MMHARM_MICROBATCH_BYPASS sets the bypass threshold (default 16, 0
    disables bypassing).
    """

    def __init__(
        self, predict, window_ms: float = 4.0, max_batch: int = 256,
        bypass_n: int = 16,
    ):
        self._predict = predict
        self._window_s = window_ms / 1000.0
        self._max_batch = max_batch
        self._bypass_n = bypass_n
        self._cv = threading.Condition()
        self._pending: list = []  # (instances, slot) tuples
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def _run(self):
        while True:
            with self._cv:
                while not self._pending:
                    self._cv.wait()
            # a request just arrived; hold the window open for stragglers
            time.sleep(self._window_s)
            with self._cv:
                batch = self._pending[: self._max_batch]
                del self._pending[: len(batch)]
            flat = [i for insts, _ in batch for i in insts]
            try:
                preds = self._predict(flat)
                k = 0
                for insts, s in batch:
                    s["out"] = preds[k : k + len(insts)]
                    k += len(insts)
            except Exception as e:  # noqa: BLE001 - fan the error out
                for _, s in batch:
                    s["err"] = e
            for _, s in batch:
                s["done"].set()

    def __call__(self, instances):
        if self._bypass_n and len(instances) >= self._bypass_n:
            # already a device batch: coalescing only adds window latency
            # and a worker hop — run it here (device lock inside predict)
            return self._predict(instances)
        slot = {"done": threading.Event(), "out": None, "err": None}
        with self._cv:
            self._pending.append((instances, slot))
            self._cv.notify()
        slot["done"].wait()
        if slot["err"] is not None:
            raise slot["err"]
        return slot["out"]


def _make_request_handler(state: _State):
    class Handler(BaseHTTPRequestHandler):
        # keep the default HTTP/1.1 keep-alive off: SageMaker's router opens
        # fresh connections and closing early simplifies draining
        protocol_version = "HTTP/1.0"

        def log_message(self, fmt, *args):  # route through logging, not stderr
            logger.debug("%s - %s", self.address_string(), fmt % args)

        def _send(self, code: int, body: str, content_type="application/json"):
            data = body.encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", content_type)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            if self.path == "/ping":
                if state.classifier is not None:
                    self._send(200, "{}")
                else:
                    self._send(503, json.dumps({"error": "model not loaded"}))
            else:
                self._send(404, json.dumps({"error": "not found"}))

        def do_POST(self):
            if self.path != "/invocations":
                self._send(404, json.dumps({"error": "not found"}))
                return
            # 400 is reserved for malformed input (the router treats 4xx as a
            # client error); model/device failures return 500 so SageMaker's
            # health machinery sees a genuine server-side fault and can retry
            try:
                length = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(length).decode("utf-8")
                instances = h.input_fn(
                    body, self.headers.get("Content-Type", "application/json")
                )
            except Exception as e:  # noqa: BLE001 - per-request error capture
                logger.exception("invocation rejected: bad input")
                self._send(400, json.dumps({"error": str(e)}))
                return
            try:
                if state.batcher is not None:
                    # cross-request micro-batching: concurrent requests'
                    # instances coalesce into one device batch
                    preds = state.batcher(instances)
                elif state.whole_request_lock:
                    # ops fallback (MMHARM_WHOLE_REQUEST_LOCK=1): serialize
                    # entire requests — strict FIFO, no pipelining
                    with state.lock:
                        preds = h.predict_fn(instances, state.classifier)
                else:
                    # the lock serializes ONLY the device forward (one
                    # in-flight batch keeps tail latency sane on a single
                    # chip); host prep — base64/JPEG decode, tokenize —
                    # runs unlocked so concurrent requests pipeline
                    preds = h.predict_fn(
                        instances, state.classifier, device_lock=state.lock
                    )
                self._send(200, h.output_fn(preds))
            except Exception as e:  # noqa: BLE001 - per-request error capture
                logger.exception("invocation failed")
                self._send(500, json.dumps({"error": str(e)}))

    return Handler


def serve(
    model_dir: str,
    encoder_dir: Optional[str] = None,
    port: int = 8080,
    host: str = "0.0.0.0",
) -> ThreadingHTTPServer:
    """Load the model and return a ready (not yet serving) HTTP server.

    Callers run ``server.serve_forever()``; tests drive it from a thread and
    ``shutdown()`` it."""
    import os

    state = _State()
    state.classifier = h.model_fn(model_dir, encoder_dir)
    state.whole_request_lock = os.environ.get(
        "MMHARM_WHOLE_REQUEST_LOCK", ""
    ).lower() in ("1", "true", "yes")
    window_ms = float(os.environ.get("MMHARM_MICROBATCH_MS", "0") or 0)
    if window_ms > 0:
        state.batcher = MicroBatcher(
            lambda insts: h.predict_fn(
                insts, state.classifier, device_lock=state.lock
            ),
            window_ms=window_ms,
            max_batch=int(os.environ.get("MMHARM_MICROBATCH_MAX", "256")),
            bypass_n=int(os.environ.get("MMHARM_MICROBATCH_BYPASS", "16")),
        )
        logger.info("cross-request micro-batching on (window %.1f ms)", window_ms)
    server = ThreadingHTTPServer((host, port), _make_request_handler(state))
    # exposed for in-process reconfiguration (benchmarks sweep MicroBatcher
    # knobs across measurement windows without reloading the model)
    server.state = state
    logger.info("model loaded; listening on %s:%d", host, port)
    return server


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Serve a trained checkpoint over the SageMaker container "
        "HTTP contract (/ping, /invocations)"
    )
    parser.add_argument("--model-dir", required=True)
    parser.add_argument("--encoder-dir", default=None)
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument("--host", default="0.0.0.0")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    server = serve(args.model_dir, args.encoder_dir, args.port, args.host)
    try:
        server.serve_forever()
    except KeyboardInterrupt:  # pragma: no cover
        server.shutdown()


if __name__ == "__main__":  # pragma: no cover
    main()
