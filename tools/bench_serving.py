#!/usr/bin/env python
"""Serving-path benchmark: latency + sustained throughput of `mmharm-serve`.

Measures what the reference never did — its SageMaker handler runs a B=1
torch forward per instance (sagemaker/inference.py:204-298, the published
endpoint path). Here the whole HTTP stack is exercised end to end: base64
JPEG decode -> tokenization -> u8 wire -> device forward, with the
production engine knobs (MMHARM_ENGINE=fast etc. — same env contract as the
container).

Workloads:
- single-instance requests, sequential: p50 / p95 / p99 latency
- batch requests (``instances`` arrays) from C concurrent clients:
  sustained samples/s

Builds a flagship ViT-B/32 fusion checkpoint fixture (random weights —
throughput is weight-independent) in a temp dir. Run alone on the bench
host (1 CPU): `python tools/bench_serving.py [--fast]`.

Prints one JSON line.
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import os
import statistics
import sys
import tempfile
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_run_dir(tmp: str, tiny: bool = False):
    """Flagship (or tiny, for smoke) CLIP-fusion run dir + encoder dir."""
    import jax

    from tools.run_fullscale_quality_parity import build_fullscale_encoder
    from multimodal_content_moderation_tpu.models import FusionModel
    from multimodal_content_moderation_tpu.training.checkpoints import (
        save_checkpoint,
    )
    from multimodal_content_moderation_tpu.utils.config import save_json

    enc = os.path.join(tmp, "encoder")
    run = os.path.join(tmp, "run")
    os.makedirs(enc)
    os.makedirs(run)
    if tiny:
        from multimodal_content_moderation_tpu.models import CLIPConfig
        from multimodal_content_moderation_tpu.models.clip import (
            CLIPTextConfig,
            CLIPVisionConfig,
        )

        # reuse the full-scale tokenizer assets but a small tower
        build_fullscale_encoder(enc)
        cfg = CLIPConfig(
            text=CLIPTextConfig(
                vocab_size=49408, hidden_size=64, num_layers=2, num_heads=4,
                intermediate_size=128, max_positions=77, eos_token_id=49407,
            ),
            vision=CLIPVisionConfig(
                hidden_size=64, num_layers=2, num_heads=4,
                intermediate_size=128, image_size=224, patch_size=32,
            ),
            projection_dim=64,
        )
        import json as _json

        with open(os.path.join(enc, "config.json")) as f:
            hf = _json.load(f)
        hf["projection_dim"] = 64
        hf["text_config"].update(
            hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=128,
        )
        hf["vision_config"].update(
            hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=128,
        )
        with open(os.path.join(enc, "config.json"), "w") as f:
            _json.dump(hf, f)
        model = FusionModel.create("clip", num_labels=5, clip_config=cfg)
    else:
        build_fullscale_encoder(enc)
        model = FusionModel.create("clip", num_labels=5)
    params = model.init(jax.random.key(0))
    ckpt = save_checkpoint(run, params, step=1)
    names = ["racist", "sexist", "homophobe", "religion", "otherhate"]
    save_json(
        {
            "encoder_name": "clip-vit-base-patch32",
            "encoder_dir": enc,
            "backend": "clip",
            "head": "fusion",
            "fusion_dim": 512,
            "max_text_length": 77,
            "head_hidden_dim": 0,
            "learnable_task_weights": False,
            "thresholds": [0.5] * 5,
            "class_names": names,
            "best_checkpoint_dir": ckpt,
            "use_logit_adjustment": False,
            "priors": None,
            "format": "orbax",
        },
        os.path.join(run, "inference_config.json"),
    )
    # the serving contract takes the checkpoint dir (inference_config.json in
    # its parent — scripts/evaluate.py:95-105 search order), not the run dir
    return ckpt, enc


def make_payloads(n_images: int = 16):
    """Distinct base64 JPEGs (vary content: the tunnel caches identical
    dispatches) + tweet-length texts."""
    from PIL import Image

    g = np.random.default_rng(0)
    images = []
    yy, xx = np.mgrid[0:360, 0:480].astype(np.float32)
    for i in range(n_images):
        base = 127 + 80 * np.sin(xx / (18 + i))[..., None]
        arr = np.clip(base + g.normal(0, 16, (360, 480, 3)), 0, 255).astype(
            np.uint8
        )
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=85)
        images.append(base64.b64encode(buf.getvalue()).decode())
    return images


def post(url: str, body: dict, timeout: float = 300.0) -> dict:
    req = urllib.request.Request(
        url,
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--tiny", action="store_true", help="smoke-test model size")
    ap.add_argument("--port", type=int, default=8901)
    ap.add_argument("--latency_requests", type=int, default=40)
    ap.add_argument("--batch_size", type=int, default=64,
                    help="instances per throughput request")
    ap.add_argument("--batch_requests", type=int, default=12)
    ap.add_argument("--clients", type=int, default=3)
    ap.add_argument("--engine", default="fast")
    ap.add_argument("--precision", default="bf16_fast")
    ap.add_argument("--attention", default="pallas")
    ap.add_argument("--image_backend", default="native_scaled")
    ap.add_argument("--seq_buckets", default="auto",
                    help="MMHARM_SEQ_BUCKETS for the handler (fast engine + "
                    "CLIP: per-batch exact text buckets; 'off' disables)")
    ap.add_argument("--microbatch_ms", type=float, default=0.0,
                    help=">0 enables cross-request micro-batching "
                    "(serving/server.MicroBatcher) with this window")
    ap.add_argument("--microbatch_bypass", type=int, default=16,
                    help="MicroBatcher bypass threshold: requests carrying "
                    ">= this many instances skip coalescing (0 disables)")
    ap.add_argument("--mixed", action="store_true",
                    help="mixed-traffic mode: --small_clients B=1 request "
                    "loops run CONCURRENTLY with the --clients batch loops; "
                    "reports each population's rate + latency separately "
                    "(the MicroBatcher x pipelined-lock interaction test)")
    ap.add_argument("--small_clients", type=int, default=8)
    ap.add_argument("--mixed_seconds", type=float, default=30.0,
                    help="duration of the mixed-traffic measurement window")
    ap.add_argument("--bypass_sweep", default="",
                    help="with --mixed: comma-separated bypass thresholds "
                    "(e.g. 'off,0,8,16,32'; 'off' = MicroBatcher disabled) "
                    "swept as adjacent windows IN ONE PROCESS on the same "
                    "loaded engine — the only sound way to A/B serving "
                    "configs here (tunnel-window variance is +-40% across "
                    "processes)")
    ap.add_argument("--coldstart", action="store_true",
                    help="measure time-to-first-prediction only: model load "
                    "(incl. bucket-ladder prewarm compiles) + first B=1 and "
                    "first batch request. Run twice with "
                    "MMHARM_COMPILE_CACHE=<dir> for the cold/warm pair.")
    args = ap.parse_args(argv)

    os.environ["MMHARM_ENGINE"] = args.engine
    os.environ["MMHARM_PRECISION"] = args.precision
    os.environ["MMHARM_ATTENTION"] = args.attention
    os.environ["MMHARM_IMAGE_BACKEND"] = args.image_backend
    os.environ["MMHARM_MICROBATCH_MS"] = str(args.microbatch_ms)
    os.environ["MMHARM_MICROBATCH_BYPASS"] = str(args.microbatch_bypass)
    os.environ["MMHARM_SEQ_BUCKETS"] = args.seq_buckets

    from multimodal_content_moderation_tpu.serving import server as srv

    with tempfile.TemporaryDirectory() as tmp:
        run, enc = build_run_dir(tmp, tiny=args.tiny)
        print("[bench-serving] model dir ready; loading server ...", flush=True)
        t_load0 = time.perf_counter()
        httpd = srv.serve(run, enc, port=args.port, host="127.0.0.1")
        load_s = time.perf_counter() - t_load0
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        url = f"http://127.0.0.1:{args.port}/invocations"
        images = make_payloads()
        texts = [f"offensive tweet number {i} with several words" for i in range(512)]

        try:
            if args.coldstart:
                # serving cold-start budget (VERDICT r3 #8): serve() runs
                # model_fn incl. the seq-bucket ladder prewarm compiles, so
                # time-to-first-prediction = load_s + first request.
                t0 = time.perf_counter()
                post(url, {"text": texts[0], "image": images[0]})
                first_small = time.perf_counter() - t0
                t0 = time.perf_counter()
                post(url, {"instances": [
                    {"text": texts[i % len(texts)],
                     "image": images[i % len(images)]}
                    for i in range(args.batch_size)
                ]})
                first_batch = time.perf_counter() - t0
                result = {
                    "metric": "serving_time_to_first_prediction",
                    "unit": "s",
                    "value": round(load_s + first_small, 2),
                    "model_load_s": round(load_s, 2),
                    "first_small_request_s": round(first_small, 2),
                    "first_batch_request_s": round(first_batch, 2),
                    "compile_cache": os.environ.get("MMHARM_COMPILE_CACHE", ""),
                    "seq_buckets": args.seq_buckets,
                    "engine": args.engine,
                }
                print(json.dumps(result))
                return result

            # warmup (compile both padded-batch shapes: 1 and batch_size)
            post(url, {"text": texts[0], "image": images[0]})
            post(
                url,
                {
                    "instances": [
                        {"text": texts[i % len(texts)],
                         "image": images[i % len(images)]}
                        for i in range(args.batch_size)
                    ]
                },
            )

            if args.mixed:
                # ---- mixed traffic: small B=1 loops + batch loops, same
                # window. The question (VERDICT r3 #3): do the MicroBatcher's
                # small-request coalescing and the pipelined device lock's
                # batch throughput coexist, or does one starve the other?
                def mixed_window() -> dict:
                    stop = time.perf_counter() + args.mixed_seconds
                    small_lat, batch_done = [], []
                    lk = threading.Lock()

                    def small_client(cid: int):
                        i = 0
                        while time.perf_counter() < stop:
                            t0 = time.perf_counter()
                            post(url, {
                                "text": texts[(cid * 97 + i) % len(texts)],
                                "image": images[(cid + i) % len(images)],
                            })
                            with lk:
                                small_lat.append(time.perf_counter() - t0)
                            i += 1

                    def batch_client(cid: int):
                        r = 0
                        while time.perf_counter() < stop:
                            body = {"instances": [
                                {"text": texts[(cid * 131 + r * 17 + i) % len(texts)],
                                 "image": images[(cid + r + i) % len(images)]}
                                for i in range(args.batch_size)
                            ]}
                            post(url, body)
                            with lk:
                                batch_done.append(args.batch_size)
                            r += 1

                    threads = [
                        threading.Thread(target=small_client, args=(c,))
                        for c in range(args.small_clients)
                    ] + [
                        threading.Thread(target=batch_client, args=(c,))
                        for c in range(args.clients)
                    ]
                    t0 = time.perf_counter()
                    for th in threads:
                        th.start()
                    for th in threads:
                        th.join()
                    dt = time.perf_counter() - t0
                    sl = sorted(x * 1000 for x in small_lat)
                    qq = lambda p: (
                        sl[min(len(sl) - 1, int(p * len(sl)))] if sl else None
                    )
                    return {
                        "value": round(
                            (len(small_lat) + sum(batch_done)) / dt, 1
                        ),
                        "small_requests_per_s": round(len(small_lat) / dt, 1),
                        "small_p50_ms": round(qq(0.50), 1) if sl else None,
                        "small_p99_ms": round(qq(0.99), 1) if sl else None,
                        "batch_samples_per_s": round(sum(batch_done) / dt, 1),
                        "window_s": round(dt, 1),
                    }

                common = {
                    "unit": "samples/s",
                    "small_clients": args.small_clients,
                    "batch_clients": args.clients,
                    "request_batch": args.batch_size,
                    "microbatch_ms": args.microbatch_ms,
                    "engine": args.engine,
                }
                if args.bypass_sweep:
                    st = httpd.state
                    if st.batcher is None:
                        raise SystemExit(
                            "--bypass_sweep requires --microbatch_ms > 0"
                        )
                    saved = st.batcher
                    sweep = []
                    for tok in args.bypass_sweep.split(","):
                        tok = tok.strip()
                        if not tok:
                            continue
                        if tok == "off":
                            st.batcher = None
                        else:
                            st.batcher = saved
                            saved._bypass_n = int(tok)
                        w = mixed_window()
                        w["bypass"] = tok
                        sweep.append(w)
                        print(json.dumps({"window": w}), flush=True)
                    st.batcher = saved
                    result = dict(
                        metric="serving_mixed_traffic_bypass_sweep",
                        value=max(w["value"] for w in sweep),
                        sweep=sweep,
                        **common,
                    )
                else:
                    result = dict(
                        metric="serving_mixed_traffic",
                        microbatch_bypass=args.microbatch_bypass,
                        **mixed_window(),
                        **common,
                    )
                print(json.dumps(result))
                return result

            # ---- single-instance latency ----
            lat = []
            for i in range(args.latency_requests):
                t0 = time.perf_counter()
                out = post(
                    url,
                    {"text": texts[i % len(texts)],
                     "image": images[i % len(images)]},
                )
                lat.append(time.perf_counter() - t0)
                assert "predictions" in out or isinstance(out, list), out
            lat_ms = sorted(x * 1000 for x in lat)
            q = lambda p: lat_ms[min(len(lat_ms) - 1, int(p * len(lat_ms)))]

            # ---- concurrent batch throughput ----
            done = []
            lock = threading.Lock()

            def client(cid: int):
                for r in range(args.batch_requests // args.clients):
                    body = {
                        "instances": [
                            {"text": texts[(cid * 131 + r * 17 + i) % len(texts)],
                             "image": images[(cid + r + i) % len(images)]}
                            for i in range(args.batch_size)
                        ]
                    }
                    post(url, body)
                    with lock:
                        done.append(args.batch_size)

            threads = [
                threading.Thread(target=client, args=(c,))
                for c in range(args.clients)
            ]
            t0 = time.perf_counter()
            for th in threads:
                th.start()
            for th in threads:
                th.join()
            dt = time.perf_counter() - t0
            total = sum(done)

            result = {
                "metric": "serving_sustained_samples_per_s",
                "value": round(total / dt, 1),
                "unit": "samples/s",
                "latency_p50_ms": round(q(0.50), 1),
                "latency_p95_ms": round(q(0.95), 1),
                "latency_p99_ms": round(q(0.99), 1),
                "latency_requests": args.latency_requests,
                "throughput_samples": total,
                "clients": args.clients,
                "request_batch": args.batch_size,
                "engine": args.engine,
                "precision": args.precision,
                "attention": args.attention,
                "microbatch_ms": args.microbatch_ms,
                # reference comparison: its endpoint loops B=1 torch forwards
                # per instance (sagemaker/inference.py:204-298); its offline
                # GPU eval rate was 381.5/s — an endpoint can't exceed that
                "vs_reference_offline_381.5": round(total / dt / 381.5, 2),
            }
            print(json.dumps(result))
            return result
        finally:
            httpd.shutdown()


if __name__ == "__main__":
    main()
