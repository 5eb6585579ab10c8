#!/usr/bin/env python
"""Multi-producer e2e scaling simulation (VERDICT r2 #4b).

The bench host has ONE decode core, so the claim "~N decode cores saturate
the chip-side ceiling" was arithmetic (PARITY.md). This measures the actual
delivered-throughput curve: all host batches are pre-staged in RAM (content
identical to the bench fixture), and a producer thread delivers each batch
after sleeping ``measured_single_core_decode_time / n_cores`` — i.e. a
faithful rate model of an N-core decode farm feeding the same dispatch loop
(models/fast_infer.evaluate_logits_u8's shape: bounded queue, async
dispatch, periodic fetch barrier).

Output: rows/s for n_cores in {1,2,4,8,16,inf}; the knee of the curve is
where decode stops being the bottleneck and the transfer/dispatch ceiling
takes over. `inf` (no sleep) IS that ceiling, measured not assumed.

Run alone on the bench host: `python tools/sim_multicore_e2e.py`.
"""

from __future__ import annotations

import json
import os
import queue
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import argparse
    import dataclasses

    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--batch", type=int, default=144)
    ap.add_argument("--n_batches", type=int, default=12)
    ap.add_argument("--cores", default="1,2,4,8,16,0",
                    help="0 = infinite cores (pure transfer/dispatch ceiling)")
    ap.add_argument("--decode_rate", type=float, default=0.0,
                    help="single-core decode rate img/s (0 = measure via "
                    "tools/bench_input numbers: native_scaled ~567/s)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from multimodal_content_moderation_tpu.data.images import CLIP_MEAN, CLIP_STD
    from multimodal_content_moderation_tpu.models import FusionModel
    from multimodal_content_moderation_tpu.models.convert import to_dtype
    from multimodal_content_moderation_tpu.models.fast_infer import (
        FastInferenceEngine,
    )

    model = FusionModel.create("clip", num_labels=5)
    cfg = model.clip_config
    model = dataclasses.replace(
        model,
        clip_config=dataclasses.replace(
            cfg,
            text=dataclasses.replace(
                cfg.text, compute_dtype="bfloat16", scores_dtype="bfloat16",
                attention_impl="pallas",
            ),
            vision=dataclasses.replace(
                cfg.vision, compute_dtype="bfloat16", scores_dtype="bfloat16",
                attention_impl="pallas",
            ),
        ),
    )
    params = to_dtype(model.init(jax.random.key(0)), jnp.bfloat16)
    engine = FastInferenceEngine(model, params, CLIP_MEAN, CLIP_STD)

    B = args.batch
    img = model.image_size
    vocab = cfg.text.vocab_size
    eos = cfg.text.eos_token_id
    g = np.random.default_rng(0)

    # pre-staged HOST batches (distinct content per dispatch — the tunnel
    # caches identical dispatches). Patch extraction included (it is part of
    # the producer cost in the real loop but cheap: pure reshape).
    def host_batch(seed):
        gg = np.random.default_rng(seed)
        ids = gg.integers(1, vocab - 2, size=(B, 77)).astype(np.int32)
        ids[:, 30] = eos
        crops = gg.integers(0, 256, size=(B, img, img, 3), dtype=np.uint8)
        return {
            "input_ids": ids,
            "attention_mask": np.ones((B, 77), np.int32),
            "patches": engine.patches_from_hwc(crops),
            "text_present": np.ones((B,), np.float32),
            "image_present": np.ones((B,), np.float32),
        }

    staged = [host_batch(i) for i in range(args.n_batches)]

    # single-core decode seconds per batch (native_scaled measured rate from
    # tools/bench_input.py unless overridden)
    per_core_rate = args.decode_rate or 567.0
    batch_decode_s = B / per_core_rate

    # warmup / compile
    b0 = staged[0]
    _ = float(
        engine(b0["input_ids"], b0["attention_mask"], b0["patches"],
               b0["text_present"], b0["image_present"])[0, 0]
    )

    def run(n_cores: int) -> float:
        """rows/s with a producer limited to n_cores' decode rate
        (n_cores=0 -> no decode limit)."""
        q: queue.Queue = queue.Queue(maxsize=2)
        _END = object()

        def producer():
            for k, b in enumerate(staged):
                if n_cores:
                    time.sleep(batch_decode_s / n_cores)
                q.put(b)
            q.put(_END)

        threading.Thread(target=producer, daemon=True).start()
        outs = []
        t0 = time.perf_counter()
        while True:
            item = q.get()
            if item is _END:
                break
            outs.append(
                engine(item["input_ids"], item["attention_mask"],
                       item["patches"], item["text_present"],
                       item["image_present"])
            )
            if len(outs) > 2:
                np.asarray(outs.pop(0))
        for o in outs:
            np.asarray(o)
        return args.n_batches * B / (time.perf_counter() - t0)

    cores = [int(c) for c in args.cores.split(",")]
    curve = []
    for c in cores:
        rates = [run(c) for _ in range(3)]
        curve.append(
            {
                "cores": c if c else "inf",
                "rows_per_s": round(float(np.median(rates)), 1),
                "min": round(min(rates), 1),
                "max": round(max(rates), 1),
            }
        )
        print(f"[sim] cores={c or 'inf'}: {curve[-1]['rows_per_s']} rows/s",
              flush=True)
    print(json.dumps({
        "batch": B,
        "per_core_decode_rate_img_s": per_core_rate,
        "curve": curve,
    }))


if __name__ == "__main__":
    main()
