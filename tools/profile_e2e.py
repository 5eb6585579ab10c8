#!/usr/bin/env python
"""Stage-level profile of the warm-cache e2e evaluation loop (VERDICT r2 #4a).

The warm-cache pass reads preprocessed crops at 12-13k rows/s and the
tunnel's fresh-upload ceiling is ~280 rows/s, yet the measured warm e2e sits
~15% below the ceiling. This instruments the same pipeline shape as
models/fast_infer.evaluate_logits_u8 with wall-clock attribution:

  producer thread: cache read / batch assembly | patch extraction | q.put wait
  consumer thread: engine() dispatch call (includes the h2d transfer of host
                   arrays) | periodic np.asarray(logits) fetches (26 ms RTT
                   each on the tunneled chip) | q.get wait

Run alone on the bench host: `python tools/profile_e2e.py`.
Prints one JSON line with per-stage seconds and the implied rows/s.
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

    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--batch", type=int, default=int(os.environ.get("BENCH_BATCH", "144")))
    ap.add_argument("--rows", type=int, default=1536)
    ap.add_argument("--images", type=int, default=192)
    ap.add_argument("--passes", type=int, default=3)
    args = ap.parse_args()

    import dataclasses
    import shutil
    import tempfile

    import jax

    from multimodal_content_moderation_tpu.data.images import CLIP_MEAN, CLIP_STD
    from multimodal_content_moderation_tpu.models import FusionModel
    from multimodal_content_moderation_tpu.models.convert import to_dtype
    from multimodal_content_moderation_tpu.models.fast_infer import (
        FastInferenceEngine,
    )

    import jax.numpy as jnp

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

    tmp = tempfile.mkdtemp(prefix="profile_e2e_")
    try:
        # same CSV/JPEG/cache fixture shapes as bench.bench_e2e
        from PIL import Image

        from multimodal_content_moderation_tpu.data.dataset import CSVDataset
        from multimodal_content_moderation_tpu.data.images import ImagePreprocessor
        from multimodal_content_moderation_tpu.data.tokenizer import (
            bytes_to_unicode,
            load_tokenizer,
        )

        b2u = bytes_to_unicode()
        vocab = {}
        for ch in b2u.values():
            vocab[ch] = len(vocab)
        for ch in b2u.values():
            vocab[ch + "</w>"] = len(vocab)
        vocab["<|startoftext|>"] = len(vocab)
        vocab["<|endoftext|>"] = len(vocab)
        with open(os.path.join(tmp, "vocab.json"), "w") as f:
            json.dump(vocab, f)
        with open(os.path.join(tmp, "merges.txt"), "w") as f:
            f.write("#version: 0.2\n")
        tokenizer = load_tokenizer(tmp)

        g = np.random.default_rng(0)
        img_dir = os.path.join(tmp, "img")
        os.mkdir(img_dir)
        yy, xx = np.mgrid[0:400, 0:500].astype(np.float32)
        for i in range(args.images):
            base = (
                127
                + 80 * np.sin(xx / (20 + i % 13))[..., None]
                + 40 * np.cos(yy / (15 + i % 7))[..., None]
            )
            arr = np.clip(base + g.normal(0, 18, size=(400, 500, 3)), 0, 255).astype(
                np.uint8
            )
            Image.fromarray(arr).save(os.path.join(img_dir, f"{i}.jpg"), quality=85)
        rows = ["text,image_path,labels"]
        for r in range(args.rows):
            rows.append(
                f"offensive tweet number {r} with several words,"
                f"{r % args.images}.jpg,racist"
            )
        csv_path = os.path.join(tmp, "test.csv")
        with open(csv_path, "w") as f:
            f.write("\n".join(rows) + "\n")

        ds = CSVDataset(
            csv_path,
            img_dir,
            tokenizer,
            ImagePreprocessor(
                224, 224, CLIP_MEAN, CLIP_STD,
                output="uint8_hwc", backend="native_scaled",
            ),
            77,
            class_names=["racist", "sexist", "homophobe", "religion", "otherhate"],
            cache_dir=os.path.join(tmp, "cache"),
        )

        B = args.batch

        def instrumented_pass():
            stats = {
                "producer_batch_assembly_s": 0.0,
                "producer_patch_extract_s": 0.0,
                "producer_qput_wait_s": 0.0,
                "consumer_qget_wait_s": 0.0,
                "consumer_dispatch_s": 0.0,
                "consumer_fetch_s": 0.0,
            }
            q: queue.Queue = queue.Queue(maxsize=2)
            _END = object()

            def producer():
                it = ds.batches(B, pad_to_batch=True, num_workers=8)
                while True:
                    t0 = time.perf_counter()
                    try:
                        batch = next(it)
                    except StopIteration:
                        break
                    t1 = time.perf_counter()
                    stats["producer_batch_assembly_s"] += t1 - t0
                    batch.pop("_valid")
                    batch.pop("labels")
                    patches = engine.patches_from_hwc(batch.pop("pixel_values"))
                    t2 = time.perf_counter()
                    stats["producer_patch_extract_s"] += t2 - t1
                    q.put((batch, patches))
                    stats["producer_qput_wait_s"] += time.perf_counter() - t2
                q.put(_END)

            threading.Thread(target=producer, daemon=True).start()
            outs = []
            n_fetch = 0
            t_pass = time.perf_counter()
            while True:
                t0 = time.perf_counter()
                item = q.get()
                t1 = time.perf_counter()
                stats["consumer_qget_wait_s"] += t1 - t0
                if item is _END:
                    break
                batch, patches = item
                outs.append(
                    engine(
                        batch["input_ids"], batch["attention_mask"], patches,
                        batch["text_present"], batch["image_present"],
                    )
                )
                t2 = time.perf_counter()
                stats["consumer_dispatch_s"] += t2 - t1
                if len(outs) > 2:
                    np.asarray(outs.pop(0))
                    n_fetch += 1
                    stats["consumer_fetch_s"] += time.perf_counter() - t2
            t0 = time.perf_counter()
            for o in outs:
                np.asarray(o)
                n_fetch += 1
            stats["consumer_fetch_s"] += time.perf_counter() - t0
            stats["total_s"] = time.perf_counter() - t_pass
            stats["rows_per_s"] = args.rows / stats["total_s"]
            stats["n_fetches"] = n_fetch
            return stats

        # pass 1 fills the cache (cold), then profile warm passes
        cold = instrumented_pass()
        warm = [instrumented_pass() for _ in range(args.passes)]
        best = min(warm, key=lambda s: s["total_s"])
        out = {
            "batch": B,
            "rows": args.rows,
            "cold": {k: round(v, 3) for k, v in cold.items()},
            "warm_best": {k: round(v, 3) for k, v in best.items()},
            "warm_all_rows_per_s": [round(s["rows_per_s"], 1) for s in warm],
        }
        print(json.dumps(out, indent=2))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
