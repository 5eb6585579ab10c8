#!/usr/bin/env python
"""Eval-throughput bench for any backend x head combination.

bench.py is the stable headline driver (CLIP fusion); this tool measures the
other reference-published configurations on the same staged-batch discipline:

    python tools/bench_eval.py --backend siglip --head fusion --batch 48
    python tools/bench_eval.py --backend clip --head mtl --batch 192

Reference baselines (runs/*/test_metrics.json): clip_fusion 381.5/s,
clip_mtl 390.9/s, siglip_fusion 236.3/s on its GPU.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

BASELINES = {
    ("clip", "fusion"): 381.5,
    ("clip", "mtl"): 390.9,
    ("siglip", "fusion"): 236.3,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", choices=["clip", "siglip"], default="siglip")
    ap.add_argument("--head", choices=["fusion", "mtl"], default="fusion")
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--n_samples", type=int, default=4800)
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument(
        "--sweep", type=str, default="",
        help="comma-separated batch sizes to sweep (e.g. 48,96,144)",
    )
    ap.add_argument(
        "--vision_attention", choices=["xla", "pallas"], default="xla",
        help="attention core for the vision tower (pallas = fused "
        "[B,T,D]-layout kernel at short seq / flash kernel at long)",
    )
    ap.add_argument(
        "--text_attention", choices=["xla", "pallas"], default="xla",
        help="attention core for the text tower",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from multimodal_content_moderation_tpu.data.images import (
        CLIP_MEAN, CLIP_STD, SIGLIP_MEAN, SIGLIP_STD,
    )
    from multimodal_content_moderation_tpu.models import FusionModel, MultiTaskModel
    from multimodal_content_moderation_tpu.models.convert import to_dtype
    from multimodal_content_moderation_tpu.models.fast_infer import FastInferenceEngine

    cls = MultiTaskModel if args.head == "mtl" else FusionModel
    kw = {"num_tasks": 5} if args.head == "mtl" else {"num_labels": 5}
    model = cls.create(args.backend, **kw)
    cfg = model.clip_config if args.backend == "clip" else model.siglip_config
    bf = lambda c: dataclasses.replace(
        c, compute_dtype="bfloat16", scores_dtype="bfloat16"
    )
    cfg = dataclasses.replace(
        cfg,
        text=dataclasses.replace(bf(cfg.text), attention_impl=args.text_attention),
        vision=dataclasses.replace(
            bf(cfg.vision), attention_impl=args.vision_attention
        ),
    )
    field = "clip_config" if args.backend == "clip" else "siglip_config"
    model = dataclasses.replace(model, **{field: cfg})
    params = to_dtype(model.init(jax.random.key(0)), jnp.bfloat16)
    mean, std = (
        (CLIP_MEAN, CLIP_STD) if args.backend == "clip" else (SIGLIP_MEAN, SIGLIP_STD)
    )
    engine = FastInferenceEngine(model, params, mean, std)

    tcfg = cfg.text
    seq = min(tcfg.max_positions, 77)
    img = model.image_size
    vocab = tcfg.vocab_size
    eos = getattr(tcfg, "eos_token_id", vocab - 1)

    def run_b(B: int) -> float:
        n_batches = -(-args.n_samples // B)
        n_samples = n_batches * B
        g = np.random.default_rng(0)
        mask = jax.device_put(np.ones((B, seq), np.int32))
        ones = jax.device_put(np.ones((B,), np.float32))
        patch_stage = [
            jax.device_put(
                engine.patches_from_hwc(
                    g.integers(0, 256, size=(B, img, img, 3), dtype=np.uint8)
                )
            )
            for _ in range(4)
        ]

        def make_ids(seed):
            gg = np.random.default_rng(seed)
            ids = gg.integers(1, vocab - 2, size=(B, seq)).astype(np.int32)
            ids[:, seq // 2] = eos
            return ids

        id_stage = [
            jax.device_put(make_ids(1000 + k))
            for k in range(args.passes * n_batches)
        ]
        _ = float(engine(id_stage[0], mask, patch_stage[0], ones, ones)[0, 0])

        best, k = 0.0, 0
        for _ in range(args.passes):
            t0 = time.perf_counter()
            out = None
            for i in range(n_batches):
                out = engine(id_stage[k], mask, patch_stage[i % 4], ones, ones)
                k += 1
            _ = float(out[0, 0])  # value fetch = true barrier (axon)
            best = max(best, n_samples / (time.perf_counter() - t0))
        return best

    sizes = (
        [int(s) for s in args.sweep.split(",") if s] if args.sweep else [args.batch]
    )
    results = [{"batch": B, "samples_per_s": round(run_b(B), 1)} for B in sizes]
    top = max(results, key=lambda r: r["samples_per_s"])

    baseline = BASELINES.get((args.backend, args.head))
    print(
        json.dumps(
            {
                "metric": f"{args.backend}_{args.head}_eval_samples_per_sec_per_chip",
                "value": top["samples_per_s"],
                "unit": "samples/s",
                "batch": top["batch"],
                "vs_baseline": (
                    round(top["samples_per_s"] / baseline, 2) if baseline else None
                ),
                "attention": {
                    "text": args.text_attention, "vision": args.vision_attention
                },
                "sweep": results if len(results) > 1 else None,
            }
        )
    )


if __name__ == "__main__":
    main()
