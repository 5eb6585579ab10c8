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
    ap.add_argument(
        "--backend", choices=["clip", "siglip", "generic"], default="siglip"
    )
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
    ap.add_argument(
        "--int8_mlp", action="store_true",
        help="opt-in int8 fc1 GEMMs at the measured-winning (768, 3072) "
        "shape (ops/quant.py; accuracy-impacting — quality delta in "
        "docs/quality_parity_int8_mlp.json)",
    )
    ap.add_argument(
        "--decompose", action="store_true",
        help="also time the text tower, vision tower, and pooling head as "
        "separate jits at --batch (per-batch ms + effective TFLOPS)",
    )
    ap.add_argument(
        "--bucket", type=int, default=0,
        help="time the seq-bucketed device path at this static text width "
        "(tweet-length rows; the evaluate CLI's --seq_buckets auto "
        "production default). EXACT for both backends: CLIP truncates "
        "(causal + EOS pooling), SigLIP keeps bucket-1 real columns plus a "
        "carry column at the full width's last position "
        "(models/fast_infer.bucket_batch_text)",
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
    if args.backend == "generic":
        # ViT-B/16 + BERT-base VisionTextDualEncoder at the canonical shape,
        # with the checkpoint-level projection the fusion head consumes
        from multimodal_content_moderation_tpu.models.generic import (
            GenericDualConfig,
        )

        kw["generic_config"] = GenericDualConfig(projection_dim=512)
    model = cls.create(args.backend, **kw)
    field = f"{args.backend}_config"
    cfg = getattr(model, field)
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
    model = dataclasses.replace(model, **{field: cfg})
    params = to_dtype(model.init(jax.random.key(0)), jnp.bfloat16)
    if args.int8_mlp:
        from multimodal_content_moderation_tpu.ops.quant import (
            quantize_fc1_layers,
        )

        params, nq = quantize_fc1_layers(params)
        print(f"[bench-eval] int8 fc1 layers: {nq}", file=sys.stderr)
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
        T = args.bucket if args.bucket and args.bucket < seq else seq
        carry = None
        if T < seq and args.backend != "clip":
            # SigLIP bucket layout: T-1 real columns + a PAD carry column
            # evaluated at the full width's last position (exact — see
            # models/fast_infer.bucket_batch_text)
            carry = seq - 1
        mask_np = np.ones((B, T), np.int32)
        if carry is not None:
            mask_np[:, -1] = 0
        mask = jax.device_put(mask_np)
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
            ids = gg.integers(1, vocab - 2, size=(B, T)).astype(np.int32)
            ids[:, T // 2] = eos
            if carry is not None:
                ids[:, -1] = 0  # PAD in the carry slot
            return ids

        id_stage = [
            jax.device_put(make_ids(1000 + k))
            for k in range(args.passes * n_batches)
        ]
        # dedicated warmup args (seed 999): axon can serve a repeated
        # argument-identical dispatch from cache, inflating pass 1
        warm = jax.device_put(make_ids(999))
        _ = float(engine(warm, mask, patch_stage[0], ones, ones, carry_pos=carry)[0, 0])

        rates, k = [], 0
        for _ in range(args.passes):
            t0 = time.perf_counter()
            out = None
            for i in range(n_batches):
                out = engine(
                    id_stage[k], mask, patch_stage[i % 4], ones, ones,
                    carry_pos=carry,
                )
                k += 1
            _ = float(out[0, 0])  # value fetch = true barrier (axon)
            rates.append(n_samples / (time.perf_counter() - t0))
        return {"best": max(rates), "median": float(np.median(rates))}

    def time_fn(fn, bp, stages, n_iters=40):
        """Median per-dispatch seconds for jitted fn(bp, *args) over staged
        varying args (value fetch on the last output = the only true barrier
        on axon). ``bp`` must be an EXPLICIT argument: closure-captured
        device arrays are embedded as HLO constants, and a 12-layer d=768
        backbone as literals blows the remote-compile request size limit
        (HTTP 413)."""
        fn = jax.jit(fn)
        _ = float(np.asarray(fn(bp, *stages[0])).ravel()[0])
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = None
            for i in range(n_iters):
                out = fn(bp, *stages[i % len(stages)])
            _ = float(np.asarray(out).ravel()[0])
            times.append((time.perf_counter() - t0) / n_iters)
        return float(np.median(times))

    def decompose(B: int) -> dict:
        """Per-tower timing at batch B: where does the eval millisecond go?"""
        from multimodal_content_moderation_tpu.models import siglip as sig
        from multimodal_content_moderation_tpu.models import clip as clip_mod

        mdl = engine.model
        bp = jax.device_put(engine.params["backbone"])
        g = np.random.default_rng(7)
        n_stage = 4
        ids_st = [
            (
                jax.device_put(
                    g.integers(1, vocab - 2, size=(B, seq)).astype(np.int32)
                ),
                jax.device_put(np.ones((B, seq), np.int32)),
            )
            for _ in range(n_stage)
        ]
        patch_st = [
            jax.device_put(
                engine.patches_from_hwc(
                    g.integers(0, 256, size=(B, img, img, 3), dtype=np.uint8)
                )
            )
            for _ in range(n_stage)
        ]

        if args.backend == "siglip":
            scfg = mdl.siglip_config
            text_fn = lambda b, ids, m: sig.siglip_text_features(b, ids, m, scfg)
            vis_fn = lambda b, p: sig.siglip_image_features_from_tokens(
                b, mdl._embed_u8(b, p), scfg
            )
            n_pat = (scfg.vision.image_size // scfg.vision.patch_size) ** 2
            D = scfg.vision.hidden_size
            hid_st = [
                jax.device_put(
                    g.standard_normal((B, n_pat, D)).astype(np.float32) / 30
                )
                for _ in range(n_stage)
            ]
            pool_fn = lambda b, h: sig._map_head(
                h.astype(scfg.vision.compute_dtype),
                b["vision_model"]["map_head"],
                scfg.vision,
            )
        elif args.backend == "generic":
            from multimodal_content_moderation_tpu.models import generic as gen

            gcfg = mdl.generic_config
            text_fn = lambda b, ids, m: gen.generic_text_features(b, ids, m, gcfg)
            vis_fn = lambda b, p: gen.generic_image_features_from_tokens(
                b, mdl._embed_u8(b, p), gcfg
            )
            pool_fn, hid_st = None, None
        else:
            ccfg = mdl.clip_config
            text_fn = lambda b, ids, m: clip_mod.clip_text_features(b, ids, m, ccfg)
            vis_fn = lambda b, p: clip_mod.clip_image_features_from_tokens(
                b, mdl._embed_u8(b, p), ccfg
            )
            pool_fn, hid_st = None, None

        ones = jax.device_put(np.ones((B,), np.float32))
        t_text = time_fn(text_fn, bp, ids_st)
        t_vis = time_fn(vis_fn, bp, [(p,) for p in patch_st])
        t_full = time_fn(
            lambda prm, ids, m, p: engine._forward(prm, ids, m, p, ones, ones),
            engine.params,
            [(a, b, p) for (a, b), p in zip(ids_st, patch_st)],
        )
        out = {
            "batch": B,
            "text_ms_per_batch": round(t_text * 1e3, 2),
            "vision_ms_per_batch": round(t_vis * 1e3, 2),
            "full_ms_per_batch": round(t_full * 1e3, 2),
            "full_samples_per_s": round(B / t_full, 1),
        }
        if pool_fn is not None:
            out["map_head_ms_per_batch"] = round(
                time_fn(pool_fn, bp, [(h,) for h in hid_st]) * 1e3, 2
            )
        return out

    sizes = (
        [int(s) for s in args.sweep.split(",") if s] if args.sweep else [args.batch]
    )
    if args.decompose:
        print(json.dumps({"decomposition": decompose(args.batch),
                          "backend": args.backend,
                          "attention": {"text": args.text_attention,
                                        "vision": args.vision_attention}}))
        return
    results = []
    for B in sizes:
        r = run_b(B)
        results.append(
            {"batch": B, "samples_per_s": round(r["best"], 1),
             "median_samples_per_s": round(r["median"], 1)}
        )
    top = max(results, key=lambda r: r["samples_per_s"])

    baseline = BASELINES.get((args.backend, args.head))
    print(
        json.dumps(
            {
                "metric": f"{args.backend}_{args.head}_eval_samples_per_sec_per_chip",
                "value": top["samples_per_s"],
                "median": top["median_samples_per_s"],
                "unit": "samples/s",
                "batch": top["batch"],
                "bucket": args.bucket or None,
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
