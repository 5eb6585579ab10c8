#!/usr/bin/env python
"""Training-step throughput benchmark on the real chip.

Measures the full fine-tuning step (forward + backward + two-group AdamW
update) of the flagship CLIP fusion classifier in mixed precision, the
counterpart of the reference's HF-Trainer fine-tune loop.

``--wire u8`` (default) uses the uint8 wire format: raw patch rows on the
host->device path and the Pallas fused normalize+patchify+embed kernel with
its custom VJP (ops/pallas_image.py) — the same 4x wire-byte and 540x
uint8-GEMM-cliff win the eval path gets, now in training. ``--wire f32``
reproduces the round-1 fp32-pixel measurement. ``--sweep`` runs a batch-size
sweep and reports the best.

Uses the same synchronization discipline as bench.py (unique args,
scalar-fetch barriers, best-of-3 passes around tunnel stalls).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build(wire: str, scores_dtype: str, attention: str = "xla", backend: str = "clip"):
    import jax

    from multimodal_content_moderation_tpu.data.images import (
        CLIP_MEAN, CLIP_STD, SIGLIP_MEAN, SIGLIP_STD,
    )
    from multimodal_content_moderation_tpu.models import FusionModel

    base = FusionModel.create(backend, num_labels=5)
    field = "clip_config" if backend == "clip" else "siglip_config"
    cfg = getattr(base, field)
    model = dataclasses.replace(
        base,
        **{field: dataclasses.replace(
            cfg,
            text=dataclasses.replace(
                cfg.text, compute_dtype="bfloat16", scores_dtype=scores_dtype,
                attention_impl=attention,
            ),
            vision=dataclasses.replace(
                cfg.vision, compute_dtype="bfloat16", scores_dtype=scores_dtype,
                attention_impl=attention,
            ),
        )},
    )
    if wire == "u8":
        mean, std = (
            (CLIP_MEAN, CLIP_STD) if backend == "clip" else (SIGLIP_MEAN, SIGLIP_STD)
        )
        model = dataclasses.replace(
            model,
            image_mean=mean,
            image_std=std,
            embed_impl="pallas" if jax.default_backend() not in ("cpu",) else "reference",
        )
    return model


def run_once(
    model, wire: str, B: int, steps: int, accumulator_dtype=None, text_len=None
) -> float:
    """Returns samples/s for one (wire, batch) config."""
    import jax

    from multimodal_content_moderation_tpu.ops.pallas_image import extract_patches_u8
    from multimodal_content_moderation_tpu.parallel.mesh import (
        build_mesh,
        replicate,
        shard_batch,
    )
    from multimodal_content_moderation_tpu.training.loop import make_train_step
    from multimodal_content_moderation_tpu.training.optim import build_optimizer

    mesh = build_mesh()
    params = replicate(model.init(jax.random.key(0)), mesh)
    tx = build_optimizer(
        params, total_steps=1000, accumulator_dtype=accumulator_dtype
    )
    opt_state = tx.init(params)
    rng = jax.random.key(0)
    train_step = make_train_step(model, tx)
    img = model.image_size
    cfg = model.clip_config if model.backend == "clip" else model.siglip_config
    patch = cfg.vision.patch_size
    seq = int(text_len) if text_len else min(cfg.text.max_positions, 77)
    vocab = cfg.text.vocab_size
    eos = getattr(cfg.text, "eos_token_id", vocab - 1)

    def batch(seed):
        gg = np.random.default_rng(seed)
        ids = gg.integers(1, vocab - 2, size=(B, seq)).astype(np.int32)
        ids[:, seq // 2] = eos
        b = {
            "input_ids": ids,
            "attention_mask": np.ones((B, seq), np.int32),
            "text_present": np.ones((B,), np.float32),
            "image_present": np.ones((B,), np.float32),
            "labels": (gg.random((B, 5)) < 0.3).astype(np.float32),
        }
        if wire == "u8":
            crops = gg.integers(0, 256, size=(B, img, img, 3), dtype=np.uint8)
            b["patches_u8"] = extract_patches_u8(crops, patch)
        else:
            b["pixel_values"] = gg.normal(size=(B, 3, img, img)).astype(np.float32)
        return shard_batch(b, mesh)

    batches = [batch(i) for i in range(4)]
    params, opt_state, rng, loss = train_step(params, opt_state, rng, batches[0])
    _ = float(loss)  # compile barrier

    best_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for k in range(steps):
            params, opt_state, rng, loss = train_step(
                params, opt_state, rng, batches[k % len(batches)]
            )
        _ = float(loss)  # scalar fetch = true barrier
        best_dt = min(best_dt, time.perf_counter() - t0)
    return steps * B / best_dt, best_dt / steps


def decompose(model, wire: str, B: int, steps: int, text_len=None):
    """Forward / forward+backward / full-step timing split (the train-step
    decomposition in docs/PERFORMANCE.md). Runs each stage as its own jit
    with the same batch shapes and scalar-fetch barriers."""
    import functools

    import jax
    import jax.numpy as jnp

    from multimodal_content_moderation_tpu.ops.pallas_image import extract_patches_u8
    from multimodal_content_moderation_tpu.parallel.mesh import build_mesh, replicate, shard_batch
    from multimodal_content_moderation_tpu.training.optim import build_optimizer

    mesh = build_mesh()
    params = replicate(model.init(jax.random.key(0)), mesh)
    img = model.image_size
    cfg = model.clip_config if model.backend == "clip" else model.siglip_config
    patch = cfg.vision.patch_size
    seq = int(text_len) if text_len else min(cfg.text.max_positions, 77)
    vocab = cfg.text.vocab_size
    eos = getattr(cfg.text, "eos_token_id", vocab - 1)

    def batch(seed):
        gg = np.random.default_rng(seed)
        ids = gg.integers(1, vocab - 2, size=(B, seq)).astype(np.int32)
        ids[:, seq // 2] = eos
        b = {
            "input_ids": ids,
            "attention_mask": np.ones((B, seq), np.int32),
            "text_present": np.ones((B,), np.float32),
            "image_present": np.ones((B,), np.float32),
            "labels": (gg.random((B, 5)) < 0.3).astype(np.float32),
        }
        if wire == "u8":
            crops = gg.integers(0, 256, size=(B, img, img, 3), dtype=np.uint8)
            b["patches_u8"] = extract_patches_u8(crops, patch)
        else:
            b["pixel_values"] = gg.normal(size=(B, 3, img, img)).astype(np.float32)
        return shard_batch(b, mesh)

    batches = [batch(i) for i in range(4)]

    def loss_fn(p, b):
        return model.apply(p, b)["loss"]

    fwd = jax.jit(loss_fn)
    grad = jax.jit(jax.value_and_grad(loss_fn))

    def time_stage(fn, consume):
        _ = consume(fn(params, batches[0]))  # compile
        best = float("inf")
        for _pass in range(3):
            t0 = time.perf_counter()
            out = None
            for k in range(steps):
                out = fn(params, batches[k % len(batches)])
            _ = consume(out)
            best = min(best, time.perf_counter() - t0)
        return best / steps

    fwd_s = time_stage(fwd, lambda l: float(l))
    bwd_s = time_stage(grad, lambda lg: float(lg[0]))
    sps, full_s = run_once(model, wire, B, steps)
    return {
        "batch": B,
        "fwd_ms": round(fwd_s * 1000, 1),
        "fwd_bwd_ms": round(bwd_s * 1000, 1),
        "full_step_ms": round(full_s * 1000, 1),
        "bwd_over_fwd": round((bwd_s - fwd_s) / fwd_s, 2),
        "optimizer_ms": round((full_s - bwd_s) * 1000, 1),
        "samples_per_s": round(sps, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", choices=["clip", "siglip"], default="clip")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--wire", choices=["u8", "f32"], default="u8")
    ap.add_argument(
        "--scores_dtype", choices=["float32", "bfloat16"], default="float32"
    )
    ap.add_argument(
        "--sweep", type=str, default="",
        help="comma-separated batch sizes to sweep (e.g. 64,128,192,256)",
    )
    ap.add_argument(
        "--decompose", action="store_true",
        help="time fwd / fwd+bwd / full step separately (one batch size)",
    )
    ap.add_argument(
        "--accumulator_dtype", choices=["", "bfloat16"], default="",
        help="bf16 Adam m/v state (training/optim.scale_by_adam_compact): "
        "halves optimizer HBM traffic; '' keeps fp32",
    )
    ap.add_argument(
        "--text_len", type=int, default=0,
        help="static text length for the synthetic batch (0 = padded 77). "
        "Models training.text_fit: fit-to-data static truncation, exact "
        "for CLIP (causal + EOS pooling -> zero grads past EOS)",
    )
    ap.add_argument(
        "--attention", choices=["xla", "pallas"], default="xla",
        help="attention core (pallas = [B,T,D]-layout kernel with custom "
        "VJP in fwd AND bwd — training.attention: pallas in configs)",
    )
    args = ap.parse_args()

    model = build(args.wire, args.scores_dtype, args.attention, args.backend)
    if args.decompose:
        out = decompose(model, args.wire, args.batch, args.steps, args.text_len)
        out.update({"metric": "train_step_decomposition", "wire": args.wire,
                    "backend": args.backend, "attention": args.attention,
                    "scores_dtype": args.scores_dtype})
        print(json.dumps(out))
        return
    sizes = (
        [int(s) for s in args.sweep.split(",") if s] if args.sweep else [args.batch]
    )
    results = []
    for B in sizes:
        sps, spstep = run_once(
            model, args.wire, B, args.steps, args.accumulator_dtype or None,
            text_len=args.text_len,
        )
        results.append({"batch": B, "samples_per_s": round(sps, 1),
                        "ms_per_step": round(spstep * 1000, 1)})
    best = max(results, key=lambda r: r["samples_per_s"])
    print(
        json.dumps(
            {
                "metric": "train_step_samples_per_sec_per_chip",
                "value": best["samples_per_s"],
                "unit": "samples/s",
                "batch": best["batch"],
                "ms_per_step": best["ms_per_step"],
                "wire": args.wire,
                "scores_dtype": args.scores_dtype,
                "attention": args.attention,
                "accumulator_dtype": args.accumulator_dtype or "float32",
                "backend": args.backend,
                "sweep": results if len(results) > 1 else None,
            }
        )
    )


if __name__ == "__main__":
    main()
