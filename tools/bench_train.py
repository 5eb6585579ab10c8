#!/usr/bin/env python
"""Training-step throughput benchmark on the real chip.

Measures the full fine-tuning step (forward + backward + two-group AdamW
update) of the flagship CLIP fusion classifier in mixed precision, the
counterpart of the reference's HF-Trainer fine-tune loop. Uses the same
synchronization discipline as bench.py (unique args, scalar-fetch barriers).
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from multimodal_content_moderation_tpu.models import FusionModel
    from multimodal_content_moderation_tpu.parallel.mesh import build_mesh, replicate, shard_batch
    from multimodal_content_moderation_tpu.training.loop import make_train_step
    from multimodal_content_moderation_tpu.training.optim import build_optimizer

    base = FusionModel.create("clip", num_labels=5)
    cfg = base.clip_config
    model = dataclasses.replace(
        base,
        clip_config=dataclasses.replace(
            cfg,
            text=dataclasses.replace(cfg.text, compute_dtype="bfloat16"),
            vision=dataclasses.replace(cfg.vision, compute_dtype="bfloat16"),
        ),
    )
    mesh = build_mesh()
    params = replicate(model.init(jax.random.key(0)), mesh)
    tx = build_optimizer(params, total_steps=1000)
    opt_state = tx.init(params)
    rng = jax.random.key(0)
    train_step = make_train_step(model, tx)

    B = args.batch
    g = np.random.default_rng(0)
    img = model.image_size

    def batch(seed):
        gg = np.random.default_rng(seed)
        ids = gg.integers(1, 49000, size=(B, 77)).astype(np.int32)
        ids[:, 30] = 49407
        return shard_batch(
            {
                "input_ids": ids,
                "attention_mask": np.ones((B, 77), np.int32),
                "pixel_values": gg.normal(size=(B, 3, img, img)).astype(np.float32),
                "text_present": np.ones((B,), np.float32),
                "image_present": np.ones((B,), np.float32),
                "labels": (gg.random((B, 5)) < 0.3).astype(np.float32),
            },
            mesh,
        )

    batches = [batch(i) for i in range(4)]
    params, opt_state, rng, loss = train_step(params, opt_state, rng, batches[0])
    _ = float(loss)  # compile barrier

    # Best of 3 passes: the tunneled chip has multi-second contention windows
    # unrelated to the computation (same discipline as bench.py).
    best_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for k in range(args.steps):
            params, opt_state, rng, loss = train_step(
                params, opt_state, rng, batches[k % len(batches)]
            )
        _ = float(loss)  # scalar fetch = true barrier
        best_dt = min(best_dt, time.perf_counter() - t0)
    dt = best_dt
    sps = args.steps * B / dt

    print(
        json.dumps(
            {
                "metric": "train_step_samples_per_sec_per_chip",
                "value": round(sps, 1),
                "unit": "samples/s",
                "batch": B,
                "ms_per_step": round(dt / args.steps * 1000, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
