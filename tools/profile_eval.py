#!/usr/bin/env python
"""Capture a jax.profiler trace of the production eval path.

Wraps the same staged-batch fast-engine loop bench.py times inside
``utils.profiling.trace`` and writes an XPlane trace viewable in
TensorBoard (Profile plugin) or Perfetto:

    python tools/profile_eval.py --out /tmp/mmcm_trace --batches 8
    tensorboard --logdir /tmp/mmcm_trace   # Profile tab

Host-side phases (staging, dispatch) are annotated so they appear alongside
device ops. On the tunneled axon platform device-side op timing may be
unavailable; the trace still captures host dispatch + transfer timelines.
The reference has no profiling at all (SURVEY.md §5) — this tool plus
utils/profiling.py is the observability kit the TPU build adds.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/mmcm_trace")
    ap.add_argument("--batch", type=int, default=192)
    ap.add_argument("--batches", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from multimodal_content_moderation_tpu.data.images import CLIP_MEAN, CLIP_STD
    from multimodal_content_moderation_tpu.models import FusionModel
    from multimodal_content_moderation_tpu.models.convert import to_dtype
    from multimodal_content_moderation_tpu.models.fast_infer import (
        FastInferenceEngine,
    )
    from multimodal_content_moderation_tpu.utils.profiling import annotate, trace

    model = FusionModel.create("clip", num_labels=5)
    cfg = model.clip_config
    bf = lambda c: dataclasses.replace(
        c, compute_dtype="bfloat16", scores_dtype="bfloat16"
    )
    model = dataclasses.replace(
        model,
        clip_config=dataclasses.replace(cfg, text=bf(cfg.text), vision=bf(cfg.vision)),
    )
    params = to_dtype(model.init(jax.random.key(0)), jnp.bfloat16)
    engine = FastInferenceEngine(model, params, CLIP_MEAN, CLIP_STD)

    B, SEQ, img = args.batch, 77, model.image_size
    g = np.random.default_rng(0)
    mask = jax.device_put(np.ones((B, SEQ), np.int32))
    ones = jax.device_put(np.ones((B,), np.float32))

    with annotate("stage_inputs"):
        patches = [
            jax.device_put(
                engine.patches_from_hwc(
                    g.integers(0, 256, size=(B, img, img, 3), dtype=np.uint8)
                )
            )
            for _ in range(2)
        ]
        ids = []
        for k in range(args.batches):
            a = g.integers(1, 49000, size=(B, SEQ)).astype(np.int32)
            a[:, 30] = 49407
            ids.append(jax.device_put(a))

    # compile outside the trace so the trace shows steady state
    _ = float(engine(ids[0], mask, patches[0], ones, ones)[0, 0])

    with trace(args.out):
        out = None
        with annotate("eval_loop"):
            for i in range(args.batches):
                out = engine(ids[i], mask, patches[i % 2], ones, ones)
        _ = float(out[0, 0])  # value fetch = barrier on axon

    files = []
    for root, _dirs, names in os.walk(args.out):
        files += [os.path.join(root, n) for n in names]
    print(
        json.dumps(
            {
                "trace_dir": args.out,
                "trace_files": len(files),
                "largest_file": max(
                    (os.path.getsize(f) for f in files), default=0
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
