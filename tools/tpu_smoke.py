#!/usr/bin/env python
"""TPU hardware smoke test: exercises every device-side component on the
real chip in ~1 minute. Run after environment changes to localize breakage
before touching the benchmarks.

Checks: device visibility, GEMM, the Pallas fused patch-embed kernel, the
Pallas fused attention kernels, a full fast-infer forward, and a train step.
Prints one PASS/FAIL line per stage (scalar-fetch barriers throughout).
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def stage(name):
    def deco(fn):
        def run():
            t0 = time.perf_counter()
            try:
                fn()
                print(f"PASS {name} ({time.perf_counter()-t0:.1f}s)")
                return True
            except Exception:
                print(f"FAIL {name}")
                traceback.print_exc(limit=3)
                return False

        return run

    return deco


def main():
    import jax
    import jax.numpy as jnp

    results = []

    @stage("devices")
    def s0():
        devs = jax.devices()
        assert devs, "no devices"
        print(f"  devices: {devs}")

    @stage("gemm")
    def s1():
        a = jax.random.normal(jax.random.key(0), (1024, 1024), jnp.bfloat16)
        o = jnp.dot(a, a, preferred_element_type=jnp.float32)
        assert np.isfinite(float(o[0, 0]))

    @stage("pallas_patch_embed")
    def s2():
        from multimodal_content_moderation_tpu.ops.pallas_image import (
            patch_embed_reference,
            patch_embed_u8,
        )

        g = np.random.default_rng(0)
        patches = g.integers(0, 256, size=(8, 49, 3072), dtype=np.uint8)
        wf = (g.normal(size=(3072, 768)) * 0.02).astype(np.float32)
        bf = np.zeros((768,), np.float32)
        got = np.asarray(patch_embed_u8(patches, wf, bf, out_dtype=jnp.float32))
        ref = np.asarray(patch_embed_reference(patches, wf, bf, out_dtype=jnp.float32))
        np.testing.assert_allclose(got, ref, rtol=1e-2, atol=1e-2)

    @stage("pallas_attention")
    def s3():
        from multimodal_content_moderation_tpu.ops.pallas_attention import fused_mha

        g = np.random.default_rng(1)
        q = g.normal(size=(2, 4, 77, 64)).astype(np.float32)
        o = np.asarray(fused_mha(q, q, q, None))
        assert np.all(np.isfinite(o))

    @stage("fast_infer_forward")
    def s4():
        import dataclasses

        from multimodal_content_moderation_tpu.data.images import CLIP_MEAN, CLIP_STD
        from multimodal_content_moderation_tpu.models import FusionModel
        from multimodal_content_moderation_tpu.models.convert import to_dtype
        from multimodal_content_moderation_tpu.models.fast_infer import (
            FastInferenceEngine,
        )

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
        import jax.numpy as jnp

        params = to_dtype(model.init(jax.random.key(0)), jnp.bfloat16)
        engine = FastInferenceEngine(model, params, CLIP_MEAN, CLIP_STD)
        g = np.random.default_rng(2)
        B = 16
        ids = g.integers(1, 49000, size=(B, 77)).astype(np.int32)
        ids[:, 30] = 49407
        patches = engine.patches_from_hwc(
            g.integers(0, 256, size=(B, 224, 224, 3), dtype=np.uint8)
        )
        ones = np.ones((B,), np.float32)
        out = engine(ids, np.ones((B, 77), np.int32), patches, ones, ones)
        assert np.isfinite(float(out[0, 0]))

    @stage("train_step")
    def s5():
        from multimodal_content_moderation_tpu.models import CLIPConfig, FusionModel
        from multimodal_content_moderation_tpu.models.clip import (
            CLIPTextConfig,
            CLIPVisionConfig,
        )
        from multimodal_content_moderation_tpu.training.loop import make_train_step
        from multimodal_content_moderation_tpu.training.optim import build_optimizer

        cfg = CLIPConfig(
            text=CLIPTextConfig(
                vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
                intermediate_size=128, max_positions=16, eos_token_id=511,
            ),
            vision=CLIPVisionConfig(
                hidden_size=64, num_layers=2, num_heads=4, intermediate_size=128,
                image_size=32, patch_size=16,
            ),
            projection_dim=64,
        )
        model = FusionModel.create("clip", num_labels=5, fusion_dim=32, clip_config=cfg)
        params = model.init(jax.random.key(0))
        tx = build_optimizer(params, total_steps=10)
        opt = tx.init(params)
        step = make_train_step(model, tx)
        g = np.random.default_rng(3)
        B = 8
        ids = g.integers(1, 510, size=(B, 16)).astype(np.int32)
        batch = {
            "input_ids": ids,
            "attention_mask": np.ones((B, 16), np.int32),
            "pixel_values": g.normal(size=(B, 3, 32, 32)).astype(np.float32),
            "text_present": np.ones((B,), np.float32),
            "image_present": np.ones((B,), np.float32),
            "labels": (g.random((B, 5)) < 0.3).astype(np.float32),
        }
        _, _, _, loss = step(params, opt, jax.random.key(1), batch)
        assert np.isfinite(float(loss))

    for s in (s0, s1, s2, s3, s4, s5):
        results.append(s())
    ok = all(results)
    print("SMOKE", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
