"""u8 wire-format fast path must match the fp32 pixel parity path."""

import numpy as np
import pytest

import jax

from multimodal_content_moderation_tpu.models import CLIPConfig, FusionModel
from multimodal_content_moderation_tpu.models.clip import CLIPTextConfig, CLIPVisionConfig
from multimodal_content_moderation_tpu.models.fast_infer import FastInferenceEngine

MEAN = (0.48145466, 0.4578275, 0.40821073)
STD = (0.26862954, 0.26130258, 0.27577711)


def test_fast_engine_matches_pixel_path():
    cfg = CLIPConfig(
        text=CLIPTextConfig(
            vocab_size=128, hidden_size=32, num_layers=2, num_heads=2,
            intermediate_size=64, max_positions=12, eos_token_id=127,
        ),
        vision=CLIPVisionConfig(
            hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64,
            image_size=32, patch_size=16,
        ),
        projection_dim=32,
    )
    model = FusionModel.create("clip", num_labels=3, fusion_dim=16, clip_config=cfg)
    params = model.init(jax.random.key(0))

    g = np.random.default_rng(0)
    B = 4
    ids = g.integers(1, 126, size=(B, 12)).astype(np.int32)
    ids[:, 6] = 127
    mask = np.ones((B, 12), np.int32)
    imgs_u8 = g.integers(0, 256, size=(B, 32, 32, 3), dtype=np.uint8)
    tpres = np.ones((B,), np.float32)
    ipres = np.ones((B,), np.float32)

    # parity path: host-normalized fp32 NCHW
    x = imgs_u8.astype(np.float32) / 255.0
    x = (x - np.asarray(MEAN)) / np.asarray(STD)
    pixel_values = np.ascontiguousarray(x.transpose(0, 3, 1, 2)).astype(np.float32)
    ref = np.asarray(
        model.apply(
            params,
            {
                "input_ids": ids,
                "attention_mask": mask,
                "pixel_values": pixel_values,
                "text_present": tpres,
                "image_present": ipres,
            },
        )["logits"]
    )

    engine = FastInferenceEngine(model, params, MEAN, STD, use_pallas=False)
    patches = engine.patches_from_hwc(imgs_u8)
    got = np.asarray(engine(ids, mask, patches, tpres, ipres))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_fast_engine_pallas_interpret_matches():
    """Same check with the actual Pallas kernel in interpret mode."""
    import multimodal_content_moderation_tpu.models.fast_infer as fi
    from multimodal_content_moderation_tpu.ops import pallas_image

    cfg = CLIPConfig(
        text=CLIPTextConfig(
            vocab_size=64, hidden_size=16, num_layers=1, num_heads=2,
            intermediate_size=32, max_positions=8, eos_token_id=63,
        ),
        vision=CLIPVisionConfig(
            hidden_size=16, num_layers=1, num_heads=2, intermediate_size=32,
            image_size=16, patch_size=8,
        ),
        projection_dim=16,
    )
    model = FusionModel.create("clip", num_labels=2, fusion_dim=8, clip_config=cfg)
    params = model.init(jax.random.key(1))

    import functools

    interp_embed = functools.partial(pallas_image.patch_embed_u8, interpret=True)

    g = np.random.default_rng(1)
    B = 2
    ids = g.integers(1, 62, size=(B, 8)).astype(np.int32)
    ids[:, 4] = 63
    mask = np.ones((B, 8), np.int32)
    imgs_u8 = g.integers(0, 256, size=(B, 16, 16, 3), dtype=np.uint8)
    ones = np.ones((B,), np.float32)

    ref_engine = FastInferenceEngine(model, params, MEAN, STD, use_pallas=False)
    patches = ref_engine.patches_from_hwc(imgs_u8)
    ref = np.asarray(ref_engine(ids, mask, patches, ones, ones))

    # swap in the interpret-mode Pallas kernel
    orig = fi.patch_embed_u8
    fi.patch_embed_u8 = interp_embed
    try:
        pl_engine = FastInferenceEngine(model, params, MEAN, STD, use_pallas=True)
        got = np.asarray(pl_engine(ids, mask, patches, ones, ones))
    finally:
        fi.patch_embed_u8 = orig
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)
