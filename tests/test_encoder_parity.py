"""Logit/feature parity of the JAX encoders vs random-init HF torch models.

The HF models are built offline from config objects (no hub access); the
converter maps their state dicts into our pytrees and outputs must agree to
tight fp32 tolerances. This validates both the architecture re-derivation and
the weight converter — the two hardest correctness risks (SURVEY.md §7).
"""

import numpy as np
import pytest

import jax

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from multimodal_content_moderation_tpu.models import (
    CLIPConfig,
    SigLIPConfig,
    clip_image_features,
    clip_text_features,
    clip_text_pooled,
    clip_vision_pooled,
)
from multimodal_content_moderation_tpu.models.convert import (
    clip_params_from_torch,
    siglip_params_from_torch,
)
from multimodal_content_moderation_tpu.models.siglip import (
    siglip_image_features,
    siglip_text_features,
)

TINY_TEXT = dict(
    hidden_size=64,
    num_hidden_layers=2,
    num_attention_heads=2,
    intermediate_size=128,
    max_position_embeddings=77,
    vocab_size=1000,
    eos_token_id=999,
    bos_token_id=998,
    pad_token_id=0,
)
TINY_VISION = dict(
    hidden_size=64,
    num_hidden_layers=2,
    num_attention_heads=2,
    intermediate_size=128,
    image_size=32,
    patch_size=16,
)


@pytest.fixture(scope="module")
def clip_pair():
    torch.manual_seed(0)
    hf_cfg = transformers.CLIPConfig(
        text_config=dict(TINY_TEXT), vision_config=dict(TINY_VISION), projection_dim=32
    )
    model = transformers.CLIPModel(hf_cfg).eval()
    cfg = CLIPConfig.from_hf(hf_cfg)
    params = clip_params_from_torch(model.state_dict(), cfg)
    return model, cfg, params


@pytest.fixture(scope="module")
def siglip_pair():
    torch.manual_seed(1)
    hf_cfg = transformers.SiglipConfig(
        text_config=dict(
            hidden_size=64,
            num_hidden_layers=2,
            num_attention_heads=2,
            intermediate_size=128,
            max_position_embeddings=16,
            vocab_size=1000,
        ),
        vision_config=dict(TINY_VISION),
    )
    model = transformers.SiglipModel(hf_cfg).eval()
    cfg = SigLIPConfig.from_hf(hf_cfg)
    params = siglip_params_from_torch(model.state_dict(), cfg)
    return model, cfg, params


def _text_inputs(seed, B=3, T=77, vocab=900, eos=999):
    g = np.random.default_rng(seed)
    ids = g.integers(1, vocab, size=(B, T))
    # place EOS at different positions per row, pad after
    mask = np.ones((B, T), dtype=np.int64)
    for b in range(B):
        pos = 5 + 7 * b
        ids[b, pos] = eos
        ids[b, pos + 1 :] = 0
        mask[b, pos + 1 :] = 0
    return ids.astype(np.int64), mask


class TestCLIPParity:
    def test_text_features(self, clip_pair):
        model, cfg, params = clip_pair
        ids, mask = _text_inputs(0)
        with torch.no_grad():
            ref = model.get_text_features(
                input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
            ).numpy()
        got = np.asarray(clip_text_features(params, ids, mask, cfg))
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)

    def test_text_pooler(self, clip_pair):
        model, cfg, params = clip_pair
        ids, mask = _text_inputs(7)
        with torch.no_grad():
            ref = model.text_model(
                input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
            ).pooler_output.numpy()
        got = np.asarray(clip_text_pooled(params, ids, mask, cfg.text))
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)

    def test_image_features(self, clip_pair):
        model, cfg, params = clip_pair
        g = np.random.default_rng(1)
        px = g.normal(size=(2, 3, 32, 32)).astype(np.float32)
        with torch.no_grad():
            ref = model.get_image_features(pixel_values=torch.tensor(px)).numpy()
        got = np.asarray(clip_image_features(params, px, cfg))
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)

    def test_vision_pooler(self, clip_pair):
        model, cfg, params = clip_pair
        g = np.random.default_rng(2)
        px = g.normal(size=(2, 3, 32, 32)).astype(np.float32)
        with torch.no_grad():
            ref = model.vision_model(pixel_values=torch.tensor(px)).pooler_output.numpy()
        got = np.asarray(clip_vision_pooled(params, px, cfg.vision))
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)

    def test_jit_matches_eager(self, clip_pair):
        _, cfg, params = clip_pair
        ids, mask = _text_inputs(3)
        eager = clip_text_features(params, ids, mask, cfg)
        jitted = jax.jit(clip_text_features, static_argnums=(3,))(params, ids, mask, cfg)
        np.testing.assert_allclose(np.asarray(eager), np.asarray(jitted), atol=1e-6)


class TestSigLIPParity:
    def test_text_features(self, siglip_pair):
        model, cfg, params = siglip_pair
        g = np.random.default_rng(3)
        ids = g.integers(0, 1000, size=(3, 16)).astype(np.int64)
        with torch.no_grad():
            ref = model.get_text_features(input_ids=torch.tensor(ids)).numpy()
        got = np.asarray(siglip_text_features(params, ids, None, cfg))
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)

    def test_text_features_with_mask(self, siglip_pair):
        model, cfg, params = siglip_pair
        g = np.random.default_rng(4)
        ids = g.integers(0, 1000, size=(2, 16)).astype(np.int64)
        mask = np.ones((2, 16), dtype=np.int64)
        mask[:, 12:] = 0
        with torch.no_grad():
            ref = model.get_text_features(
                input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
            ).numpy()
        got = np.asarray(siglip_text_features(params, ids, mask, cfg))
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)

    def test_image_features(self, siglip_pair):
        model, cfg, params = siglip_pair
        g = np.random.default_rng(5)
        px = g.normal(size=(2, 3, 32, 32)).astype(np.float32)
        with torch.no_grad():
            ref = model.get_image_features(pixel_values=torch.tensor(px)).numpy()
        got = np.asarray(siglip_image_features(params, px, cfg))
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_bf16_scores_close_to_fp32(clip_pair):
    """scores_dtype='bfloat16' (the fast-eval knob) stays within bf16
    rounding of the fp32 path."""
    import dataclasses

    _, cfg, params = clip_pair
    cfg_fast = dataclasses.replace(
        cfg,
        text=dataclasses.replace(cfg.text, scores_dtype="bfloat16"),
        vision=dataclasses.replace(cfg.vision, scores_dtype="bfloat16"),
    )
    ids, mask = _text_inputs(11)
    a = np.asarray(clip_text_features(params, ids, mask, cfg))
    b = np.asarray(clip_text_features(params, ids, mask, cfg_fast))
    assert np.abs(a - b).max() < 0.05
    g = np.random.default_rng(11)
    px = g.normal(size=(2, 3, 32, 32)).astype(np.float32)
    va = np.asarray(clip_image_features(params, px, cfg))
    vb = np.asarray(clip_image_features(params, px, cfg_fast))
    assert np.abs(va - vb).max() < 0.05
