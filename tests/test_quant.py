"""Opt-in int8 MLP quantization (ops/quant.py).

The reference never quantizes; this is the TPU-native performance tier
exploiting the measured 1.75x int8 win at the K768xN3072 fc1 shape
(docs/PERFORMANCE.md). These tests pin the numerics contract (bounded error
vs the fp32 dense), the surgical selection rule, and the end-to-end engine
path (`--precision int8_mlp`).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_content_moderation_tpu.ops.layers import dense, dense_maybe_int8
from multimodal_content_moderation_tpu.ops.quant import (
    dense_int8,
    quantize_fc1_layers,
    quantize_linear_int8,
)


def test_dense_int8_error_bound():
    g = np.random.default_rng(0)
    x = jnp.asarray(g.normal(size=(32, 64)).astype(np.float32))
    p = {
        "w": jnp.asarray(g.normal(size=(64, 128)).astype(np.float32) * 0.05),
        "b": jnp.asarray(g.normal(size=(128,)).astype(np.float32) * 0.01),
    }
    ref = np.asarray(dense(x, p))
    got = np.asarray(dense_int8(x, quantize_linear_int8(p)))
    # symmetric per-channel weights + per-row activations: relative l2 error
    # is bounded by the two 1/127 rounding steps
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.02, rel
    assert got.dtype == ref.dtype


def test_dense_maybe_int8_dispatch():
    g = np.random.default_rng(1)
    x = jnp.asarray(g.normal(size=(4, 8)).astype(np.float32))
    p = {"w": jnp.asarray(g.normal(size=(8, 8)).astype(np.float32))}
    np.testing.assert_array_equal(
        np.asarray(dense_maybe_int8(x, p)), np.asarray(dense(x, p))
    )
    q = quantize_linear_int8(p)
    np.testing.assert_array_equal(
        np.asarray(dense_maybe_int8(x, q)), np.asarray(dense_int8(x, q))
    )


def test_quantize_fc1_selective_shape_and_map_head_skip():
    g = np.random.default_rng(2)
    mk = lambda k, n: {"w": jnp.asarray(g.normal(size=(k, n)).astype(np.float32))}
    params = {
        "vision_model": {
            "layers": [
                {"fc1": mk(768, 3072), "fc2": mk(3072, 768)},
                {"fc1": mk(768, 3072), "fc2": mk(3072, 768)},
            ],
            "map_head": {"fc1": mk(768, 3072), "fc2": mk(3072, 768)},
        },
        "text_model": {"layers": [{"fc1": mk(512, 2048), "fc2": mk(2048, 512)}]},
    }
    q, n = quantize_fc1_layers(params)
    # only the winning (768, 3072) trunk fc1s; never the MAP head, never the
    # (512, 2048) text shape, never fc2
    assert n == 2
    assert "w_i8" in q["vision_model"]["layers"][0]["fc1"]
    assert "w_i8" in q["vision_model"]["layers"][1]["fc1"]
    assert "w" in q["vision_model"]["map_head"]["fc1"]
    assert "w" in q["text_model"]["layers"][0]["fc1"]
    assert "w" in q["vision_model"]["layers"][0]["fc2"]
    # original pytree untouched
    assert "w" in params["vision_model"]["layers"][0]["fc1"]

    q_all, n_all = quantize_fc1_layers(params, shape=None)
    assert n_all == 3  # every trunk fc1 (map_head still skipped)
    assert "w_i8" in q_all["text_model"]["layers"][0]["fc1"]


def _tiny_siglip_fusion(seed=3):
    from multimodal_content_moderation_tpu.models import FusionModel
    from multimodal_content_moderation_tpu.models.siglip import (
        SigLIPConfig,
        SigLIPTextConfig,
        SigLIPVisionConfig,
    )

    cfg = SigLIPConfig(
        text=SigLIPTextConfig(
            vocab_size=100, hidden_size=32, num_layers=2, num_heads=2,
            intermediate_size=64, max_positions=16, projection_size=32,
        ),
        vision=SigLIPVisionConfig(
            hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64,
            image_size=32, patch_size=16,
        ),
    )
    model = FusionModel.create("siglip", num_labels=3, fusion_dim=16, siglip_config=cfg)
    return model, model.init(jax.random.key(seed))


def test_siglip_forward_with_int8_fc1_close_to_fp32():
    """End-to-end: a quantized SigLIP fusion forward (trunk fc1s int8) stays
    probability-close to the fp32 forward — the quality contract the opt-in
    tier is sold under."""
    model, params = _tiny_siglip_fusion()
    qparams, n = quantize_fc1_layers(params, shape=None)
    assert n == 4  # 2 text + 2 vision trunk layers

    g = np.random.default_rng(4)
    B = 3
    ids = g.integers(1, 99, size=(B, 16)).astype(np.int32)
    batch = {
        "input_ids": ids,
        "attention_mask": np.ones((B, 16), np.int32),
        "pixel_values": g.normal(size=(B, 3, 32, 32)).astype(np.float32),
        "text_present": np.ones((B,), np.float32),
        "image_present": np.ones((B,), np.float32),
    }
    ref = np.asarray(model.apply(params, batch)["logits"])
    got = np.asarray(model.apply(qparams, batch)["logits"])
    p_ref = 1 / (1 + np.exp(-ref))
    p_got = 1 / (1 + np.exp(-got))
    assert np.max(np.abs(p_got - p_ref)) < 0.05, np.max(np.abs(p_got - p_ref))


def test_generic_text_tower_int8_close_to_fp32():
    """The BERT-style post-LN block (generic backend) honors quantized fc1
    leaves too — it calls dense_maybe_int8 directly, not transformer_block."""
    from multimodal_content_moderation_tpu.models.generic import (
        GenericDualConfig,
        generic_init,
        generic_text_pooled,
    )

    cfg = GenericDualConfig.from_dict(
        {
            "text_config": dict(
                model_type="bert", vocab_size=120, hidden_size=32,
                num_hidden_layers=2, num_attention_heads=2,
                intermediate_size=64, max_position_embeddings=32,
            ),
            "vision_config": dict(
                model_type="vit", hidden_size=32, num_hidden_layers=1,
                num_attention_heads=2, intermediate_size=64, image_size=32,
                patch_size=16,
            ),
        }
    )
    params = generic_init(jax.random.key(5), cfg)
    qparams, n = quantize_fc1_layers(params, shape=None)
    assert n == 3  # 2 text + 1 vision trunk fc1
    g = np.random.default_rng(6)
    ids = jnp.asarray(g.integers(1, 119, size=(3, 10)).astype(np.int32))
    mask = jnp.asarray(np.ones((3, 10), np.int32))
    ref = np.asarray(generic_text_pooled(params, ids, mask, cfg.text))
    got = np.asarray(generic_text_pooled(qparams, ids, mask, cfg.text))
    assert np.max(np.abs(got - ref)) < 0.05, np.max(np.abs(got - ref))


def test_inference_api_int8_precision(trained_run):
    """`--precision int8_mlp` through the inference API: runs end-to-end and
    stays probability-close to bf16_fast on the same checkpoint."""
    from multimodal_content_moderation_tpu.cli.inference import (
        MultiModalClassifier,
    )

    _, result = trained_run
    ckpt = result["result"]["best_checkpoint"]
    base = MultiModalClassifier(ckpt, batch_size=4, precision="bf16_fast")
    quant = MultiModalClassifier(ckpt, batch_size=4, precision="int8_mlp")
    r_base = base.predict("hate hate hate", None)
    r_quant = quant.predict("hate hate hate", None)
    for name, pred in r_base["predictions"].items():
        assert r_quant["predictions"][name]["probability"] == pytest.approx(
            pred["probability"], abs=0.05
        )
