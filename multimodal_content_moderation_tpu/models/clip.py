"""CLIP dual encoder (text transformer + ViT), pure-functional JAX.

Semantics match HF ``transformers.CLIPModel`` so that converted
``openai/clip-vit-base-patch32`` weights produce identical features (the
reference consumes them via ``backbone.get_text_features`` /
``get_image_features``, src/models/fusion.py:181-185, and via
``CLIPTextModel``/``CLIPVisionModel`` pooler outputs, src/models/multitask.py:
130-154).

TPU-first choices:
- patch embedding = patchify + one GEMM (no conv), see ops/layers.patchify
- all blocks scanned shapes are static; the whole tower jits into one XLA
  computation with fp32 accumulation on bf16 inputs
- attention uses the shared ``ops.layers.mha`` (swappable for the Pallas
  flash kernel in ops/pallas_attention for long-sequence configs)
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from multimodal_content_moderation_tpu.ops.layers import (
    dense,
    layer_norm,
    patchify,
    transformer_block,
)

NEG_INF = -3.4028235e38  # fp32 min, matches torch.finfo(float32).min masks


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 512
    num_layers: int = 12
    num_heads: int = 8
    intermediate_size: int = 2048
    max_positions: int = 77
    eos_token_id: int = 49407
    hidden_act: str = "quick_gelu"
    layer_norm_eps: float = 1e-5
    remat: bool = False
    compute_dtype: str = "float32"  # "float32" | "bfloat16" mixed precision
    attention_impl: str = "xla"  # "xla" | "pallas" (fused kernel path)
    scores_dtype: str = "float32"  # "bfloat16" = +17% eval, opt-in


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    image_size: int = 224
    patch_size: int = 32
    num_channels: int = 3
    hidden_act: str = "quick_gelu"
    layer_norm_eps: float = 1e-5
    remat: bool = False
    compute_dtype: str = "float32"
    attention_impl: str = "xla"
    scores_dtype: str = "float32"


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    text: CLIPTextConfig = CLIPTextConfig()
    vision: CLIPVisionConfig = CLIPVisionConfig()
    projection_dim: int = 512

    @staticmethod
    def base_patch32() -> "CLIPConfig":
        """openai/clip-vit-base-patch32."""
        return CLIPConfig()

    @staticmethod
    def from_hf(cfg) -> "CLIPConfig":
        """Build from a ``transformers.CLIPConfig``."""
        t, v = cfg.text_config, cfg.vision_config
        return CLIPConfig(
            text=CLIPTextConfig(
                vocab_size=t.vocab_size,
                hidden_size=t.hidden_size,
                num_layers=t.num_hidden_layers,
                num_heads=t.num_attention_heads,
                intermediate_size=t.intermediate_size,
                max_positions=t.max_position_embeddings,
                eos_token_id=t.eos_token_id,
                hidden_act=t.hidden_act,
                layer_norm_eps=t.layer_norm_eps,
            ),
            vision=CLIPVisionConfig(
                hidden_size=v.hidden_size,
                num_layers=v.num_hidden_layers,
                num_heads=v.num_attention_heads,
                intermediate_size=v.intermediate_size,
                image_size=v.image_size,
                patch_size=v.patch_size,
                num_channels=v.num_channels,
                hidden_act=v.hidden_act,
                layer_norm_eps=v.layer_norm_eps,
            ),
            projection_dim=cfg.projection_dim,
        )


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _dense_init(rng, d_in, d_out, dtype):
    k1, _ = jax.random.split(rng)
    w = jax.random.normal(k1, (d_in, d_out), dtype) * (d_in ** -0.5)
    return {"w": w, "b": jnp.zeros((d_out,), dtype)}


def _ln_init(d, dtype):
    return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}


def _block_init(rng, d, d_ff, dtype):
    ks = jax.random.split(rng, 6)
    return {
        "ln1": _ln_init(d, dtype),
        "attn": {
            "q": _dense_init(ks[0], d, d, dtype),
            "k": _dense_init(ks[1], d, d, dtype),
            "v": _dense_init(ks[2], d, d, dtype),
            "o": _dense_init(ks[3], d, d, dtype),
        },
        "ln2": _ln_init(d, dtype),
        "fc1": _dense_init(ks[4], d, d_ff, dtype),
        "fc2": _dense_init(ks[5], d_ff, d, dtype),
    }


def clip_init(rng: jax.Array, cfg: CLIPConfig, dtype=jnp.float32) -> dict:
    """Random-init a full CLIP parameter pytree (for tests / from-scratch)."""
    kt, kv, kp = jax.random.split(rng, 3)
    t, v = cfg.text, cfg.vision
    n_patches = (v.image_size // v.patch_size) ** 2

    t_keys = jax.random.split(kt, t.num_layers + 2)
    text = {
        "token_embedding": jax.random.normal(
            t_keys[0], (t.vocab_size, t.hidden_size), dtype
        ) * 0.02,
        "position_embedding": jax.random.normal(
            t_keys[1], (t.max_positions, t.hidden_size), dtype
        ) * 0.01,
        "layers": [
            _block_init(t_keys[2 + i], t.hidden_size, t.intermediate_size, dtype)
            for i in range(t.num_layers)
        ],
        "final_ln": _ln_init(t.hidden_size, dtype),
    }

    v_keys = jax.random.split(kv, v.num_layers + 3)
    vision = {
        "class_embedding": jax.random.normal(v_keys[0], (v.hidden_size,), dtype) * 0.02,
        "patch_embedding": {
            "w": jax.random.normal(
                v_keys[1],
                (v.num_channels * v.patch_size**2, v.hidden_size),
                dtype,
            )
            * 0.02
        },
        "position_embedding": jax.random.normal(
            v_keys[2], (n_patches + 1, v.hidden_size), dtype
        ) * 0.01,
        "pre_ln": _ln_init(v.hidden_size, dtype),
        "layers": [
            _block_init(v_keys[3 + i], v.hidden_size, v.intermediate_size, dtype)
            for i in range(v.num_layers)
        ],
        "post_ln": _ln_init(v.hidden_size, dtype),
    }

    kp1, kp2 = jax.random.split(kp)
    return {
        "text_model": text,
        "vision_model": vision,
        # contrastive temperature: unused by the classifier heads but kept so
        # converted checkpoints round-trip bit-complete (HF init value)
        "logit_scale": jnp.asarray(2.6592, dtype),
        "text_projection": {
            "w": jax.random.normal(kp1, (t.hidden_size, cfg.projection_dim), dtype)
            * (t.hidden_size ** -0.5)
        },
        "visual_projection": {
            "w": jax.random.normal(kp2, (v.hidden_size, cfg.projection_dim), dtype)
            * (v.hidden_size ** -0.5)
        },
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _text_masks(input_ids: jnp.ndarray, attention_mask: Optional[jnp.ndarray]):
    """Additive [B, 1, T, T] mask: causal + padding (HF CLIP convention)."""
    B, T = input_ids.shape
    causal = jnp.triu(jnp.full((T, T), NEG_INF, jnp.float32), k=1)
    mask = causal[None, None, :, :]
    if attention_mask is not None:
        pad = (1.0 - attention_mask.astype(jnp.float32)) * NEG_INF
        mask = mask + pad[:, None, None, :]
    return mask


def clip_text_hidden(
    params: dict,
    input_ids: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray],
    cfg: CLIPTextConfig,
) -> jnp.ndarray:
    """Final-LN'd hidden states [B, T, D] of the CLIP text tower."""
    p = params["text_model"]
    T = input_ids.shape[1]
    x = p["token_embedding"][input_ids] + p["position_embedding"][:T]
    x = x.astype(cfg.compute_dtype)
    if cfg.attention_impl == "pallas":
        # structured masks: causal + key-padding applied in-kernel, so no
        # dense [T, T] tensor is built (matters for long-context configs)
        mask, causal = None, True
        key_mask = (
            None
            if attention_mask is None
            else (1.0 - attention_mask.astype(jnp.float32)) * NEG_INF
        )
    else:
        mask, causal, key_mask = _text_masks(input_ids, attention_mask), False, None
    for layer in p["layers"]:
        x = transformer_block(
            x, layer, cfg.num_heads, cfg.hidden_act, mask, cfg.layer_norm_eps,
            remat=cfg.remat,
            attention_impl=cfg.attention_impl,
            scores_dtype=cfg.scores_dtype,
            causal=causal,
            key_mask=key_mask,
        )
    return layer_norm(x, p["final_ln"], cfg.layer_norm_eps)


def clip_text_pooled(
    params: dict,
    input_ids: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray],
    cfg: CLIPTextConfig,
) -> jnp.ndarray:
    """Pooled text embedding: hidden state at the first EOS position
    (= HF ``CLIPTextModel.pooler_output``)."""
    hidden = clip_text_hidden(params, input_ids, attention_mask, cfg)
    eos_pos = jnp.argmax((input_ids == cfg.eos_token_id).astype(jnp.int32), axis=-1)
    return jnp.take_along_axis(hidden, eos_pos[:, None, None], axis=1)[:, 0]


def clip_text_features(
    params: dict,
    input_ids: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray],
    cfg: CLIPConfig,
) -> jnp.ndarray:
    """= HF ``CLIPModel.get_text_features`` (pooled -> text_projection)."""
    pooled = clip_text_pooled(params, input_ids, attention_mask, cfg.text)
    return dense(pooled, params["text_projection"])


def clip_vision_encoder(
    params: dict, tokens: jnp.ndarray, cfg: CLIPVisionConfig
) -> jnp.ndarray:
    """ViT trunk over already-embedded patch tokens [B, N, D] -> [B, 1+N, D]
    (CLS prepend + pos-embed + pre-LN + blocks). Shared by the fp32 pixel
    path and the uint8 wire-format fast path (ops/pallas_image)."""
    p = params["vision_model"]
    x = tokens
    B = x.shape[0]
    cls = jnp.broadcast_to(
        p["class_embedding"].astype(x.dtype)[None, None, :],
        (B, 1, cfg.hidden_size),
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + p["position_embedding"].astype(x.dtype)[None]
    x = layer_norm(x, p["pre_ln"], cfg.layer_norm_eps)
    for layer in p["layers"]:
        x = transformer_block(
            x, layer, cfg.num_heads, cfg.hidden_act, None, cfg.layer_norm_eps,
            remat=cfg.remat,
            attention_impl=cfg.attention_impl,
            scores_dtype=cfg.scores_dtype,
        )
    return x


def clip_vision_pooled_from_tokens(
    params: dict, tokens: jnp.ndarray, cfg: CLIPVisionConfig
) -> jnp.ndarray:
    """Pooled image embedding from already-embedded patch tokens (the u8
    wire-format path: ops/pallas_image embeds, this pools)."""
    x = clip_vision_encoder(params, tokens, cfg)
    return layer_norm(x[:, 0], params["vision_model"]["post_ln"], cfg.layer_norm_eps)


def clip_image_features_from_tokens(
    params: dict, tokens: jnp.ndarray, cfg: CLIPConfig
) -> jnp.ndarray:
    """``get_image_features`` from already-embedded patch tokens."""
    pooled = clip_vision_pooled_from_tokens(params, tokens, cfg.vision)
    return dense(pooled, params["visual_projection"])


def clip_vision_hidden(
    params: dict, pixel_values: jnp.ndarray, cfg: CLIPVisionConfig
) -> jnp.ndarray:
    """Hidden states [B, 1+N, D] of the ViT (before post-LN)."""
    patches = patchify(pixel_values.astype(cfg.compute_dtype), cfg.patch_size)
    tokens = dense(patches, params["vision_model"]["patch_embedding"])
    return clip_vision_encoder(params, tokens, cfg)


def clip_vision_pooled(
    params: dict, pixel_values: jnp.ndarray, cfg: CLIPVisionConfig
) -> jnp.ndarray:
    """Pooled image embedding: post-LN of the CLS token
    (= HF ``CLIPVisionModel.pooler_output``)."""
    x = clip_vision_hidden(params, pixel_values, cfg)
    return layer_norm(x[:, 0], params["vision_model"]["post_ln"], cfg.layer_norm_eps)


def clip_image_features(
    params: dict, pixel_values: jnp.ndarray, cfg: CLIPConfig
) -> jnp.ndarray:
    """= HF ``CLIPModel.get_image_features`` (pooled -> visual_projection)."""
    pooled = clip_vision_pooled(params, pixel_values, cfg.vision)
    return dense(pooled, params["visual_projection"])
