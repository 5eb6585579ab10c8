"""SigLIP / SigLIP2(fixed-resolution) dual encoder, pure-functional JAX.

Semantics match HF ``transformers.SiglipModel`` (which is also the
architecture of the fixed-resolution ``google/siglip2-base-patch16-224``
checkpoint the reference uses via ``AutoModel``, src/models/fusion.py:111 and
multitask.py:74). Key differences from CLIP, all reproduced here:

- vision tower has NO class token; patch conv has a bias
- pooling is a MAP head (learned probe cross-attending over patch tokens)
- text pooling takes the LAST position's hidden state, then a linear head
- activation is tanh-approximate GELU; LayerNorm eps is 1e-6
- text attention is bidirectional (no causal mask)
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from multimodal_content_moderation_tpu.models.clip import NEG_INF, _block_init, _dense_init, _ln_init
from multimodal_content_moderation_tpu.ops.layers import (
    dense,
    layer_norm,
    mha,
    patchify,
    transformer_block,
)


@dataclasses.dataclass(frozen=True)
class SigLIPTextConfig:
    vocab_size: int = 256000
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_positions: int = 64
    projection_size: int = 768
    hidden_act: str = "gelu_pytorch_tanh"
    layer_norm_eps: float = 1e-6
    remat: bool = False
    compute_dtype: str = "float32"
    attention_impl: str = "xla"
    scores_dtype: str = "float32"


@dataclasses.dataclass(frozen=True)
class SigLIPVisionConfig:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    image_size: int = 224
    patch_size: int = 16
    num_channels: int = 3
    hidden_act: str = "gelu_pytorch_tanh"
    layer_norm_eps: float = 1e-6
    remat: bool = False
    compute_dtype: str = "float32"
    attention_impl: str = "xla"
    scores_dtype: str = "float32"


@dataclasses.dataclass(frozen=True)
class SigLIPConfig:
    text: SigLIPTextConfig = SigLIPTextConfig()
    vision: SigLIPVisionConfig = SigLIPVisionConfig()

    @staticmethod
    def base_patch16_224() -> "SigLIPConfig":
        """google/siglip2-base-patch16-224 (fixed-resolution)."""
        return SigLIPConfig()

    @staticmethod
    def from_hf(cfg) -> "SigLIPConfig":
        """Build from a ``transformers.SiglipConfig``."""
        t, v = cfg.text_config, cfg.vision_config
        return SigLIPConfig(
            text=SigLIPTextConfig(
                vocab_size=t.vocab_size,
                hidden_size=t.hidden_size,
                num_layers=t.num_hidden_layers,
                num_heads=t.num_attention_heads,
                intermediate_size=t.intermediate_size,
                max_positions=t.max_position_embeddings,
                projection_size=getattr(t, "projection_size", t.hidden_size),
                hidden_act=t.hidden_act,
                layer_norm_eps=t.layer_norm_eps,
            ),
            vision=SigLIPVisionConfig(
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
        )


def siglip_init(rng: jax.Array, cfg: SigLIPConfig, dtype=jnp.float32) -> dict:
    """Random-init a full SigLIP parameter pytree."""
    kt, kv = jax.random.split(rng)
    t, v = cfg.text, cfg.vision
    n_patches = (v.image_size // v.patch_size) ** 2

    tk = jax.random.split(kt, t.num_layers + 3)
    text = {
        "token_embedding": jax.random.normal(tk[0], (t.vocab_size, t.hidden_size), dtype) * 0.02,
        "position_embedding": jax.random.normal(tk[1], (t.max_positions, t.hidden_size), dtype) * 0.01,
        "layers": [
            _block_init(tk[2 + i], t.hidden_size, t.intermediate_size, dtype)
            for i in range(t.num_layers)
        ],
        "final_ln": _ln_init(t.hidden_size, dtype),
        "head": _dense_init(tk[-1], t.hidden_size, t.projection_size, dtype),
    }

    vk = jax.random.split(kv, v.num_layers + 7)
    vision = {
        "patch_embedding": {
            "w": jax.random.normal(
                vk[0], (v.num_channels * v.patch_size**2, v.hidden_size), dtype
            )
            * 0.02,
            "b": jnp.zeros((v.hidden_size,), dtype),
        },
        "position_embedding": jax.random.normal(vk[1], (n_patches, v.hidden_size), dtype) * 0.01,
        "layers": [
            _block_init(vk[2 + i], v.hidden_size, v.intermediate_size, dtype)
            for i in range(v.num_layers)
        ],
        "post_ln": _ln_init(v.hidden_size, dtype),
        "map_head": {
            "probe": jax.random.normal(vk[-4], (1, 1, v.hidden_size), dtype) * 0.02,
            "attn": {
                "q": _dense_init(vk[-3], v.hidden_size, v.hidden_size, dtype),
                "k": _dense_init(vk[-3], v.hidden_size, v.hidden_size, dtype),
                "v": _dense_init(vk[-3], v.hidden_size, v.hidden_size, dtype),
                "o": _dense_init(vk[-3], v.hidden_size, v.hidden_size, dtype),
            },
            "ln": _ln_init(v.hidden_size, dtype),
            "fc1": _dense_init(vk[-2], v.hidden_size, v.intermediate_size, dtype),
            "fc2": _dense_init(vk[-1], v.intermediate_size, v.hidden_size, dtype),
        },
    }
    return {
        "text_model": text,
        "vision_model": vision,
        # kept for checkpoint round-trip completeness (unused by the heads)
        "logit_scale": jnp.asarray(1.0, dtype),
        "logit_bias": jnp.asarray(0.0, dtype),
    }


def siglip_text_features(
    params: dict,
    input_ids: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray],
    cfg: SigLIPConfig,
    position_ids: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """= HF ``SiglipModel.get_text_features``: last-position pooling + head.

    ``position_ids`` ([T] int32, default ``arange(T)``) exists for the exact
    length-bucketed eval path: SigLIP pools the LAST column — on right-padded
    masked input (the reference builds ``(ids != pad) `` masks,
    /root/reference/src/data/dataset.py:157-164) a PAD token whose keys are
    masked everywhere — so a row of length L computes EXACTLY at width
    b>=L+1 by keeping b-1 real columns plus a carry column holding the PAD
    token with the full width's last position embedding and mask 0 (see
    models/fast_infer.py bucket_batch_text). Masked keys contribute
    exactly-zero attention weight at any width, and per-position ops have no
    cross-talk, so the carry column's trajectory equals the full-width last
    position's."""
    t = cfg.text
    p = params["text_model"]
    T = input_ids.shape[1]
    pos = (
        p["position_embedding"][:T]
        if position_ids is None
        else p["position_embedding"][position_ids]
    )
    x = p["token_embedding"][input_ids] + pos
    x = x.astype(t.compute_dtype)
    mask, key_mask = None, None
    if attention_mask is not None:
        pad = (1.0 - attention_mask.astype(jnp.float32)) * NEG_INF
        if t.attention_impl == "pallas":
            key_mask = pad  # applied in-kernel, no dense [T, T] tensor
        else:
            mask = pad[:, None, None, :]
    for layer in p["layers"]:
        x = transformer_block(
            x, layer, t.num_heads, t.hidden_act, mask, t.layer_norm_eps,
            remat=t.remat,
            attention_impl=t.attention_impl,
            scores_dtype=t.scores_dtype,
            key_mask=key_mask,
        )
    x = layer_norm(x, p["final_ln"], t.layer_norm_eps)
    pooled = x[:, -1]
    return dense(pooled, p["head"])


def _map_head(hidden: jnp.ndarray, p: dict, cfg: SigLIPVisionConfig) -> jnp.ndarray:
    """Multihead attention pooling: learned probe attends over patch tokens
    (= HF ``SiglipMultiheadAttentionPoolingHead``)."""
    from multimodal_content_moderation_tpu.ops.layers import ACTIVATIONS

    B = hidden.shape[0]
    probe = jnp.broadcast_to(p["probe"].astype(hidden.dtype), (B, 1, cfg.hidden_size))
    x = mha(probe, hidden, p["attn"], cfg.num_heads)
    residual = x
    y = layer_norm(x, p["ln"], cfg.layer_norm_eps)
    from multimodal_content_moderation_tpu.ops.layers import dense_maybe_int8

    y = dense_maybe_int8(y, p["fc1"])
    y = ACTIVATIONS[cfg.hidden_act](y)
    y = dense(y, p["fc2"])
    return (residual + y)[:, 0]


def siglip_vision_encoder(
    params: dict, tokens: jnp.ndarray, cfg: SigLIPVisionConfig
) -> jnp.ndarray:
    """ViT trunk over already-embedded patch tokens [B, N, D] -> post-LN
    hidden states (pos-embed + blocks + post-LN; no class token in SigLIP).
    Shared by the fp32 pixel path and the uint8 wire-format fast path."""
    p = params["vision_model"]
    x = tokens + p["position_embedding"].astype(tokens.dtype)[None]
    for layer in p["layers"]:
        x = transformer_block(
            x, layer, cfg.num_heads, cfg.hidden_act, None, cfg.layer_norm_eps,
            remat=cfg.remat,
            attention_impl=cfg.attention_impl,
            scores_dtype=cfg.scores_dtype,
        )
    return layer_norm(x, p["post_ln"], cfg.layer_norm_eps)


def siglip_vision_hidden(
    params: dict, pixel_values: jnp.ndarray, cfg: SigLIPVisionConfig
) -> jnp.ndarray:
    """Post-LN hidden states [B, N, D] of the SigLIP ViT."""
    patches = patchify(pixel_values.astype(cfg.compute_dtype), cfg.patch_size)
    tokens = dense(patches, params["vision_model"]["patch_embedding"])
    return siglip_vision_encoder(params, tokens, cfg)


def siglip_image_features(
    params: dict, pixel_values: jnp.ndarray, cfg: SigLIPConfig
) -> jnp.ndarray:
    """= HF ``SiglipModel.get_image_features`` (MAP-head pooled)."""
    hidden = siglip_vision_hidden(params, pixel_values, cfg.vision)
    return _map_head(hidden, params["vision_model"]["map_head"], cfg.vision)


def siglip_image_features_from_tokens(
    params: dict, tokens: jnp.ndarray, cfg: SigLIPConfig
) -> jnp.ndarray:
    """``get_image_features`` from already-embedded patch tokens (the u8
    wire-format path: ops/pallas_image embeds, this pools)."""
    hidden = siglip_vision_encoder(params, tokens, cfg.vision)
    return _map_head(hidden, params["vision_model"]["map_head"], cfg.vision)
