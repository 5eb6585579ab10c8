"""Gated late-fusion multi-label classifier (TPU-native).

Math is an exact re-derivation of the reference
``MultiModalFusionClassifier`` (src/models/fusion.py:55-229):

1. encoder features are L2-normalized and masked by presence flags
2. projected to ``fusion_dim``
3. tanh-gated fusion; the sigmoid gate sees both projections + presence flags
4. three-way ``where`` fallback when a modality is absent
5. interaction features ``[fused, t, v, |t-v|, t*v]`` -> LN -> Linear -> GELU
   -> Dropout(0.2) -> Linear head
6. in-model BCE(pos_weight) or focal loss

Everything is a pure function over a parameter pytree; the wrapper
``FusionModel`` is a frozen (hashable) dataclass so it can be a static jit
argument.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from multimodal_content_moderation_tpu.models import clip as clip_mod
from multimodal_content_moderation_tpu.models import generic as generic_mod
from multimodal_content_moderation_tpu.models import siglip as siglip_mod
from multimodal_content_moderation_tpu.ops.layers import (
    dense,
    dropout,
    gelu_exact,
    layer_norm,
)
from multimodal_content_moderation_tpu.ops.losses import bce_with_logits, focal_with_logits


def l2_normalize(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """torch ``F.normalize(x, dim=-1)``: x / max(||x||, eps)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True))
    return (x.astype(jnp.float32) / jnp.maximum(norm, eps)).astype(x.dtype)


def _head_dense_init(rng, d_in, d_out, dtype):
    """torch nn.Linear default init: U(-1/sqrt(in), 1/sqrt(in)) for w and b."""
    k1, k2 = jax.random.split(rng)
    bound = d_in ** -0.5
    return {
        "w": jax.random.uniform(k1, (d_in, d_out), dtype, -bound, bound),
        "b": jax.random.uniform(k2, (d_out,), dtype, -bound, bound),
    }


def fusion_head_init(
    rng: jax.Array, feature_dim: int, num_labels: int, fusion_dim: int = 512, dtype=jnp.float32
) -> dict:
    """Init the fusion-head parameter pytree (names mirror the reference
    modules so the torch converter is 1:1)."""
    ks = jax.random.split(rng, 7)
    ln = lambda d: {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}
    return {
        "proj_t": _head_dense_init(ks[0], feature_dim, fusion_dim, dtype),
        "proj_i": _head_dense_init(ks[1], feature_dim, fusion_dim, dtype),
        "g_t": _head_dense_init(ks[2], fusion_dim, fusion_dim, dtype),
        "g_i": _head_dense_init(ks[3], fusion_dim, fusion_dim, dtype),
        "gate": _head_dense_init(ks[4], fusion_dim * 2 + 2, fusion_dim, dtype),
        "ln_fused": ln(fusion_dim),
        "cls_ln": ln(fusion_dim * 5),
        "cls_fc1": _head_dense_init(ks[5], fusion_dim * 5, fusion_dim, dtype),
        "cls_fc2": _head_dense_init(ks[6], fusion_dim, num_labels, dtype),
    }


def fusion_head_apply(
    params: dict,
    tfeat: jnp.ndarray,
    vfeat: jnp.ndarray,
    text_present: jnp.ndarray,
    image_present: jnp.ndarray,
    dropout_rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Fusion head forward: encoder features -> logits.

    Exact math of reference src/models/fusion.py:188-216.
    """
    tfeat = l2_normalize(tfeat) * text_present[:, None].astype(tfeat.dtype)
    vfeat = l2_normalize(vfeat) * image_present[:, None].astype(vfeat.dtype)

    tp = dense(tfeat, params["proj_t"])
    vp = dense(vfeat, params["proj_i"])

    zt = jnp.tanh(dense(tp, params["g_t"]))
    zi = jnp.tanh(dense(vp, params["g_i"]))
    presence = jnp.stack([text_present, image_present], axis=1).astype(tp.dtype)
    g = jax.nn.sigmoid(dense(jnp.concatenate([tp, vp, presence], axis=1), params["gate"]))

    fused = jnp.where(
        (image_present < 0.5)[:, None],
        zt,
        jnp.where((text_present < 0.5)[:, None], zi, g * zt + (1.0 - g) * zi),
    )
    fused = layer_norm(fused, params["ln_fused"])

    feat = jnp.concatenate([fused, tp, vp, jnp.abs(tp - vp), tp * vp], axis=1)
    y = layer_norm(feat, params["cls_ln"])
    y = gelu_exact(dense(y, params["cls_fc1"]))
    y = dropout(y, 0.2, dropout_rng)
    return dense(y, params["cls_fc2"])


@dataclasses.dataclass(frozen=True)
class FusionModel:
    """Backbone + fusion head bundle with the reference forward contract:

    ``apply(params, batch) -> {"loss", "logits"}`` where batch holds
    input_ids, attention_mask, pixel_values (NCHW), text_present,
    image_present, and optionally labels — matching reference
    src/models/fusion.py:157-165.
    """

    backend: str = "clip"  # "clip" | "siglip" | "auto" | "generic"
    clip_config: Optional[clip_mod.CLIPConfig] = None
    siglip_config: Optional[siglip_mod.SigLIPConfig] = None
    generic_config: Optional["generic_mod.GenericDualConfig"] = None
    num_labels: int = 5
    fusion_dim: int = 512
    loss_type: str = "bce"  # "bce" | "focal" | "asl"
    focal_gamma: float = 1.5
    # uint8 wire format (batches carrying "patches_u8" instead of
    # "pixel_values"): normalization stats folded into the patch embed, and
    # the embed kernel impl ("reference" XLA | "pallas" fused TPU kernel)
    image_mean: Optional[tuple] = None
    image_std: Optional[tuple] = None
    embed_impl: str = "reference"

    @staticmethod
    def create(
        backend: str = "clip",
        num_labels: int = 5,
        fusion_dim: int = 512,
        loss_type: str = "bce",
        focal_gamma: float = 1.5,
        clip_config: Optional[clip_mod.CLIPConfig] = None,
        siglip_config: Optional[siglip_mod.SigLIPConfig] = None,
        generic_config=None,
    ) -> "FusionModel":
        backend = backend.lower()
        if backend == "clip":
            clip_config = clip_config or clip_mod.CLIPConfig.base_patch32()
        elif backend == "generic":
            generic_config = generic_config or generic_mod.GenericDualConfig()
        else:
            siglip_config = siglip_config or siglip_mod.SigLIPConfig.base_patch16_224()
        return FusionModel(
            backend=backend,
            clip_config=clip_config,
            siglip_config=siglip_config,
            generic_config=generic_config,
            num_labels=num_labels,
            fusion_dim=fusion_dim,
            loss_type=loss_type,
            focal_gamma=focal_gamma,
        )

    @property
    def feature_dim(self) -> int:
        if self.backend == "clip":
            return self.clip_config.projection_dim
        if self.backend == "generic":
            # the reference's projection-dim probing chain (fusion.py:110-120):
            # projection_dim -> text hidden -> vision hidden
            g = self.generic_config
            return g.projection_dim or g.text.hidden_size or g.vision.hidden_size
        # SigLIP feature dims: text head projection_size == vision hidden_size
        return self.siglip_config.text.projection_size

    @property
    def image_size(self) -> int:
        if self.backend == "generic":
            return self.generic_config.vision.image_size
        cfg = self.clip_config.vision if self.backend == "clip" else self.siglip_config.vision
        return cfg.image_size

    @property
    def text_max_positions(self) -> int:
        if self.backend == "generic":
            return self.generic_config.text.max_positions
        cfg = self.clip_config.text if self.backend == "clip" else self.siglip_config.text
        return cfg.max_positions

    def init(self, rng: jax.Array, dtype=jnp.float32) -> dict:
        kb, kh = jax.random.split(rng)
        if self.backend == "clip":
            backbone = clip_mod.clip_init(kb, self.clip_config, dtype)
        elif self.backend == "generic":
            backbone = generic_mod.generic_init(kb, self.generic_config, dtype)
        else:
            backbone = siglip_mod.siglip_init(kb, self.siglip_config, dtype)
        head = fusion_head_init(kh, self.feature_dim, self.num_labels, self.fusion_dim, dtype)
        return {"backbone": backbone, "head": head}

    def _embed_u8(self, bp: dict, patches_u8: jnp.ndarray) -> jnp.ndarray:
        from multimodal_content_moderation_tpu.models.u8wire import embed_for_model

        return embed_for_model(self, bp, patches_u8)

    def encode(
        self,
        params: dict,
        batch: Dict[str, jnp.ndarray],
        dropout_rng: Optional[jax.Array] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """``dropout_rng`` activates train-mode tower dropout where a backend
        has it (generic BERT-family text towers, HF defaults 0.1 — the
        CLIP/SigLIP towers are dropout-free at their HF defaults)."""
        bp = params["backbone"]
        u8 = batch.get("patches_u8")
        if self.backend == "clip":
            t = clip_mod.clip_text_features(
                bp, batch["input_ids"], batch.get("attention_mask"), self.clip_config
            )
            if u8 is not None:
                v = clip_mod.clip_image_features_from_tokens(
                    bp, self._embed_u8(bp, u8), self.clip_config
                )
            else:
                v = clip_mod.clip_image_features(bp, batch["pixel_values"], self.clip_config)
        elif self.backend == "generic":
            t = generic_mod.generic_text_features(
                bp, batch["input_ids"], batch.get("attention_mask"),
                self.generic_config, dropout_rng=dropout_rng,
            )
            if u8 is not None:
                v = generic_mod.generic_image_features_from_tokens(
                    bp, self._embed_u8(bp, u8), self.generic_config
                )
            else:
                v = generic_mod.generic_image_features(
                    bp, batch["pixel_values"], self.generic_config
                )
        else:
            t = siglip_mod.siglip_text_features(
                bp, batch["input_ids"], batch.get("attention_mask"), self.siglip_config,
                position_ids=batch.get("position_ids"),
            )
            if u8 is not None:
                v = siglip_mod.siglip_image_features_from_tokens(
                    bp, self._embed_u8(bp, u8), self.siglip_config
                )
            else:
                v = siglip_mod.siglip_image_features(bp, batch["pixel_values"], self.siglip_config)
        return t, v

    def apply(
        self,
        params: dict,
        batch: Dict[str, jnp.ndarray],
        dropout_rng: Optional[jax.Array] = None,
        pos_weight: Optional[jnp.ndarray] = None,
        alpha_focal: Optional[jnp.ndarray] = None,
    ) -> Dict[str, Any]:
        enc_rng = None
        if dropout_rng is not None and self.backend == "generic":
            dropout_rng, enc_rng = jax.random.split(dropout_rng)
        tfeat, vfeat = self.encode(params, batch, dropout_rng=enc_rng)
        logits = fusion_head_apply(
            params["head"],
            tfeat,
            vfeat,
            batch["text_present"],
            batch["image_present"],
            dropout_rng,
        )
        out = {"logits": logits}
        labels = batch.get("labels")
        if labels is not None:
            if self.loss_type == "focal":
                out["loss"] = focal_with_logits(
                    logits, labels, gamma=self.focal_gamma, alpha=alpha_focal
                )
            else:
                out["loss"] = bce_with_logits(logits, labels, pos_weight=pos_weight)
        return out
