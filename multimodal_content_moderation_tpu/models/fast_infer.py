"""uint8 wire-format inference engine (the production TPU serving path).

The parity path feeds normalized fp32 NCHW pixels (4 bytes/value). This
engine instead ships raw uint8 patch rows to the device (4x fewer wire
bytes — decisive when host->HBM bandwidth is the bottleneck) and runs the
Pallas fused normalize+patchify+embed kernel (ops/pallas_image.py), whose
folded-GEMM math is bit-equivalent to normalize->patchify->dense up to fp32
accumulation order. The rest of the tower is the shared encoder trunk.

Currently specialized for the CLIP flagship (clip_vision_encoder); SigLIP
would fold into its biased patch embed the same way.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_content_moderation_tpu.models import clip as clip_mod
from multimodal_content_moderation_tpu.models.fusion import FusionModel, fusion_head_apply
from multimodal_content_moderation_tpu.ops.layers import dense, layer_norm
from multimodal_content_moderation_tpu.ops.pallas_image import (
    extract_patches_u8,
    fold_norm_into_embed,
    patch_embed_reference,
    patch_embed_u8,
)


class FastInferenceEngine:
    """Jitted u8-wire-format forward for a CLIP FusionModel."""

    def __init__(
        self,
        model: FusionModel,
        params: dict,
        mean: Sequence[float],
        std: Sequence[float],
        use_pallas: Optional[bool] = None,
    ):
        assert model.backend == "clip", "fast path targets the CLIP flagship"
        self.model = model
        self.params = params
        self.patch_size = model.clip_config.vision.patch_size
        vcfg = model.clip_config.vision

        pe = params["backbone"]["vision_model"]["patch_embedding"]
        self.w_folded, self.b_folded = fold_norm_into_embed(
            jnp.asarray(pe["w"], jnp.float32),
            jnp.asarray(pe.get("b")) if "b" in pe else None,
            mean,
            std,
            vcfg.patch_size,
            vcfg.num_channels,
        )
        if use_pallas is None:
            use_pallas = jax.default_backend() not in ("cpu",)
        embed = patch_embed_u8 if use_pallas else patch_embed_reference

        cfg = model.clip_config
        compute_dtype = cfg.vision.compute_dtype

        def forward(params, w_folded, b_folded, ids, mask, patches_u8, tpres, ipres):
            tokens = embed(
                patches_u8, w_folded, b_folded, out_dtype=jnp.dtype(compute_dtype)
            )
            bp = params["backbone"]
            hidden = clip_mod.clip_vision_encoder(bp, tokens, cfg.vision)
            pooled = layer_norm(
                hidden[:, 0], bp["vision_model"]["post_ln"], cfg.vision.layer_norm_eps
            )
            vfeat = dense(pooled, bp["visual_projection"])
            tfeat = clip_mod.clip_text_features(bp, ids, mask, cfg)
            logits = fusion_head_apply(params["head"], tfeat, vfeat, tpres, ipres)
            return logits.astype(jnp.float32)

        self._forward = jax.jit(forward)

    def patches_from_hwc(self, images_hwc: np.ndarray) -> np.ndarray:
        """[B, H, W, C] uint8 crops -> wire-format patch rows."""
        return extract_patches_u8(images_hwc, self.patch_size)

    def __call__(self, ids, mask, patches_u8, text_present, image_present):
        return self._forward(
            self.params,
            self.w_folded,
            self.b_folded,
            ids,
            mask,
            patches_u8,
            text_present,
            image_present,
        )
