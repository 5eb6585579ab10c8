"""uint8 wire-format glue shared by inference and training.

The wire format ships raw uint8 patch rows (4x fewer host->HBM bytes than
fp32 pixels) and embeds them with the Pallas fused normalize+patchify+embed
kernel (ops/pallas_image.py). ``embed_patches_u8`` is the differentiable
entry: the normalize constants are folded into the patch-embedding GEMM
*inside* the traced computation, so gradients flow to the real embedding
weight/bias and the u8 path is valid for fine-tuning, not just eval
(reference has no equivalent — its DataLoader ships normalized fp32,
src/data/dataset.py:99-111).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp

from multimodal_content_moderation_tpu.ops.pallas_image import (
    fold_norm_into_embed,
    patch_embed_u8_train,
)

# canonical normalization defaults live with the image pipeline; models carry
# their own stats via image_mean/image_std fields, these are only fallbacks
from multimodal_content_moderation_tpu.data.images import (  # noqa: E402
    CLIP_MEAN,
    CLIP_STD,
    SIGLIP_MEAN,
    SIGLIP_STD,
)


def default_stats(backend: str):
    return (CLIP_MEAN, CLIP_STD) if backend == "clip" else (SIGLIP_MEAN, SIGLIP_STD)


def embed_for_model(model, backbone: dict, patches_u8: jnp.ndarray) -> jnp.ndarray:
    """Model-aware u8 embed: resolves the vision config and normalization
    stats (model fields or per-backend defaults) and embeds the patch rows.
    Shared by FusionModel and MultiTaskModel — the single dispatch point."""
    if model.backend == "clip":
        vcfg = model.clip_config.vision
        dmean, dstd = default_stats("clip")
    elif model.backend == "generic":
        # ViT-style towers use 0.5/0.5 normalization like SigLIP; checkpoints
        # with other stats carry them via model.image_mean/image_std
        vcfg = model.generic_config.vision
        dmean, dstd = default_stats("siglip")
    else:
        vcfg = model.siglip_config.vision
        dmean, dstd = default_stats("siglip")
    return embed_patches_u8(
        backbone,
        patches_u8,
        vcfg,
        model.image_mean or dmean,
        model.image_std or dstd,
        model.embed_impl,
    )


def embed_patches_u8(
    backbone: dict,
    patches_u8: jnp.ndarray,
    vision_cfg,
    image_mean: Optional[Sequence[float]],
    image_std: Optional[Sequence[float]],
    embed_impl: str = "reference",
) -> jnp.ndarray:
    """[B, N, C*p*p] uint8 patch rows -> embedded tokens [B, N, D].

    Differentiable w.r.t. the patch-embedding params (custom VJP keeps uint8
    out of every XLA GEMM). ``embed_impl``: "pallas" (TPU) | "reference"."""
    pe = backbone["vision_model"]["patch_embedding"]
    wf, bf = fold_norm_into_embed(
        pe["w"].astype(jnp.float32),
        pe["b"].astype(jnp.float32) if "b" in pe else None,
        image_mean,
        image_std,
        vision_cfg.patch_size,
        vision_cfg.num_channels,
    )
    return patch_embed_u8_train(
        patches_u8, wf, bf, jnp.dtype(vision_cfg.compute_dtype), embed_impl == "pallas"
    )
