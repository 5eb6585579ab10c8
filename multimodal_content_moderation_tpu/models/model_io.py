"""Model construction + checkpoint resolution (fully offline).

Resolves three checkpoint layouts into (model, params):

1. **HF encoder directory** (e.g. a local clone of
   ``openai/clip-vit-base-patch32``): ``config.json`` + ``model.safetensors``
   (+ tokenizer/preprocessor assets). Backbone weights are converted, heads
   are freshly initialized — the reference does the same via
   ``from_pretrained`` (src/models/fusion.py:100-111).
2. **Reference run checkpoints** (``runs/<exp>/checkpoint-N/model.safetensors``
   with ``backbone.*``/``tower_*.*`` keys and ``inference_config.json`` in the
   parent — scripts/evaluate.py:89-151 search order).
3. **This framework's run dirs** (Orbax ``checkpoint-N/`` + an
   ``inference_config.json`` with ``"format": "orbax"``).

Config JSONs are parsed directly (no transformers import needed at inference
time).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from multimodal_content_moderation_tpu.models import convert
from multimodal_content_moderation_tpu.models.clip import (
    CLIPConfig,
    CLIPTextConfig,
    CLIPVisionConfig,
)
from multimodal_content_moderation_tpu.models.fusion import FusionModel
from multimodal_content_moderation_tpu.models.generic import (
    GenericDualConfig,
    generic_params_from_torch,
)
from multimodal_content_moderation_tpu.models.multitask import MultiTaskModel
from multimodal_content_moderation_tpu.models.siglip import (
    SigLIPConfig,
    SigLIPTextConfig,
    SigLIPVisionConfig,
)
from multimodal_content_moderation_tpu.utils.config import load_json


def clip_config_from_dict(d: Dict[str, Any]) -> CLIPConfig:
    t = d.get("text_config", {})
    v = d.get("vision_config", {})
    return CLIPConfig(
        text=CLIPTextConfig(
            vocab_size=t.get("vocab_size", 49408),
            hidden_size=t.get("hidden_size", 512),
            num_layers=t.get("num_hidden_layers", 12),
            num_heads=t.get("num_attention_heads", 8),
            intermediate_size=t.get("intermediate_size", 2048),
            max_positions=t.get("max_position_embeddings", 77),
            eos_token_id=t.get("eos_token_id", 49407),
            hidden_act=t.get("hidden_act", "quick_gelu"),
            layer_norm_eps=t.get("layer_norm_eps", 1e-5),
        ),
        vision=CLIPVisionConfig(
            hidden_size=v.get("hidden_size", 768),
            num_layers=v.get("num_hidden_layers", 12),
            num_heads=v.get("num_attention_heads", 12),
            intermediate_size=v.get("intermediate_size", 3072),
            image_size=v.get("image_size", 224),
            patch_size=v.get("patch_size", 32),
            num_channels=v.get("num_channels", 3),
            hidden_act=v.get("hidden_act", "quick_gelu"),
            layer_norm_eps=v.get("layer_norm_eps", 1e-5),
        ),
        projection_dim=d.get("projection_dim", 512),
    )


def siglip_config_from_dict(d: Dict[str, Any]) -> SigLIPConfig:
    t = d.get("text_config", {})
    v = d.get("vision_config", {})
    return SigLIPConfig(
        text=SigLIPTextConfig(
            vocab_size=t.get("vocab_size", 256000),
            hidden_size=t.get("hidden_size", 768),
            num_layers=t.get("num_hidden_layers", 12),
            num_heads=t.get("num_attention_heads", 12),
            intermediate_size=t.get("intermediate_size", 3072),
            max_positions=t.get("max_position_embeddings", 64),
            projection_size=t.get("projection_size", t.get("hidden_size", 768)),
            hidden_act=t.get("hidden_act", "gelu_pytorch_tanh"),
            layer_norm_eps=t.get("layer_norm_eps", 1e-6),
        ),
        vision=SigLIPVisionConfig(
            hidden_size=v.get("hidden_size", 768),
            num_layers=v.get("num_hidden_layers", 12),
            num_heads=v.get("num_attention_heads", 12),
            intermediate_size=v.get("intermediate_size", 3072),
            image_size=v.get("image_size", 224),
            patch_size=v.get("patch_size", 16),
            num_channels=v.get("num_channels", 3),
            hidden_act=v.get("hidden_act", "gelu_pytorch_tanh"),
            layer_norm_eps=v.get("layer_norm_eps", 1e-6),
        ),
    )


def resolve_backend(encoder_dir: Optional[str], backend: str) -> str:
    """Resolve the reference's ``backend: auto`` option. The reference's
    "auto" loads the encoder through HF ``AutoModel`` (fusion.py:88-111,
    multitask.py:130-154); the TPU-native equivalent is dispatch on the
    local checkpoint's ``config.json`` ``model_type``: clip -> clip,
    siglip-family -> siglip, and any other dual-encoder config whose towers
    are standard HF architectures (e.g. ``vision-text-dual-encoder`` =
    ViT+BERT) -> the ``generic`` backend (models/generic.py) — the same
    coverage the reference gets from ``AutoModel`` + pooling fallbacks."""
    if backend != "auto":
        return backend
    cfg_path = os.path.join(encoder_dir or "", "config.json")
    if os.path.exists(cfg_path):
        d = load_json(cfg_path)
        model_type = d.get("model_type", "")
        if model_type == "clip":
            return "clip"
        if model_type.startswith("siglip") or not model_type:
            return "siglip"
        if "text_config" in d or "vision_config" in d:
            return "generic"
    return "siglip"


def load_encoder_config(encoder_dir: str, backend: str):
    """Parse a local HF ``config.json`` into our config dataclasses."""
    cfg_path = os.path.join(encoder_dir, "config.json")
    if os.path.exists(cfg_path):
        d = load_json(cfg_path)
        model_type = d.get("model_type", "")
        if backend == "clip" or model_type == "clip":
            return clip_config_from_dict(d)
        if backend == "generic":
            return GenericDualConfig.from_dict(d)
        return siglip_config_from_dict(d)
    # No config: fall back to canonical architectures
    if backend == "clip":
        return CLIPConfig.base_patch32()
    if backend == "generic":
        return GenericDualConfig()
    return SigLIPConfig.base_patch16_224()


def _find_state_dict(directory: str) -> Optional[Dict[str, np.ndarray]]:
    """Load model weights from a directory: safetensors preferred, torch
    ``pytorch_model.bin`` fallback (mirrors scripts/evaluate.py:139-151)."""
    st = os.path.join(directory, "model.safetensors")
    if os.path.exists(st):
        return convert.load_safetensors(st)
    bins = os.path.join(directory, "pytorch_model.bin")
    if os.path.exists(bins):
        import torch

        sd = torch.load(bins, map_location="cpu", weights_only=True)
        return {k: v.numpy() for k, v in sd.items()}
    return None


def build_model(
    head: str,
    backend: str,
    class_names,
    fusion_dim: int = 512,
    loss_type: str = "bce",
    focal_gamma: float = 1.5,
    head_hidden_dim: int = 0,
    learnable_task_weights: bool = False,
    clip_config: Optional[CLIPConfig] = None,
    siglip_config: Optional[SigLIPConfig] = None,
    generic_config: Optional[GenericDualConfig] = None,
):
    """Dispatch fusion/mtl model creation (scripts/train.py:227-255 contract)."""
    if head == "mtl":
        if backend == "clip":
            mtl_backend = "clip"
        elif backend == "generic":
            mtl_backend = "generic"
        else:
            mtl_backend = "auto"
        return MultiTaskModel.create(
            backend=mtl_backend,
            num_tasks=len(class_names),
            fusion_dim=fusion_dim,
            head_hidden_dim=head_hidden_dim,
            learnable_task_weights=learnable_task_weights,
            clip_config=clip_config,
            siglip_config=siglip_config,
            generic_config=generic_config,
        )
    return FusionModel.create(
        backend=backend,
        num_labels=len(class_names),
        fusion_dim=fusion_dim,
        loss_type=loss_type,
        focal_gamma=focal_gamma,
        clip_config=clip_config,
        siglip_config=siglip_config,
        generic_config=generic_config,
    )


def init_from_encoder_dir(
    model, encoder_dir: Optional[str], rng: Optional[jax.Array] = None, dtype=None
) -> dict:
    """Init params; if ``encoder_dir`` holds HF encoder weights, convert them
    into the backbone (heads stay randomly initialized)."""
    import jax.numpy as jnp

    rng = rng if rng is not None else jax.random.key(0)
    params = model.init(rng)
    sd = _find_state_dict(encoder_dir) if encoder_dir else None
    if sd is not None:
        if model.backend == "clip":
            backbone = convert.clip_params_from_torch(sd, model.clip_config)
            if isinstance(model, MultiTaskModel):
                backbone.pop("text_projection", None)
                backbone.pop("visual_projection", None)
                backbone.pop("logit_scale", None)
        elif model.backend == "generic":
            backbone = generic_params_from_torch(sd, model.generic_config)
            if isinstance(model, MultiTaskModel):
                backbone.pop("text_projection", None)
                backbone.pop("visual_projection", None)
                backbone.pop("logit_scale", None)
        else:
            backbone = convert.siglip_params_from_torch(sd, model.siglip_config)
        params["backbone"] = jax.tree_util.tree_map(jnp.asarray, backbone)
    if dtype is not None:
        params = convert.to_dtype(params, dtype)
    return params


def with_performance_options(
    model,
    compute_dtype: Optional[str] = None,
    scores_dtype: Optional[str] = None,
    attention_impl: Optional[str] = None,
):
    """Return a copy of a (frozen) model with tower performance knobs set.

    ``compute_dtype="bfloat16"`` = mixed precision; ``scores_dtype="bfloat16"``
    = bf16 attention scores (+17% eval on v5e, parity-impacting — opt-in)."""
    import dataclasses

    overrides = {}
    if compute_dtype is not None:
        overrides["compute_dtype"] = compute_dtype
    if scores_dtype is not None:
        overrides["scores_dtype"] = scores_dtype
    if attention_impl is not None:
        overrides["attention_impl"] = attention_impl
    if not overrides:
        return model
    if model.backend == "clip":
        cfg = model.clip_config
        new_cfg = dataclasses.replace(
            cfg,
            text=dataclasses.replace(cfg.text, **overrides),
            vision=dataclasses.replace(cfg.vision, **overrides),
        )
        return dataclasses.replace(model, clip_config=new_cfg)
    if model.backend == "generic":
        cfg = model.generic_config
        new_cfg = dataclasses.replace(
            cfg,
            text=dataclasses.replace(cfg.text, **overrides),
            vision=dataclasses.replace(cfg.vision, **overrides),
        )
        return dataclasses.replace(model, generic_config=new_cfg)
    cfg = model.siglip_config
    new_cfg = dataclasses.replace(
        cfg,
        text=dataclasses.replace(cfg.text, **overrides),
        vision=dataclasses.replace(cfg.vision, **overrides),
    )
    return dataclasses.replace(model, siglip_config=new_cfg)


def find_inference_config(checkpoint_dir: str) -> Tuple[Dict[str, Any], str]:
    """Locate inference_config.json in {parent, dir} (scripts/evaluate.py:
    95-105 search order). Returns (config, path)."""
    p = Path(checkpoint_dir)
    for cand in [p.parent / "inference_config.json", p / "inference_config.json"]:
        if cand.exists():
            return load_json(str(cand)), str(cand)
    raise FileNotFoundError(
        f"Could not find inference_config.json in {checkpoint_dir} or its parent"
    )


def load_checkpoint(
    checkpoint_dir: str,
    encoder_dir: Optional[str] = None,
    dtype=None,
):
    """Full checkpoint -> (model, params, inference_config).

    Handles reference-format safetensors checkpoints and this framework's
    Orbax run dirs; ``encoder_dir`` supplies the encoder ``config.json`` when
    the checkpoint doesn't carry one.
    """
    cfg, _ = find_inference_config(checkpoint_dir)
    backend = cfg.get("backend", "clip")
    head = cfg.get("head", "fusion")
    class_names = cfg.get("class_names", ["harmful"])
    fusion_dim = cfg.get("fusion_dim", 512)

    enc_src = encoder_dir or cfg.get("encoder_dir") or checkpoint_dir
    enc_cfg = load_encoder_config(enc_src, backend if backend in ("clip", "generic") else "siglip")
    if backend == "clip":
        kwargs = {"clip_config": enc_cfg}
    elif backend == "generic":
        kwargs = {"generic_config": enc_cfg}
    else:
        kwargs = {"siglip_config": enc_cfg}
    model = build_model(
        head,
        backend,
        class_names,
        fusion_dim,
        head_hidden_dim=cfg.get("head_hidden_dim", 0) or 0,
        learnable_task_weights=cfg.get("learnable_task_weights", False),
        **kwargs,
    )

    if cfg.get("format") == "orbax":
        from multimodal_content_moderation_tpu.training.checkpoints import (
            restore_checkpoint,
        )

        template = model.init(jax.random.key(0))
        params = restore_checkpoint(checkpoint_dir, template)
    else:
        sd = _find_state_dict(checkpoint_dir)
        if sd is None:
            raise FileNotFoundError(f"No model weights found in {checkpoint_dir}")
        cfg_kw = {}
        if backend == "clip":
            cfg_kw["clip_cfg"] = enc_cfg
        elif backend == "generic":
            cfg_kw["generic_cfg"] = enc_cfg
        else:
            cfg_kw["siglip_cfg"] = enc_cfg
        if head == "mtl":
            params = convert.mtl_model_from_torch(
                sd,
                "clip" if backend == "clip" else backend if backend == "generic" else "auto",
                num_tasks=len(class_names),
                **cfg_kw,
            )
        else:
            params = convert.fusion_model_from_torch(sd, backend, **cfg_kw)
        import jax.numpy as jnp

        params = jax.tree_util.tree_map(jnp.asarray, params)
    if dtype is not None:
        params = convert.to_dtype(params, dtype)
    return model, params, cfg
