"""Reverse conversion: JAX parameter pytrees -> reference-format state dicts.

Inverse of models/convert.py. Lets a model fine-tuned on TPU be exported as a
``model.safetensors`` with the exact key layout of the PyTorch reference
(``backbone.*`` + head keys for fusion — src/models/fusion.py:129-147;
``tower_txt.text_model.*``/``tower_img.vision_model.*`` for MTL —
src/models/multitask.py:61-62), so reference users can consume TPU-trained
checkpoints with zero code changes.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _np32(x) -> np.ndarray:
    """Any leaf (incl. device/bf16 arrays) -> host float32 ndarray."""
    import jax.numpy as jnp

    return np.asarray(jnp.asarray(x, jnp.float32))


def _linear_out(sd: Dict, name: str, p: dict) -> None:
    sd[f"{name}.weight"] = _np32(p["w"]).T.copy()
    if "b" in p and p["b"] is not None:
        sd[f"{name}.bias"] = _np32(p["b"]).copy()


def _ln_out(sd: Dict, name: str, p: dict) -> None:
    sd[f"{name}.weight"] = _np32(p["scale"]).copy()
    sd[f"{name}.bias"] = _np32(p["bias"]).copy()


def _encoder_layers_out(sd: Dict, prefix: str, layers: list) -> None:
    for i, l in enumerate(layers):
        b = f"{prefix}.layers.{i}"
        _ln_out(sd, f"{b}.layer_norm1", l["ln1"])
        _linear_out(sd, f"{b}.self_attn.q_proj", l["attn"]["q"])
        _linear_out(sd, f"{b}.self_attn.k_proj", l["attn"]["k"])
        _linear_out(sd, f"{b}.self_attn.v_proj", l["attn"]["v"])
        _linear_out(sd, f"{b}.self_attn.out_proj", l["attn"]["o"])
        _ln_out(sd, f"{b}.layer_norm2", l["ln2"])
        _linear_out(sd, f"{b}.mlp.fc1", l["fc1"])
        _linear_out(sd, f"{b}.mlp.fc2", l["fc2"])


def clip_text_tower_to_torch(t: dict, prefix: str = "text_model.") -> Dict:
    sd: Dict = {}
    sd[f"{prefix}embeddings.token_embedding.weight"] = _np32(t["token_embedding"]).copy()
    sd[f"{prefix}embeddings.position_embedding.weight"] = _np32(
        t["position_embedding"]
    ).copy()
    _encoder_layers_out(sd, f"{prefix}encoder", t["layers"])
    _ln_out(sd, f"{prefix}final_layer_norm", t["final_ln"])
    return sd


def clip_vision_tower_to_torch(
    v: dict, patch_size: int, num_channels: int = 3, prefix: str = "vision_model."
) -> Dict:
    sd: Dict = {}
    sd[f"{prefix}embeddings.class_embedding"] = _np32(v["class_embedding"]).copy()
    w = _np32(v["patch_embedding"]["w"]).T  # (D, C*p*p)
    sd[f"{prefix}embeddings.patch_embedding.weight"] = np.ascontiguousarray(
        w.reshape(w.shape[0], num_channels, patch_size, patch_size)
    )
    sd[f"{prefix}embeddings.position_embedding.weight"] = _np32(
        v["position_embedding"]
    ).copy()
    _ln_out(sd, f"{prefix}pre_layrnorm", v["pre_ln"])
    _encoder_layers_out(sd, f"{prefix}encoder", v["layers"])
    _ln_out(sd, f"{prefix}post_layernorm", v["post_ln"])
    return sd


def fusion_head_to_torch(h: dict) -> Dict:
    sd: Dict = {}
    _linear_out(sd, "proj_t", h["proj_t"])
    _linear_out(sd, "proj_i", h["proj_i"])
    _linear_out(sd, "g_t", h["g_t"])
    _linear_out(sd, "g_i", h["g_i"])
    _linear_out(sd, "gate", h["gate"])
    _ln_out(sd, "ln_fused", h["ln_fused"])
    _ln_out(sd, "cls.0", h["cls_ln"])
    _linear_out(sd, "cls.1", h["cls_fc1"])
    _linear_out(sd, "cls.4", h["cls_fc2"])
    return sd


def mtl_head_to_torch(h: dict) -> Dict:
    sd: Dict = {}
    for name in ("proj_t", "proj_i", "g_t", "g_i", "gate"):
        _linear_out(sd, name, h[name])
    _linear_out(sd, "shared_head.1", h["shared_fc"])
    for j, head in enumerate(h["heads"]):
        if "fc" in head:
            _linear_out(sd, f"heads.{j}", head["fc"])
        else:
            _linear_out(sd, f"heads.{j}.0", head["fc1"])
            _linear_out(sd, f"heads.{j}.3", head["fc2"])
    if "log_vars" in h:
        sd["log_vars"] = _np32(h["log_vars"]).copy()
    return sd


def fusion_model_to_torch(params: dict, model) -> Dict:
    """Fusion checkpoint -> reference ``backbone.*`` + head keys (CLIP)."""
    assert model.backend == "clip", "export currently targets the CLIP families"
    cfg = model.clip_config
    bp = params["backbone"]
    sd: Dict = {}
    for k, v in clip_text_tower_to_torch(bp["text_model"]).items():
        sd[f"backbone.{k}"] = v
    for k, v in clip_vision_tower_to_torch(
        bp["vision_model"], cfg.vision.patch_size, cfg.vision.num_channels
    ).items():
        sd[f"backbone.{k}"] = v
    sd["backbone.text_projection.weight"] = _np32(bp["text_projection"]["w"]).T.copy()
    sd["backbone.visual_projection.weight"] = _np32(
        bp["visual_projection"]["w"]
    ).T.copy()
    if "logit_scale" in bp:
        sd["backbone.logit_scale"] = _np32(bp["logit_scale"]).copy()
    sd.update(fusion_head_to_torch(params["head"]))
    return sd


def mtl_model_to_torch(params: dict, model) -> Dict:
    """MTL checkpoint -> reference ``tower_txt./tower_img.`` + head keys."""
    assert model.backend == "clip", "export currently targets the CLIP families"
    cfg = model.clip_config
    bp = params["backbone"]
    sd: Dict = {}
    for k, v in clip_text_tower_to_torch(
        bp["text_model"], prefix="text_model."
    ).items():
        sd[f"tower_txt.{k}"] = v
    for k, v in clip_vision_tower_to_torch(
        bp["vision_model"], cfg.vision.patch_size, cfg.vision.num_channels,
        prefix="vision_model.",
    ).items():
        sd[f"tower_img.{k}"] = v
    sd.update(mtl_head_to_torch(params["head"]))
    return sd


def export_safetensors(params: dict, model, path: str) -> str:
    """Write a reference-format ``model.safetensors`` from a (fusion or MTL)
    parameter pytree."""
    from safetensors.numpy import save_file

    from multimodal_content_moderation_tpu.models.multitask import MultiTaskModel

    if isinstance(model, MultiTaskModel):
        sd = mtl_model_to_torch(params, model)
    else:
        sd = fusion_model_to_torch(params, model)
    save_file(sd, path)
    return path
