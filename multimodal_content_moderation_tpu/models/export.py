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


def siglip_text_tower_to_torch(t: dict, prefix: str = "text_model.") -> Dict:
    sd: Dict = {}
    sd[f"{prefix}embeddings.token_embedding.weight"] = _np32(t["token_embedding"]).copy()
    sd[f"{prefix}embeddings.position_embedding.weight"] = _np32(
        t["position_embedding"]
    ).copy()
    _encoder_layers_out(sd, f"{prefix}encoder", t["layers"])
    _ln_out(sd, f"{prefix}final_layer_norm", t["final_ln"])
    _linear_out(sd, f"{prefix}head", t["head"])
    return sd


def siglip_vision_tower_to_torch(
    v: dict, patch_size: int, num_channels: int = 3, prefix: str = "vision_model."
) -> Dict:
    """Inverse of convert.siglip_params_from_torch's vision branch, incl. the
    MAP head's fused ``nn.MultiheadAttention`` in_proj re-assembly."""
    sd: Dict = {}
    w = _np32(v["patch_embedding"]["w"]).T  # (D, C*p*p)
    sd[f"{prefix}embeddings.patch_embedding.weight"] = np.ascontiguousarray(
        w.reshape(w.shape[0], num_channels, patch_size, patch_size)
    )
    sd[f"{prefix}embeddings.patch_embedding.bias"] = _np32(
        v["patch_embedding"]["b"]
    ).copy()
    sd[f"{prefix}embeddings.position_embedding.weight"] = _np32(
        v["position_embedding"]
    ).copy()
    _encoder_layers_out(sd, f"{prefix}encoder", v["layers"])
    _ln_out(sd, f"{prefix}post_layernorm", v["post_ln"])
    m = v["map_head"]
    sd[f"{prefix}head.probe"] = _np32(m["probe"]).copy()
    a = m["attn"]
    sd[f"{prefix}head.attention.in_proj_weight"] = np.ascontiguousarray(
        np.concatenate(
            [_np32(a["q"]["w"]).T, _np32(a["k"]["w"]).T, _np32(a["v"]["w"]).T],
            axis=0,
        )
    )
    sd[f"{prefix}head.attention.in_proj_bias"] = np.ascontiguousarray(
        np.concatenate([_np32(a["q"]["b"]), _np32(a["k"]["b"]), _np32(a["v"]["b"])])
    )
    _linear_out(sd, f"{prefix}head.attention.out_proj", a["o"])
    _ln_out(sd, f"{prefix}head.layernorm", m["ln"])
    _linear_out(sd, f"{prefix}head.mlp.fc1", m["fc1"])
    _linear_out(sd, f"{prefix}head.mlp.fc2", m["fc2"])
    return sd


def bert_text_tower_to_torch(
    t: dict, prefix: str = "text_model.", arch: str = "bert"
) -> Dict:
    """Inverse of generic.bert_tower_from_torch / distilbert_tower_from_torch."""
    p = prefix
    sd: Dict = {}
    sd[f"{p}embeddings.word_embeddings.weight"] = _np32(t["word_embeddings"]).copy()
    sd[f"{p}embeddings.position_embeddings.weight"] = _np32(
        t["position_embeddings"]
    ).copy()
    if "token_type_embeddings" in t:
        sd[f"{p}embeddings.token_type_embeddings.weight"] = _np32(
            t["token_type_embeddings"]
        ).copy()
    _ln_out(sd, f"{p}embeddings.LayerNorm", t["emb_ln"])
    for i, l in enumerate(t["layers"]):
        if arch == "distilbert":
            lp = f"{p}transformer.layer.{i}."
            _linear_out(sd, lp + "attention.q_lin", l["attn"]["q"])
            _linear_out(sd, lp + "attention.k_lin", l["attn"]["k"])
            _linear_out(sd, lp + "attention.v_lin", l["attn"]["v"])
            _linear_out(sd, lp + "attention.out_lin", l["attn"]["o"])
            _ln_out(sd, lp + "sa_layer_norm", l["ln1"])
            _linear_out(sd, lp + "ffn.lin1", l["fc1"])
            _linear_out(sd, lp + "ffn.lin2", l["fc2"])
            _ln_out(sd, lp + "output_layer_norm", l["ln2"])
        else:
            lp = f"{p}encoder.layer.{i}."
            _linear_out(sd, lp + "attention.self.query", l["attn"]["q"])
            _linear_out(sd, lp + "attention.self.key", l["attn"]["k"])
            _linear_out(sd, lp + "attention.self.value", l["attn"]["v"])
            _linear_out(sd, lp + "attention.output.dense", l["attn"]["o"])
            _ln_out(sd, lp + "attention.output.LayerNorm", l["ln1"])
            _linear_out(sd, lp + "intermediate.dense", l["fc1"])
            _linear_out(sd, lp + "output.dense", l["fc2"])
            _ln_out(sd, lp + "output.LayerNorm", l["ln2"])
    if "pooler" in t:
        _linear_out(sd, f"{p}pooler.dense", t["pooler"])
    return sd


def vit_vision_tower_to_torch(
    v: dict, patch_size: int, num_channels: int = 3, prefix: str = "vision_model."
) -> Dict:
    """Inverse of generic.vit_tower_from_torch (HF ViTModel naming)."""
    p = prefix
    sd: Dict = {}
    sd[f"{p}embeddings.cls_token"] = _np32(v["cls_token"]).copy()
    sd[f"{p}embeddings.position_embeddings"] = _np32(v["position_embeddings"])[
        None
    ].copy()
    w = _np32(v["patch_embedding"]["w"]).T  # (D, C*p*p)
    sd[f"{p}embeddings.patch_embeddings.projection.weight"] = np.ascontiguousarray(
        w.reshape(w.shape[0], num_channels, patch_size, patch_size)
    )
    sd[f"{p}embeddings.patch_embeddings.projection.bias"] = _np32(
        v["patch_embedding"]["b"]
    ).copy()
    for i, l in enumerate(v["layers"]):
        lp = f"{p}encoder.layer.{i}."
        _ln_out(sd, lp + "layernorm_before", l["ln1"])
        _linear_out(sd, lp + "attention.attention.query", l["attn"]["q"])
        _linear_out(sd, lp + "attention.attention.key", l["attn"]["k"])
        _linear_out(sd, lp + "attention.attention.value", l["attn"]["v"])
        _linear_out(sd, lp + "attention.output.dense", l["attn"]["o"])
        _ln_out(sd, lp + "layernorm_after", l["ln2"])
        _linear_out(sd, lp + "intermediate.dense", l["fc1"])
        _linear_out(sd, lp + "output.dense", l["fc2"])
    _ln_out(sd, f"{p}layernorm", v["post_ln"])
    if "pooler" in v:
        _linear_out(sd, f"{p}pooler.dense", v["pooler"])
    return sd


def _backbone_to_torch(params: dict, model, out_prefix: str) -> Dict:
    """Backbone pytree -> reference torch keys under ``out_prefix`` for any of
    the three backends (clip / siglip / generic)."""
    bp = params["backbone"]
    sd: Dict = {}
    if model.backend == "clip":
        cfg = model.clip_config
        for k, v in clip_text_tower_to_torch(bp["text_model"]).items():
            sd[f"{out_prefix}{k}"] = v
        for k, v in clip_vision_tower_to_torch(
            bp["vision_model"], cfg.vision.patch_size, cfg.vision.num_channels
        ).items():
            sd[f"{out_prefix}{k}"] = v
    elif model.backend == "generic":
        cfg = model.generic_config
        for k, v in bert_text_tower_to_torch(
            bp["text_model"], arch=cfg.text.arch
        ).items():
            sd[f"{out_prefix}{k}"] = v
        for k, v in vit_vision_tower_to_torch(
            bp["vision_model"], cfg.vision.patch_size, cfg.vision.num_channels
        ).items():
            sd[f"{out_prefix}{k}"] = v
    else:
        cfg = model.siglip_config
        for k, v in siglip_text_tower_to_torch(bp["text_model"]).items():
            sd[f"{out_prefix}{k}"] = v
        for k, v in siglip_vision_tower_to_torch(
            bp["vision_model"], cfg.vision.patch_size, cfg.vision.num_channels
        ).items():
            sd[f"{out_prefix}{k}"] = v
    for name in ("text_projection", "visual_projection"):
        if name in bp:
            sd[f"{out_prefix}{name}.weight"] = _np32(bp[name]["w"]).T.copy()
    # HF SiglipModel stores logit_scale/logit_bias as shape-(1,) parameters;
    # CLIPModel / VisionTextDualEncoderModel use scalars.
    for name in ("logit_scale", "logit_bias"):
        if name in bp:
            leaf = _np32(bp[name]).copy()
            if model.backend not in ("clip", "generic"):  # siglip family
                leaf = leaf.reshape(1)
            sd[f"{out_prefix}{name}"] = leaf
    return sd


def fusion_model_to_torch(params: dict, model) -> Dict:
    """Fusion checkpoint -> reference ``backbone.*`` + head keys (all three
    backends; the reference loads them via scripts/evaluate.py:139-151)."""
    sd = _backbone_to_torch(params, model, "backbone.")
    sd.update(fusion_head_to_torch(params["head"]))
    return sd


def mtl_model_to_torch(params: dict, model) -> Dict:
    """MTL checkpoint -> reference key layout: CLIP uses separate
    ``tower_txt.text_model.*``/``tower_img.vision_model.*`` towers
    (multitask.py:61-62); the auto path (siglip/generic) shares one
    ``backbone.*`` AutoModel (multitask.py:74)."""
    sd: Dict
    if model.backend == "clip":
        cfg = model.clip_config
        bp = params["backbone"]
        sd = {}
        for k, v in clip_text_tower_to_torch(
            bp["text_model"], prefix="text_model."
        ).items():
            sd[f"tower_txt.{k}"] = v
        for k, v in clip_vision_tower_to_torch(
            bp["vision_model"], cfg.vision.patch_size, cfg.vision.num_channels,
            prefix="vision_model.",
        ).items():
            sd[f"tower_img.{k}"] = v
    else:
        sd = _backbone_to_torch(params, model, "backbone.")
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
