"""HF / torch checkpoint -> JAX parameter-pytree converters.

Reads a torch ``state_dict`` (or a safetensors file loaded with the numpy
backend — no torch needed at inference time) and produces the pytrees
consumed by models/clip.py, models/siglip.py, models/fusion.py and
models/multitask.py.

Weight-layout conventions handled here, once, at load time:
- torch ``nn.Linear.weight`` is (out, in) -> transposed to (in, out)
- patch-embedding ``Conv2d.weight`` (d, C, p, p) -> reshaped to (C*p*p, d),
  matching ops/layers.patchify's channel-major patch ordering
- SigLIP MAP-head ``nn.MultiheadAttention.in_proj_weight`` (3d, d) -> split
  into q/k/v dense params

State-dict prefixes cover the reference's three model families
(fusion: ``backbone.*`` — src/models/fusion.py:101/111; MTL-clip:
``tower_txt.text_model.*`` / ``tower_img.vision_model.*`` —
src/models/multitask.py:61-62; MTL-auto: ``backbone.*``).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from multimodal_content_moderation_tpu.models.clip import CLIPConfig
from multimodal_content_moderation_tpu.models.siglip import SigLIPConfig


def _np(x) -> np.ndarray:
    """torch tensor or ndarray -> owned ndarray.

    Must COPY: ``tensor.numpy()`` aliases the tensor's storage, so without a
    copy any later in-place torch update (e.g. ``optimizer.step()`` on the
    source model) would silently mutate the converted pytree."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.array(x)


def _linear(sd: Dict, name: str, bias: bool = True) -> dict:
    p = {"w": _np(sd[f"{name}.weight"]).T}
    if bias:
        p["b"] = _np(sd[f"{name}.bias"])
    return p


def _ln(sd: Dict, name: str) -> dict:
    return {"scale": _np(sd[f"{name}.weight"]), "bias": _np(sd[f"{name}.bias"])}


def _encoder_layers(sd: Dict, prefix: str, num_layers: int) -> list:
    layers = []
    for i in range(num_layers):
        b = f"{prefix}.layers.{i}"
        layers.append(
            {
                "ln1": _ln(sd, f"{b}.layer_norm1"),
                "attn": {
                    "q": _linear(sd, f"{b}.self_attn.q_proj"),
                    "k": _linear(sd, f"{b}.self_attn.k_proj"),
                    "v": _linear(sd, f"{b}.self_attn.v_proj"),
                    "o": _linear(sd, f"{b}.self_attn.out_proj"),
                },
                "ln2": _ln(sd, f"{b}.layer_norm2"),
                "fc1": _linear(sd, f"{b}.mlp.fc1"),
                "fc2": _linear(sd, f"{b}.mlp.fc2"),
            }
        )
    return layers


def _conv_patch_embed(sd: Dict, name: str, bias: bool) -> dict:
    w = _np(sd[f"{name}.weight"])  # (d, C, p, p)
    d = w.shape[0]
    p = {"w": w.reshape(d, -1).T}
    if bias:
        p["b"] = _np(sd[f"{name}.bias"])
    return p


def _strip_prefix(sd: Dict, prefix: str) -> Dict:
    if not prefix:
        return dict(sd)
    pl = len(prefix)
    return {k[pl:]: v for k, v in sd.items() if k.startswith(prefix)}


# ---------------------------------------------------------------------------
# Towers
# ---------------------------------------------------------------------------


def clip_text_tower_from_torch(sd: Dict, cfg: CLIPConfig, prefix: str = "text_model.") -> dict:
    t = _strip_prefix(sd, prefix)
    return {
        "token_embedding": _np(t["embeddings.token_embedding.weight"]),
        "position_embedding": _np(t["embeddings.position_embedding.weight"]),
        "layers": _encoder_layers(t, "encoder", cfg.text.num_layers),
        "final_ln": _ln(t, "final_layer_norm"),
    }


def clip_vision_tower_from_torch(sd: Dict, cfg: CLIPConfig, prefix: str = "vision_model.") -> dict:
    v = _strip_prefix(sd, prefix)
    return {
        "class_embedding": _np(v["embeddings.class_embedding"]),
        "patch_embedding": _conv_patch_embed(v, "embeddings.patch_embedding", bias=False),
        "position_embedding": _np(v["embeddings.position_embedding.weight"]),
        # NB: HF spells it "pre_layrnorm"
        "pre_ln": _ln(v, "pre_layrnorm"),
        "layers": _encoder_layers(v, "encoder", cfg.vision.num_layers),
        "post_ln": _ln(v, "post_layernorm"),
    }


def clip_params_from_torch(sd: Dict, cfg: CLIPConfig, prefix: str = "") -> dict:
    """Full CLIPModel state dict -> pytree (with projections)."""
    s = _strip_prefix(sd, prefix)
    out = {
        "text_model": clip_text_tower_from_torch(s, cfg),
        "vision_model": clip_vision_tower_from_torch(s, cfg),
        "text_projection": _linear(s, "text_projection", bias=False),
        "visual_projection": _linear(s, "visual_projection", bias=False),
    }
    if "logit_scale" in s:
        out["logit_scale"] = _np(s["logit_scale"]).reshape(())
    return out


def siglip_params_from_torch(sd: Dict, cfg: SigLIPConfig, prefix: str = "") -> dict:
    """Full SiglipModel state dict -> pytree."""
    s = _strip_prefix(sd, prefix)
    t = _strip_prefix(s, "text_model.")
    v = _strip_prefix(s, "vision_model.")

    in_w = _np(v["head.attention.in_proj_weight"])  # (3d, d)
    in_b = _np(v["head.attention.in_proj_bias"])  # (3d,)
    d = in_w.shape[1]
    qw, kw, vw = in_w[:d], in_w[d : 2 * d], in_w[2 * d :]
    qb, kb, vb = in_b[:d], in_b[d : 2 * d], in_b[2 * d :]

    out = {
        "text_model": {
            "token_embedding": _np(t["embeddings.token_embedding.weight"]),
            "position_embedding": _np(t["embeddings.position_embedding.weight"]),
            "layers": _encoder_layers(t, "encoder", cfg.text.num_layers),
            "final_ln": _ln(t, "final_layer_norm"),
            "head": _linear(t, "head"),
        },
        "vision_model": {
            "patch_embedding": _conv_patch_embed(v, "embeddings.patch_embedding", bias=True),
            "position_embedding": _np(v["embeddings.position_embedding.weight"]),
            "layers": _encoder_layers(v, "encoder", cfg.vision.num_layers),
            "post_ln": _ln(v, "post_layernorm"),
            "map_head": {
                "probe": _np(v["head.probe"]),
                "attn": {
                    "q": {"w": qw.T, "b": qb},
                    "k": {"w": kw.T, "b": kb},
                    "v": {"w": vw.T, "b": vb},
                    "o": _linear(v, "head.attention.out_proj"),
                },
                "ln": _ln(v, "head.layernorm"),
                "fc1": _linear(v, "head.mlp.fc1"),
                "fc2": _linear(v, "head.mlp.fc2"),
            },
        },
    }
    # HF SigLIP stores these as shape-(1,) parameters; normalize to scalars
    if "logit_scale" in s:
        out["logit_scale"] = _np(s["logit_scale"]).reshape(())
    if "logit_bias" in s:
        out["logit_bias"] = _np(s["logit_bias"]).reshape(())
    return out


# ---------------------------------------------------------------------------
# Heads + full reference checkpoints
# ---------------------------------------------------------------------------


def fusion_head_from_torch(sd: Dict) -> dict:
    """Reference MultiModalFusionClassifier head params (fusion.py:129-147);
    ``cls`` Sequential indices: 0=LayerNorm, 1=Linear, 4=Linear."""
    return {
        "proj_t": _linear(sd, "proj_t"),
        "proj_i": _linear(sd, "proj_i"),
        "g_t": _linear(sd, "g_t"),
        "g_i": _linear(sd, "g_i"),
        "gate": _linear(sd, "gate"),
        "ln_fused": _ln(sd, "ln_fused"),
        "cls_ln": _ln(sd, "cls.0"),
        "cls_fc1": _linear(sd, "cls.1"),
        "cls_fc2": _linear(sd, "cls.4"),
    }


def mtl_head_from_torch(sd: Dict, num_tasks: int) -> dict:
    """Reference MultiTaskClassifier head params (multitask.py:91-128);
    ``shared_head`` Sequential index 1 = Linear; per-task heads are either a
    bare Linear or Sequential(0=Linear, 3=Linear)."""
    params = {
        "proj_t": _linear(sd, "proj_t"),
        "proj_i": _linear(sd, "proj_i"),
        "g_t": _linear(sd, "g_t"),
        "g_i": _linear(sd, "g_i"),
        "gate": _linear(sd, "gate"),
        "shared_fc": _linear(sd, "shared_head.1"),
    }
    heads = []
    for j in range(num_tasks):
        if f"heads.{j}.weight" in sd:
            heads.append({"fc": _linear(sd, f"heads.{j}")})
        else:
            heads.append(
                {"fc1": _linear(sd, f"heads.{j}.0"), "fc2": _linear(sd, f"heads.{j}.3")}
            )
    params["heads"] = heads
    if "log_vars" in sd:
        params["log_vars"] = _np(sd["log_vars"])
    return params


def fusion_model_from_torch(
    sd: Dict, backend: str, clip_cfg: Optional[CLIPConfig] = None,
    siglip_cfg: Optional[SigLIPConfig] = None, generic_cfg=None,
) -> dict:
    """Full reference fusion checkpoint (backbone.* + head)."""
    if backend == "clip":
        backbone = clip_params_from_torch(sd, clip_cfg, prefix="backbone.")
    elif backend == "generic":
        from multimodal_content_moderation_tpu.models.generic import (
            generic_params_from_torch,
        )

        backbone = generic_params_from_torch(sd, generic_cfg, prefix="backbone.")
    else:
        backbone = siglip_params_from_torch(sd, siglip_cfg, prefix="backbone.")
    return {"backbone": backbone, "head": fusion_head_from_torch(sd)}


def mtl_model_from_torch(
    sd: Dict, backend: str, num_tasks: int, clip_cfg: Optional[CLIPConfig] = None,
    siglip_cfg: Optional[SigLIPConfig] = None, generic_cfg=None,
) -> dict:
    """Full reference MTL checkpoint (tower_txt./tower_img. or backbone.)."""
    if backend == "clip":
        backbone = {
            "text_model": clip_text_tower_from_torch(
                sd, clip_cfg, prefix="tower_txt.text_model."
            ),
            "vision_model": clip_vision_tower_from_torch(
                sd, clip_cfg, prefix="tower_img.vision_model."
            ),
        }
    elif backend == "generic":
        from multimodal_content_moderation_tpu.models.generic import (
            generic_params_from_torch,
        )

        backbone = generic_params_from_torch(sd, generic_cfg, prefix="backbone.")
        backbone.pop("text_projection", None)
        backbone.pop("visual_projection", None)
        backbone.pop("logit_scale", None)
    else:
        backbone = siglip_params_from_torch(sd, siglip_cfg, prefix="backbone.")
    return {"backbone": backbone, "head": mtl_head_from_torch(sd, num_tasks)}


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Load a .safetensors file into a numpy state dict (torch-free)."""
    from safetensors.numpy import load_file

    return load_file(path)


def to_dtype(params, dtype):
    """Cast every floating leaf of a pytree to ``dtype``."""
    import jax
    import jax.numpy as jnp

    def cast(x):
        x = jnp.asarray(x)
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, params)
