"""Shared-backbone multi-task classifier (TPU-native).

Exact re-derivation of the reference ``MultiTaskClassifier``
(src/models/multitask.py:16-227): shared projection + gated fusion over
tower-pooled features (NOT L2-normalized, unlike the fusion head), a shared
Dropout->Linear->GELU->Dropout trunk, one binary head per task (optionally
with a hidden layer), per-task BCE with per-task pos_weight, and optional
Kendall-style uncertainty weighting ``exp(-log_var)*L + 0.5*log_var``.

Backends:
- "clip": separate CLIP text/vision towers; text feature = EOS-position
  pooler output, image feature = post-LN CLS pooler output
  (multitask.py:130-154 pooling fallbacks)
- "auto"/"siglip": SigLIP text pooler (last-token + head) and vision MAP-head
  pooler
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from multimodal_content_moderation_tpu.models import clip as clip_mod
from multimodal_content_moderation_tpu.models import generic as generic_mod
from multimodal_content_moderation_tpu.models import siglip as siglip_mod
from multimodal_content_moderation_tpu.models.fusion import _head_dense_init
from multimodal_content_moderation_tpu.ops.layers import dense, dropout, gelu_exact
from multimodal_content_moderation_tpu.ops.losses import bce_with_logits


def mtl_head_init(
    rng: jax.Array,
    text_dim: int,
    image_dim: int,
    num_tasks: int,
    fusion_dim: int = 512,
    head_hidden_dim: int = 0,
    learnable_task_weights: bool = False,
    dtype=jnp.float32,
) -> dict:
    ks = jax.random.split(rng, 6 + 2 * num_tasks)
    params = {
        "proj_t": _head_dense_init(ks[0], text_dim, fusion_dim, dtype),
        "proj_i": _head_dense_init(ks[1], image_dim, fusion_dim, dtype),
        "g_t": _head_dense_init(ks[2], fusion_dim, fusion_dim, dtype),
        "g_i": _head_dense_init(ks[3], fusion_dim, fusion_dim, dtype),
        "gate": _head_dense_init(ks[4], fusion_dim * 2 + 2, fusion_dim, dtype),
        "shared_fc": _head_dense_init(ks[5], fusion_dim, fusion_dim, dtype),
    }
    heads = []
    for j in range(num_tasks):
        if head_hidden_dim and head_hidden_dim > 0:
            heads.append(
                {
                    "fc1": _head_dense_init(ks[6 + 2 * j], fusion_dim, head_hidden_dim, dtype),
                    "fc2": _head_dense_init(ks[7 + 2 * j], head_hidden_dim, 1, dtype),
                }
            )
        else:
            heads.append({"fc": _head_dense_init(ks[6 + 2 * j], fusion_dim, 1, dtype)})
    params["heads"] = heads
    if learnable_task_weights:
        params["log_vars"] = jnp.zeros((num_tasks,), dtype)
    return params


def mtl_head_apply(
    params: dict,
    tfeat: jnp.ndarray,
    vfeat: jnp.ndarray,
    text_present: jnp.ndarray,
    image_present: jnp.ndarray,
    dropout_rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """MTL head forward -> logits [B, num_tasks].

    Exact math of reference src/models/multitask.py:184-207.
    """
    tp = dense(tfeat, params["proj_t"])
    vp = dense(vfeat, params["proj_i"])

    presence = jnp.stack([text_present, image_present], axis=1).astype(tp.dtype)
    zt = jnp.tanh(dense(tp, params["g_t"]))
    zi = jnp.tanh(dense(vp, params["g_i"]))
    g = jax.nn.sigmoid(dense(jnp.concatenate([tp, vp, presence], axis=1), params["gate"]))

    fused = jnp.where(
        (image_present < 0.5)[:, None],
        zt,
        jnp.where((text_present < 0.5)[:, None], zi, g * zt + (1.0 - g) * zi),
    )

    # Shared trunk: Dropout -> Linear -> GELU -> Dropout
    num_heads = len(params["heads"])
    rngs = (
        (None,) * (2 + num_heads)
        if dropout_rng is None
        else tuple(jax.random.split(dropout_rng, 2 + num_heads))
    )
    y = dropout(fused, 0.2, rngs[0])
    y = gelu_exact(dense(y, params["shared_fc"]))
    shared = dropout(y, 0.2, rngs[1])

    logits = []
    for j, head in enumerate(params["heads"]):
        if "fc" in head:
            logit = dense(shared, head["fc"])
        else:
            # hidden task head: Linear -> GELU -> Dropout(0.1) -> Linear
            # (reference src/models/multitask.py:106-117)
            h = gelu_exact(dense(shared, head["fc1"]))
            h = dropout(h, 0.1, rngs[2 + j])
            logit = dense(h, head["fc2"])
        logits.append(logit[:, 0])
    return jnp.stack(logits, axis=1)


def mtl_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    pos_weight: Optional[jnp.ndarray] = None,
    log_vars: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Per-task BCE mean, with optional uncertainty weighting
    (reference src/models/multitask.py:211-225)."""
    num_tasks = logits.shape[1]
    per_task = []
    for j in range(num_tasks):
        pw = None if pos_weight is None else pos_weight[j]
        lj = bce_with_logits(logits[:, j], labels[:, j], pos_weight=pw)
        if log_vars is not None:
            lj = jnp.exp(-log_vars[j]) * lj + 0.5 * log_vars[j]
        per_task.append(lj)
    return jnp.mean(jnp.stack(per_task))


@dataclasses.dataclass(frozen=True)
class MultiTaskModel:
    """Backbone towers + MTL head with the reference forward contract."""

    backend: str = "clip"  # "clip" | "auto" | "siglip" | "generic"
    clip_config: Optional[clip_mod.CLIPConfig] = None
    siglip_config: Optional[siglip_mod.SigLIPConfig] = None
    generic_config: Optional["generic_mod.GenericDualConfig"] = None
    num_tasks: int = 5
    fusion_dim: int = 512
    head_hidden_dim: int = 0
    learnable_task_weights: bool = False
    # uint8 wire format (see models/u8wire.py)
    image_mean: Optional[tuple] = None
    image_std: Optional[tuple] = None
    embed_impl: str = "reference"

    @staticmethod
    def create(
        backend: str = "clip",
        num_tasks: int = 5,
        fusion_dim: int = 512,
        head_hidden_dim: int = 0,
        learnable_task_weights: bool = False,
        clip_config: Optional[clip_mod.CLIPConfig] = None,
        siglip_config: Optional[siglip_mod.SigLIPConfig] = None,
        generic_config=None,
    ) -> "MultiTaskModel":
        backend = backend.lower()
        if backend == "clip":
            clip_config = clip_config or clip_mod.CLIPConfig.base_patch32()
        elif backend == "generic":
            generic_config = generic_config or generic_mod.GenericDualConfig()
        else:
            siglip_config = siglip_config or siglip_mod.SigLIPConfig.base_patch16_224()
        return MultiTaskModel(
            backend=backend,
            clip_config=clip_config,
            siglip_config=siglip_config,
            generic_config=generic_config,
            num_tasks=num_tasks,
            fusion_dim=fusion_dim,
            head_hidden_dim=head_hidden_dim or 0,
            learnable_task_weights=learnable_task_weights,
        )

    @property
    def tower_dims(self) -> Tuple[int, int]:
        """(text_dim, image_dim) of the pooled tower features."""
        if self.backend == "clip":
            return self.clip_config.text.hidden_size, self.clip_config.vision.hidden_size
        if self.backend == "generic":
            # raw tower widths: the reference MTL auto path never projects
            # (multitask.py:130-154 encodes through the bare submodules)
            return (
                self.generic_config.text.hidden_size,
                self.generic_config.vision.hidden_size,
            )
        return (
            self.siglip_config.text.projection_size,
            self.siglip_config.vision.hidden_size,
        )

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
            # The MTL model uses bare towers (CLIPText/VisionModel), which
            # carry no projections or logit_scale.
            backbone.pop("text_projection", None)
            backbone.pop("visual_projection", None)
            backbone.pop("logit_scale", None)
        elif self.backend == "generic":
            # MTL pools the raw towers (multitask.py:130-154) — the
            # checkpoint-level projections/logit_scale are popped by
            # init_from_encoder_dir, so from-scratch init must not create
            # them either (Orbax restore templates come from init)
            gcfg = dataclasses.replace(self.generic_config, projection_dim=0)
            backbone = generic_mod.generic_init(kb, gcfg, dtype)
            # raw towers only (reference MTL auto path, multitask.py:130-154)
            backbone.pop("text_projection", None)
            backbone.pop("visual_projection", None)
        else:
            backbone = siglip_mod.siglip_init(kb, self.siglip_config, dtype)
        tdim, idim = self.tower_dims
        head = mtl_head_init(
            kh,
            tdim,
            idim,
            self.num_tasks,
            self.fusion_dim,
            self.head_hidden_dim,
            self.learnable_task_weights,
            dtype,
        )
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
        has it (generic BERT-family text towers — see FusionModel.encode)."""
        bp = params["backbone"]
        u8 = batch.get("patches_u8")
        if self.backend == "clip":
            t = clip_mod.clip_text_pooled(
                bp, batch["input_ids"], batch.get("attention_mask"), self.clip_config.text
            )
            if u8 is not None:
                v = clip_mod.clip_vision_pooled_from_tokens(
                    bp, self._embed_u8(bp, u8), self.clip_config.vision
                )
            else:
                v = clip_mod.clip_vision_pooled(
                    bp, batch["pixel_values"], self.clip_config.vision
                )
        elif self.backend == "generic":
            gcfg = self.generic_config
            t = generic_mod.generic_text_pooled(
                bp, batch["input_ids"], batch.get("attention_mask"), gcfg.text,
                dropout_rng=dropout_rng,
            )
            if u8 is not None:
                tokens = self._embed_u8(bp, u8)
                p = bp["vision_model"]
                cls = jnp.broadcast_to(
                    p["cls_token"].astype(tokens.dtype),
                    (tokens.shape[0], 1, gcfg.vision.hidden_size),
                )
                x = jnp.concatenate([cls, tokens], axis=1)
                x = x + p["position_embeddings"].astype(tokens.dtype)[None]
                hidden = generic_mod.generic_vision_hidden_from_tokens(
                    bp, x, gcfg.vision
                )
                v = generic_mod._pool(hidden, p, gcfg.vision.pooling, jnp.float32)
            else:
                v = generic_mod.generic_vision_pooled(
                    bp, batch["pixel_values"], gcfg.vision
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
                v = siglip_mod.siglip_image_features(
                    bp, batch["pixel_values"], self.siglip_config
                )
        return t, v

    def apply(
        self,
        params: dict,
        batch: Dict[str, jnp.ndarray],
        dropout_rng: Optional[jax.Array] = None,
        pos_weight: Optional[jnp.ndarray] = None,
    ) -> Dict[str, Any]:
        enc_rng = None
        if dropout_rng is not None and self.backend == "generic":
            dropout_rng, enc_rng = jax.random.split(dropout_rng)
        tfeat, vfeat = self.encode(params, batch, dropout_rng=enc_rng)
        logits = mtl_head_apply(
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
            out["loss"] = mtl_loss(
                logits, labels, pos_weight=pos_weight, log_vars=params["head"].get("log_vars")
            )
        return out
