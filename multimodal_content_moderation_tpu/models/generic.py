"""Generic dual-encoder backend — the reference's ``AutoModel`` path.

The reference accepts *any* CLIP-like dual encoder via ``AutoModel``
(``/root/reference/src/models/fusion.py:110-120``) and encodes through
``backbone.text_model`` / ``backbone.vision_model`` with pooler-output-or-
mean-pool fallbacks (``/root/reference/src/models/multitask.py:130-154``).
The TPU-native equivalent is a config-driven dual encoder supporting the two
standard HF tower architectures beyond CLIP/SigLIP:

- **post-LN BERT-style text towers** (``model_type: bert``, the
  roberta/camembert/xlm-roberta family with HF RoBERTa's pad-aware offset
  position ids, and ``distilbert`` with its own module naming, no token-type
  embeddings and no pooler): word + position (+ token-type) embeddings -> LN,
  post-LN encoder layers, optional tanh pooler over the CLS position.
- **pre-LN ViT-style vision towers** (``model_type: vit``): conv patch embed
  (expressed as patchify + dense -> a single clean MXU GEMM) + CLS token +
  learned positions, pre-LN encoder layers (reuses ``transformer_block``),
  final LN, optional tanh pooler.

This covers ``VisionTextDualEncoderModel`` checkpoints (ViT+BERT, the
canonical "third architecture" the reference would load via AutoModel and
this framework previously rejected). Pooling follows the reference fallback
exactly: pooler output when the tower has a pooler, otherwise the *plain*
(unmasked) mean over ``last_hidden_state`` (multitask.py:141 uses
``.mean(dim=1)`` with no mask). ``get_text_features``-style projected
features apply the checkpoint's ``text_projection``/``visual_projection``
(bias-free) on top of the pooled output, matching
``VisionTextDualEncoderModel.get_text_features``.

All towers honor the same TPU performance knobs as the CLIP/SigLIP towers
(``compute_dtype``/``scores_dtype``/``attention_impl``/``remat``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_content_moderation_tpu.ops.layers import (
    ACTIVATIONS,
    dense,
    dense_maybe_int8,
    dropout,
    layer_norm,
    mha,
    patchify,
    transformer_block,
)

NEG_INF = -1e9


@dataclasses.dataclass(frozen=True)
class GenericTextConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_positions: int = 512
    type_vocab_size: int = 2  # 0 = tower has no token-type embeddings
    pad_token_id: int = 0
    hidden_act: str = "gelu"
    layer_norm_eps: float = 1e-12
    # "bert": HF BertModel naming/structure. "distilbert": HF DistilBertModel
    # (no token-type embeddings, no pooler, transformer.layer.* naming).
    arch: str = "bert"
    # "absolute": positions 0..T-1 (BERT). "roberta": HF RoBERTa pad-aware ids
    # — position i of a non-pad token = pad_token_id + (# non-pad tokens so
    # far, 1-based); pads keep pad_token_id (RobertaEmbeddings.
    # create_position_ids_from_input_ids).
    position_style: str = "absolute"
    pooling: str = "pooler"  # "pooler" | "mean" | "cls"
    # Train-time dropout (HF Bert/DistilBert default 0.1 on both; the
    # reference fine-tunes with it active). Applied only when a dropout rng
    # is threaded through the forward — eval is always deterministic.
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    compute_dtype: str = "float32"
    scores_dtype: str = "float32"
    attention_impl: str = "xla"
    remat: bool = False


@dataclasses.dataclass(frozen=True)
class GenericVisionConfig:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    image_size: int = 224
    patch_size: int = 16
    num_channels: int = 3
    hidden_act: str = "gelu"
    layer_norm_eps: float = 1e-12
    pooling: str = "pooler"  # "pooler" | "mean" | "cls"
    compute_dtype: str = "float32"
    scores_dtype: str = "float32"
    attention_impl: str = "xla"
    remat: bool = False


@dataclasses.dataclass(frozen=True)
class GenericDualConfig:
    text: GenericTextConfig = dataclasses.field(default_factory=GenericTextConfig)
    vision: GenericVisionConfig = dataclasses.field(
        default_factory=GenericVisionConfig
    )
    # projection_dim > 0 => the checkpoint carries bias-free text/visual
    # projections (VisionTextDualEncoderConfig.projection_dim); 0 => raw
    # pooled towers (the reference MTL auto path never projects).
    projection_dim: int = 0

    @staticmethod
    def from_dict(d: Dict[str, Any]) -> "GenericDualConfig":
        """Parse an HF ``config.json`` with ``text_config``/``vision_config``
        sub-configs of known tower families (bert/roberta text, vit vision)."""
        t = d.get("text_config", {})
        v = d.get("vision_config", {})
        t_type = t.get("model_type", "bert")
        v_type = v.get("model_type", "vit")
        roberta_family = ("roberta", "camembert", "xlm-roberta")
        if t_type not in ("bert", "distilbert") + roberta_family:
            raise ValueError(
                f"generic backend: unsupported text tower model_type {t_type!r} "
                "(supported: bert/roberta/distilbert families; clip/siglip "
                "have dedicated backends)"
            )
        if v_type not in ("vit",):
            raise ValueError(
                f"generic backend: unsupported vision tower model_type {v_type!r} "
                "(supported: vit; clip/siglip have dedicated backends)"
            )
        if float(v.get("hidden_dropout_prob", 0.0)) > 0.0 or float(
            v.get("attention_probs_dropout_prob", 0.0)
        ) > 0.0:
            # HF ViT defaults to 0.0 on both; a nonzero value would silently
            # diverge at train time (the shared pre-LN block has no dropout
            # hook), so refuse rather than be silently wrong
            raise ValueError(
                "generic backend: nonzero vision-tower dropout is not "
                "supported (HF ViT defaults are 0.0)"
            )
        if t_type == "distilbert":
            # DistilBertConfig uses its own key names (dim/n_layers/n_heads/
            # hidden_dim/activation); no token-type embeddings, no pooler ->
            # the reference's getattr(out, "pooler_output", None) falls back
            # to the plain mean (multitask.py:141).
            text = GenericTextConfig(
                vocab_size=t.get("vocab_size", 30522),
                hidden_size=t.get("dim", 768),
                num_layers=t.get("n_layers", 6),
                num_heads=t.get("n_heads", 12),
                intermediate_size=t.get("hidden_dim", 3072),
                max_positions=t.get("max_position_embeddings", 512),
                type_vocab_size=0,
                pad_token_id=t.get("pad_token_id", 0),
                hidden_act=t.get("activation", "gelu"),
                layer_norm_eps=1e-12,
                arch="distilbert",
                pooling="mean",
                hidden_dropout_prob=t.get("dropout", 0.1),
                attention_probs_dropout_prob=t.get("attention_dropout", 0.1),
            )
        else:
            text = GenericTextConfig(
                vocab_size=t.get("vocab_size", 30522),
                hidden_size=t.get("hidden_size", 768),
                num_layers=t.get("num_hidden_layers", 12),
                num_heads=t.get("num_attention_heads", 12),
                intermediate_size=t.get("intermediate_size", 3072),
                max_positions=t.get("max_position_embeddings", 512),
                type_vocab_size=t.get("type_vocab_size", 2),
                pad_token_id=t.get(
                    "pad_token_id", 1 if t_type in roberta_family else 0
                ),
                hidden_act=t.get("hidden_act", "gelu"),
                layer_norm_eps=t.get("layer_norm_eps", 1e-12),
                position_style=(
                    "roberta" if t_type in roberta_family else "absolute"
                ),
                hidden_dropout_prob=t.get("hidden_dropout_prob", 0.1),
                attention_probs_dropout_prob=t.get(
                    "attention_probs_dropout_prob", 0.1
                ),
            )
        return GenericDualConfig(
            text=text,
            vision=GenericVisionConfig(
                hidden_size=v.get("hidden_size", 768),
                num_layers=v.get("num_hidden_layers", 12),
                num_heads=v.get("num_attention_heads", 12),
                intermediate_size=v.get("intermediate_size", 3072),
                image_size=v.get("image_size", 224),
                patch_size=v.get("patch_size", 16),
                num_channels=v.get("num_channels", 3),
                hidden_act=v.get("hidden_act", "gelu"),
                layer_norm_eps=v.get("layer_norm_eps", 1e-12),
            ),
            projection_dim=d.get("projection_dim", 0) or 0,
        )


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _linear_init(key, d_in, d_out, dtype):
    k1, _ = jax.random.split(key)
    scale = 1.0 / np.sqrt(d_in)
    return {
        "w": jax.random.uniform(k1, (d_in, d_out), dtype, -scale, scale),
        "b": jnp.zeros((d_out,), dtype),
    }


def _ln_init(d, dtype):
    return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}


def _layer_init(key, d, inter, dtype):
    ks = jax.random.split(key, 6)
    return {
        "ln1": _ln_init(d, dtype),
        "attn": {
            "q": _linear_init(ks[0], d, d, dtype),
            "k": _linear_init(ks[1], d, d, dtype),
            "v": _linear_init(ks[2], d, d, dtype),
            "o": _linear_init(ks[3], d, d, dtype),
        },
        "ln2": _ln_init(d, dtype),
        "fc1": _linear_init(ks[4], d, inter, dtype),
        "fc2": _linear_init(ks[5], inter, d, dtype),
    }


def generic_init(rng: jax.Array, cfg: GenericDualConfig, dtype=jnp.float32) -> dict:
    kt, kv, kp = jax.random.split(rng, 3)
    t, v = cfg.text, cfg.vision
    tks = jax.random.split(kt, t.num_layers + 4)
    vks = jax.random.split(kv, v.num_layers + 4)
    n_patches = (v.image_size // v.patch_size) ** 2
    text_model = {
        "word_embeddings": jax.random.normal(
            tks[0], (t.vocab_size, t.hidden_size), dtype
        )
        * 0.02,
        "position_embeddings": jax.random.normal(
            tks[1], (t.max_positions, t.hidden_size), dtype
        )
        * 0.02,
        "emb_ln": _ln_init(t.hidden_size, dtype),
        "layers": [
            _layer_init(tks[4 + i], t.hidden_size, t.intermediate_size, dtype)
            for i in range(t.num_layers)
        ],
    }
    if t.type_vocab_size:
        text_model["token_type_embeddings"] = (
            jax.random.normal(tks[2], (t.type_vocab_size, t.hidden_size), dtype)
            * 0.02
        )
    params = {
        "text_model": text_model,
        "vision_model": {
            "cls_token": jax.random.normal(vks[0], (1, 1, v.hidden_size), dtype)
            * 0.02,
            "position_embeddings": jax.random.normal(
                vks[1], (n_patches + 1, v.hidden_size), dtype
            )
            * 0.02,
            "patch_embedding": _linear_init(
                vks[2],
                v.num_channels * v.patch_size * v.patch_size,
                v.hidden_size,
                dtype,
            ),
            "layers": [
                _layer_init(vks[4 + i], v.hidden_size, v.intermediate_size, dtype)
                for i in range(v.num_layers)
            ],
            "post_ln": _ln_init(v.hidden_size, dtype),
        },
    }
    if cfg.text.pooling == "pooler":
        params["text_model"]["pooler"] = _linear_init(
            tks[3], t.hidden_size, t.hidden_size, dtype
        )
    if cfg.vision.pooling == "pooler":
        params["vision_model"]["pooler"] = _linear_init(
            vks[3], v.hidden_size, v.hidden_size, dtype
        )
    if cfg.projection_dim:
        k1, k2 = jax.random.split(kp)
        params["text_projection"] = {
            "w": jax.random.normal(
                k1, (t.hidden_size, cfg.projection_dim), dtype
            )
            * 0.02
        }
        params["visual_projection"] = {
            "w": jax.random.normal(
                k2, (v.hidden_size, cfg.projection_dim), dtype
            )
            * 0.02
        }
        # VisionTextDualEncoderModel always carries a scalar logit_scale
        # (logit_scale_init_value default 2.6592). Unused by the fusion/MTL
        # forwards, but kept so init and checkpoint-converted pytrees have
        # identical structure (Orbax restore templates require it) and so
        # exports strict-load in the reference.
        params["logit_scale"] = jnp.asarray(2.6592, dtype)
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _postln_block(
    x: jnp.ndarray,
    p: dict,
    cfg: GenericTextConfig,
    key_mask: Optional[jnp.ndarray],
    dropout_rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """BERT-style post-LN encoder layer: attn -> +res -> LN,
    mlp -> +res -> LN (HF BertLayer semantics). With a ``dropout_rng``
    (train mode) the HF dropout sites are active: attention probabilities
    (BertSelfAttention), the post-attention dense (BertSelfOutput) and the
    MLP output dense (BertOutput), each before its residual add."""

    def block(x, p, key_mask, rng):
        act = ACTIVATIONS[cfg.hidden_act]
        if rng is not None:
            r_probs, r_attn, r_mlp = jax.random.split(rng, 3)
        else:
            r_probs = r_attn = r_mlp = None
        attn_out = mha(
            x, x, p["attn"], cfg.num_heads,
            impl=cfg.attention_impl, scores_dtype=cfg.scores_dtype,
            key_mask=key_mask,
            probs_dropout=cfg.attention_probs_dropout_prob,
            dropout_rng=r_probs,
        )
        attn_out = dropout(attn_out, cfg.hidden_dropout_prob, r_attn)
        x = layer_norm(x + attn_out, p["ln1"], cfg.layer_norm_eps)
        y = act(dense_maybe_int8(x, p["fc1"]))  # opt-in int8 fc1 (ops/quant)
        y = dropout(dense(y, p["fc2"]), cfg.hidden_dropout_prob, r_mlp)
        return layer_norm(x + y, p["ln2"], cfg.layer_norm_eps)

    if cfg.remat:
        return jax.checkpoint(block)(x, p, key_mask, dropout_rng)
    return block(x, p, key_mask, dropout_rng)


def _pool(hidden: jnp.ndarray, p: dict, pooling: str, out_dtype) -> jnp.ndarray:
    """Reference pooling fallback chain (multitask.py:130-154): tanh pooler
    when the tower has one, else plain unmasked mean / raw CLS. A config that
    says "pooler" over a checkpoint converted without pooler weights
    (add_pooling_layer=False) falls back to the mean — exactly the
    reference's runtime ``pooler_output is None`` branch."""
    if pooling == "pooler" and "pooler" in p:
        return jnp.tanh(dense(hidden[:, 0], p["pooler"])).astype(out_dtype)
    if pooling == "cls":
        return hidden[:, 0].astype(out_dtype)
    return hidden.mean(axis=1).astype(out_dtype)


def generic_text_hidden(
    params: dict,
    input_ids: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray],
    cfg: GenericTextConfig,
    dropout_rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """BERT-style tower -> last_hidden_state [B, T, D].

    ``dropout_rng`` enables HF train-mode dropout (embedding output,
    attention probabilities, per-layer dense outputs at
    ``hidden_dropout_prob``/``attention_probs_dropout_prob``); ``None`` =
    eval (deterministic, the parity path)."""
    p = params["text_model"]
    dt = jnp.dtype(cfg.compute_dtype)
    T = input_ids.shape[1]
    if cfg.position_style == "roberta":
        # HF RobertaEmbeddings.create_position_ids_from_input_ids: non-pad
        # token i gets pad_token_id + its 1-based count of non-pad tokens;
        # pad positions stay at pad_token_id.
        nonpad = (input_ids != cfg.pad_token_id).astype(jnp.int32)
        pos_ids = jnp.cumsum(nonpad, axis=1) * nonpad + cfg.pad_token_id
        pos = p["position_embeddings"][pos_ids]
    else:
        pos = p["position_embeddings"][None, :T]
    x = p["word_embeddings"][input_ids] + pos
    if "token_type_embeddings" in p:
        x = x + p["token_type_embeddings"][0][None, None]
    x = layer_norm(x.astype(dt), p["emb_ln"], cfg.layer_norm_eps)
    rngs = [None] * (len(p["layers"]) + 1)
    if dropout_rng is not None:
        rngs = list(jax.random.split(dropout_rng, len(p["layers"]) + 1))
    x = dropout(x, cfg.hidden_dropout_prob, rngs[0])  # BertEmbeddings dropout
    key_mask = key_mask_from(attention_mask)
    for layer, rng in zip(p["layers"], rngs[1:]):
        x = _postln_block(x, layer, cfg, key_mask, rng)
    return x


def key_mask_from(attention_mask: Optional[jnp.ndarray]):
    """[B, T] 0/1 attention mask -> additive fp32 key bias (or None)."""
    if attention_mask is None:
        return None
    return (attention_mask.astype(jnp.float32) - 1.0) * -NEG_INF


def generic_text_pooled(
    params: dict,
    input_ids: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray],
    cfg: GenericTextConfig,
    dropout_rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    hidden = generic_text_hidden(
        params, input_ids, attention_mask, cfg, dropout_rng
    )
    return _pool(hidden, params["text_model"], cfg.pooling, jnp.float32)


def generic_vision_tokens(
    params: dict, pixel_values: jnp.ndarray, cfg: GenericVisionConfig
) -> jnp.ndarray:
    """Patch embed + CLS + positions: [B, 1+N, D] input tokens."""
    p = params["vision_model"]
    dt = jnp.dtype(cfg.compute_dtype)
    patches = patchify(pixel_values.astype(dt), cfg.patch_size)
    tokens = dense(patches, p["patch_embedding"])
    B = tokens.shape[0]
    cls = jnp.broadcast_to(
        p["cls_token"].astype(dt), (B, 1, cfg.hidden_size)
    )
    x = jnp.concatenate([cls, tokens], axis=1)
    return x + p["position_embeddings"].astype(dt)[None]


def generic_vision_hidden_from_tokens(
    params: dict, x: jnp.ndarray, cfg: GenericVisionConfig
) -> jnp.ndarray:
    p = params["vision_model"]
    for layer in p["layers"]:
        x = transformer_block(
            x, layer, cfg.num_heads, cfg.hidden_act, None, cfg.layer_norm_eps,
            remat=cfg.remat,
            attention_impl=cfg.attention_impl,
            scores_dtype=cfg.scores_dtype,
        )
    return layer_norm(x, p["post_ln"], cfg.layer_norm_eps)


def generic_vision_pooled(
    params: dict, pixel_values: jnp.ndarray, cfg: GenericVisionConfig
) -> jnp.ndarray:
    x = generic_vision_tokens(params, pixel_values, cfg)
    hidden = generic_vision_hidden_from_tokens(params, x, cfg)
    return _pool(hidden, params["vision_model"], cfg.pooling, jnp.float32)


def generic_text_features(
    params: dict,
    input_ids: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray],
    cfg: GenericDualConfig,
    dropout_rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """``get_text_features`` parity: pooled tower, then the checkpoint's
    bias-free text projection when present."""
    pooled = generic_text_pooled(
        params, input_ids, attention_mask, cfg.text, dropout_rng
    )
    proj = params.get("text_projection")
    if proj is not None:
        pooled = pooled @ proj["w"].astype(pooled.dtype)
    return pooled


def generic_image_features(
    params: dict, pixel_values: jnp.ndarray, cfg: GenericDualConfig
) -> jnp.ndarray:
    pooled = generic_vision_pooled(params, pixel_values, cfg.vision)
    proj = params.get("visual_projection")
    if proj is not None:
        pooled = pooled @ proj["w"].astype(pooled.dtype)
    return pooled


def generic_image_features_from_tokens(
    params: dict, tokens: jnp.ndarray, cfg: GenericDualConfig
) -> jnp.ndarray:
    """``get_image_features`` from already-embedded patch tokens (the u8
    wire-format path: ops/pallas_image embeds, this adds CLS+positions,
    runs the trunk, pools, and projects)."""
    v = cfg.vision
    p = params["vision_model"]
    B = tokens.shape[0]
    cls = jnp.broadcast_to(
        p["cls_token"].astype(tokens.dtype), (B, 1, v.hidden_size)
    )
    x = jnp.concatenate([cls, tokens], axis=1)
    x = x + p["position_embeddings"].astype(tokens.dtype)[None]
    hidden = generic_vision_hidden_from_tokens(params, x, v)
    pooled = _pool(hidden, p, v.pooling, jnp.float32)
    proj = params.get("visual_projection")
    if proj is not None:
        pooled = pooled @ proj["w"].astype(pooled.dtype)
    return pooled


# ---------------------------------------------------------------------------
# Torch checkpoint conversion (VisionTextDualEncoderModel / bare towers)
# ---------------------------------------------------------------------------


def _np_(x) -> np.ndarray:
    return x.detach().cpu().numpy() if hasattr(x, "detach") else np.asarray(x)


def _lin(sd: Dict, name: str, bias: bool = True) -> dict:
    out = {"w": _np_(sd[f"{name}.weight"]).T}
    if bias:
        out["b"] = _np_(sd[f"{name}.bias"])
    return out


def _ln(sd: Dict, name: str) -> dict:
    return {"scale": _np_(sd[f"{name}.weight"]), "bias": _np_(sd[f"{name}.bias"])}


def bert_tower_from_torch(
    sd: Dict, cfg: GenericTextConfig, prefix: str = "text_model."
) -> dict:
    """HF BertModel state dict -> our post-LN tower params."""
    p = prefix
    layers = []
    for i in range(cfg.num_layers):
        lp = f"{p}encoder.layer.{i}."
        layers.append(
            {
                "attn": {
                    "q": _lin(sd, lp + "attention.self.query"),
                    "k": _lin(sd, lp + "attention.self.key"),
                    "v": _lin(sd, lp + "attention.self.value"),
                    "o": _lin(sd, lp + "attention.output.dense"),
                },
                "ln1": _ln(sd, lp + "attention.output.LayerNorm"),
                "fc1": _lin(sd, lp + "intermediate.dense"),
                "fc2": _lin(sd, lp + "output.dense"),
                "ln2": _ln(sd, lp + "output.LayerNorm"),
            }
        )
    out = {
        "word_embeddings": _np_(sd[f"{p}embeddings.word_embeddings.weight"]),
        "position_embeddings": _np_(
            sd[f"{p}embeddings.position_embeddings.weight"]
        ),
        "emb_ln": _ln(sd, f"{p}embeddings.LayerNorm"),
        "layers": layers,
    }
    if f"{p}embeddings.token_type_embeddings.weight" in sd:
        out["token_type_embeddings"] = _np_(
            sd[f"{p}embeddings.token_type_embeddings.weight"]
        )
    if f"{p}pooler.dense.weight" in sd:
        out["pooler"] = _lin(sd, f"{p}pooler.dense")
    return out


def distilbert_tower_from_torch(
    sd: Dict, cfg: GenericTextConfig, prefix: str = "text_model."
) -> dict:
    """HF DistilBertModel state dict -> our post-LN tower params. Same
    post-LN block structure as BERT under different module names
    (transformer.layer.i.{attention.{q,k,v,out}_lin, sa_layer_norm,
    ffn.{lin1,lin2}, output_layer_norm}); no token-type embeddings, no
    pooler."""
    p = prefix
    layers = []
    for i in range(cfg.num_layers):
        lp = f"{p}transformer.layer.{i}."
        layers.append(
            {
                "attn": {
                    "q": _lin(sd, lp + "attention.q_lin"),
                    "k": _lin(sd, lp + "attention.k_lin"),
                    "v": _lin(sd, lp + "attention.v_lin"),
                    "o": _lin(sd, lp + "attention.out_lin"),
                },
                "ln1": _ln(sd, lp + "sa_layer_norm"),
                "fc1": _lin(sd, lp + "ffn.lin1"),
                "fc2": _lin(sd, lp + "ffn.lin2"),
                "ln2": _ln(sd, lp + "output_layer_norm"),
            }
        )
    return {
        "word_embeddings": _np_(sd[f"{p}embeddings.word_embeddings.weight"]),
        "position_embeddings": _np_(
            sd[f"{p}embeddings.position_embeddings.weight"]
        ),
        "emb_ln": _ln(sd, f"{p}embeddings.LayerNorm"),
        "layers": layers,
    }


def vit_tower_from_torch(
    sd: Dict, cfg: GenericVisionConfig, prefix: str = "vision_model."
) -> dict:
    """HF ViTModel state dict -> our pre-LN tower params. The patch conv is
    re-expressed as a dense over flattened patches (one clean MXU GEMM):
    conv weight [D, C, ph, pw] -> kernel [(C*ph*pw), D] matching
    ``ops.layers.patchify`` channel-major flattening."""
    p = prefix
    w = _np_(sd[f"{p}embeddings.patch_embeddings.projection.weight"])
    d = w.shape[0]
    kernel = w.reshape(d, -1).T  # [C*ph*pw, D], patchify flattens (C, ph, pw)
    layers = []
    for i in range(cfg.num_layers):
        lp = f"{p}encoder.layer.{i}."
        layers.append(
            {
                "ln1": _ln(sd, lp + "layernorm_before"),
                "attn": {
                    "q": _lin(sd, lp + "attention.attention.query"),
                    "k": _lin(sd, lp + "attention.attention.key"),
                    "v": _lin(sd, lp + "attention.attention.value"),
                    "o": _lin(sd, lp + "attention.output.dense"),
                },
                "ln2": _ln(sd, lp + "layernorm_after"),
                "fc1": _lin(sd, lp + "intermediate.dense"),
                "fc2": _lin(sd, lp + "output.dense"),
            }
        )
    out = {
        "cls_token": _np_(sd[f"{p}embeddings.cls_token"]),
        "position_embeddings": _np_(sd[f"{p}embeddings.position_embeddings"])[0],
        "patch_embedding": {
            "w": kernel,
            "b": _np_(sd[f"{p}embeddings.patch_embeddings.projection.bias"]),
        },
        "layers": layers,
        "post_ln": _ln(sd, f"{p}layernorm"),
    }
    if f"{p}pooler.dense.weight" in sd:
        out["pooler"] = _lin(sd, f"{p}pooler.dense")
    return out


def generic_params_from_torch(
    sd: Dict, cfg: GenericDualConfig, prefix: str = ""
) -> dict:
    """VisionTextDualEncoderModel (or same-named towers) -> param pytree."""
    text_fn = (
        distilbert_tower_from_torch
        if cfg.text.arch == "distilbert"
        else bert_tower_from_torch
    )
    params = {
        "text_model": text_fn(sd, cfg.text, f"{prefix}text_model."),
        "vision_model": vit_tower_from_torch(
            sd, cfg.vision, f"{prefix}vision_model."
        ),
    }
    if f"{prefix}text_projection.weight" in sd:
        params["text_projection"] = {
            "w": _np_(sd[f"{prefix}text_projection.weight"]).T
        }
    if f"{prefix}visual_projection.weight" in sd:
        params["visual_projection"] = {
            "w": _np_(sd[f"{prefix}visual_projection.weight"]).T
        }
    # VisionTextDualEncoderModel carries a scalar logit_scale; unused by the
    # fusion/MTL forwards but kept so export round-trips the full checkpoint.
    if f"{prefix}logit_scale" in sd:
        params["logit_scale"] = _np_(sd[f"{prefix}logit_scale"])
    return params
