"""Pure-JAX compute primitives shared by all encoders and heads.

Design notes (TPU-first):

- Linear weights are stored ``(in_features, out_features)`` so every dense is
  a plain ``x @ w`` that XLA tiles straight onto the MXU; HF/torch weights are
  transposed once at conversion time (models/convert.py), never per-step.
- Patch embedding is a reshape/transpose + one large GEMM (``patchify`` +
  ``dense``) rather than a convolution: for stride==kernel "conv" the two are
  mathematically identical, and the GEMM form both maps better to the MXU and
  composes with the Pallas fused normalize+patchify kernel (ops/pallas_image).
- All matmuls request ``preferred_element_type=float32`` so bf16 inputs
  accumulate in fp32 (required to hit 1e-3 logit parity vs the fp32 torch
  reference).
- Softmax/LayerNorm statistics are computed in fp32 regardless of the compute
  dtype.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """CLIP's activation: ``x * sigmoid(1.702 * x)``."""
    return x * jax.nn.sigmoid(1.702 * x)


def gelu_tanh(x: jnp.ndarray) -> jnp.ndarray:
    """The tanh-approximate GELU used by SigLIP (= torch ``gelu_pytorch_tanh``)."""
    return jax.nn.gelu(x, approximate=True)


def gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf) GELU, used by torch ``nn.GELU()`` in the reference heads."""
    return jax.nn.gelu(x, approximate=False)


ACTIVATIONS = {
    "quick_gelu": quick_gelu,
    "gelu_pytorch_tanh": gelu_tanh,
    "gelu_tanh": gelu_tanh,
    "gelu": gelu_exact,
}


def dense(x: jnp.ndarray, p: dict) -> jnp.ndarray:
    """Affine layer. ``p = {"w": (in, out), "b": (out,)} `` (b optional).

    Weights are cast to the activation dtype (mixed precision: fp32 master
    params, bf16 compute — XLA folds the cast) with fp32 MXU accumulation.
    """
    w = p["w"]
    if w.dtype != x.dtype:
        w = w.astype(x.dtype)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    if "b" in p and p["b"] is not None:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def dense_maybe_int8(x: jnp.ndarray, p: dict) -> jnp.ndarray:
    """``dense`` that honors an int8-quantized leaf (``ops/quant.py`` swaps
    ``{"w"}`` for ``{"w_i8", "scale"}``; dispatch is pytree-structural, so
    it resolves at trace time)."""
    if "w_i8" in p:
        from multimodal_content_moderation_tpu.ops.quant import dense_int8

        return dense_int8(x, p)
    return dense(x, p)


def layer_norm(x: jnp.ndarray, p: dict, eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm over the last axis with fp32 statistics.

    ``p = {"scale": (d,), "bias": (d,)}``. Matches torch ``nn.LayerNorm``
    (biased variance, eps inside the sqrt).
    """
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def dropout(x: jnp.ndarray, rate: float, rng: Optional[jax.Array]) -> jnp.ndarray:
    """Inverted dropout. Identity when ``rng is None`` (eval) or rate == 0."""
    if rng is None or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


def patchify(pixel_values: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """[B, C, H, W] -> [B, (H/p)*(W/p), C*p*p] non-overlapping patches.

    Equivalent to the im2col of a stride==kernel conv; the channel-major
    (C, ph, pw) ordering inside each patch matches torch
    ``Conv2d.weight.reshape(d, -1)`` so a converted conv kernel multiplies
    correctly.
    """
    B, C, H, W = pixel_values.shape
    p = patch_size
    nh, nw = H // p, W // p
    x = pixel_values.reshape(B, C, nh, p, nw, p)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # [B, nh, nw, C, p, p]
    return x.reshape(B, nh * nw, C * p * p)


def mha(
    x_q: jnp.ndarray,
    x_kv: jnp.ndarray,
    p: dict,
    num_heads: int,
    mask: Optional[jnp.ndarray] = None,
    impl: str = "xla",
    scores_dtype: str = "float32",
    causal: bool = False,
    key_mask: Optional[jnp.ndarray] = None,
    probs_dropout: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Multi-head attention with fp32 softmax.

    ``p`` holds ``q``/``k``/``v``/``o`` dense params. ``mask`` is an additive
    fp32 bias broadcastable to [B, heads, Tq, Tk] (use large negatives for
    masked positions, matching the torch additive-mask convention).
    ``causal`` and ``key_mask`` ([B, Tk] additive fp32 padding bias) are the
    structured alternative: on the Pallas path they are applied IN-KERNEL so
    no dense [T, S] mask ever reaches HBM — prefer them over ``mask`` for
    long sequences.

    ``impl`` selects the attention core: "xla" (einsum softmax chain —
    measured faster for the short-sequence encoders here) or "pallas" (the
    fused kernels in ops/pallas_attention — the long-context path; runs in
    interpret mode on CPU).

    ``scores_dtype="bfloat16"`` stores the attention-score tensor in bf16
    (softmax statistics still fp32): +17% eval throughput measured on v5e,
    at the cost of bf16 rounding on the scores. Opt-in; the default keeps
    the strict torch-parity numerics.
    """
    B, Tq, D = x_q.shape
    Tk = x_kv.shape[1]
    h = num_heads
    dh = D // h

    # HF-style attention-probability dropout (BERT/ViT towers fine-tune with
    # it active). Training-only; forces the XLA core — the fused kernels are
    # eval/parity paths and never see a dropout rng.
    drop_active = probs_dropout > 0.0 and dropout_rng is not None

    q3 = dense(x_q, p["q"])
    k3 = dense(x_kv, p["k"])
    v3 = dense(x_kv, p["v"])

    if Tq == 1 and mask is None and key_mask is None and not causal and not drop_active:
        # Single-query pooled attention (the SigLIP MAP head,
        # models/siglip._map_head). With M=1 the generic batched-GEMM path
        # degenerates into B*h [1,dh]x[dh,Tk] matmuls plus [B,h,1,dh] layout
        # copies (measured 1.88 ms of a 23 ms vision tower at B=96). The
        # score/weighted-sum contractions are only B*Tk*D multiplies, so do
        # them as VPU mult-reduces in the natural [B, Tk, h, dh] view — no
        # transpose ever materializes, and softmax stays fp32 (same math).
        scale = 1.0 / float(np.sqrt(dh))
        qh = q3.astype(jnp.float32).reshape(B, 1, h, dh)
        kh = k3.astype(jnp.float32).reshape(B, Tk, h, dh)
        logits = (kh * qh).sum(-1) * scale  # [B, Tk, h]
        w = jax.nn.softmax(logits, axis=1)
        vh = v3.astype(jnp.float32).reshape(B, Tk, h, dh)
        out = (vh * w[..., None]).sum(1)  # [B, h, dh]
        out = out.astype(x_q.dtype).reshape(B, 1, D)
        return dense(out, p["o"])

    if impl == "pallas" and mask is None and max(Tq, Tk) <= 256 and not drop_active:
        # short-seq kernel consumes the natural [B, T, D] GEMM layout: no
        # [B, h, T, dh] transpose exists in the HLO (the XLA path's layout
        # copies cost 5.4 ms/batch at B=192/T=50 — see ops/pallas_attention).
        # Differentiable (custom VJP with a recompute backward kernel), so
        # training.attention: pallas works too.
        from multimodal_content_moderation_tpu.ops.pallas_attention import (
            attention_nhd_diff,
        )

        interpret = jax.default_backend() == "cpu"
        out = attention_nhd_diff(
            q3, k3, v3, key_mask, h, causal, 0, interpret
        )
        return dense(out, p["o"])

    q = q3.reshape(B, Tq, h, dh).transpose(0, 2, 1, 3)
    k = k3.reshape(B, Tk, h, dh).transpose(0, 2, 1, 3)
    v = v3.reshape(B, Tk, h, dh).transpose(0, 2, 1, 3)

    if impl == "pallas" and not drop_active:
        from multimodal_content_moderation_tpu.ops.pallas_attention import fused_mha

        interpret = jax.default_backend() == "cpu"
        out = fused_mha(
            q, k, v, mask, interpret=interpret, causal=causal, key_mask=key_mask
        )
    else:
        sdt = jnp.dtype(scores_dtype)
        scale = jnp.asarray(1.0 / jnp.sqrt(jnp.asarray(dh, jnp.float32)), sdt)
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=sdt
        ) * scale
        if mask is not None:
            # NEG_INF overflows to -inf in bf16; exp(-inf)=0 is the intent
            logits = logits + mask.astype(sdt)
        if key_mask is not None:
            logits = logits + key_mask.astype(sdt)[:, None, None, :]
        if causal:
            rows = jax.lax.broadcasted_iota(jnp.int32, (Tq, Tk), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (Tq, Tk), 1)
            logits = jnp.where(cols <= rows, logits, jnp.asarray(-jnp.inf, sdt))
        weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x_q.dtype)
        if drop_active:
            weights = dropout(weights, probs_dropout, dropout_rng)
        out = jnp.einsum(
            "bhqk,bhkd->bhqd", weights, v, preferred_element_type=jnp.float32
        ).astype(x_q.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(B, Tq, D)
    return dense(out, p["o"])


def transformer_block(
    x: jnp.ndarray,
    p: dict,
    num_heads: int,
    act: str,
    mask: Optional[jnp.ndarray] = None,
    eps: float = 1e-5,
    remat: bool = False,
    attention_impl: str = "xla",
    scores_dtype: str = "float32",
    causal: bool = False,
    key_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Pre-LN transformer block shared by the CLIP and SigLIP towers.

    ``p = {"ln1", "attn", "ln2", "fc1", "fc2"}``. Mirrors HF
    CLIPEncoderLayer / SiglipEncoderLayer semantics. With ``remat`` the block
    is rematerialized in the backward pass (``jax.checkpoint``), trading
    FLOPs for activation memory — the TPU equivalent of the reference's
    ``gradient_checkpointing`` knob (config/default.yaml:61).
    ``causal``/``key_mask`` are the structured mask form (see ``mha``).
    """

    def block(x, p, mask, key_mask):
        activation = ACTIVATIONS[act]
        res = x
        y = layer_norm(x, p["ln1"], eps)
        x = res + mha(
            y, y, p["attn"], num_heads, mask,
            impl=attention_impl, scores_dtype=scores_dtype,
            causal=causal, key_mask=key_mask,
        )
        res = x
        y = layer_norm(x, p["ln2"], eps)
        y = dense_maybe_int8(y, p["fc1"])  # opt-in int8 fc1 (ops/quant.py)
        y = activation(y)
        y = dense(y, p["fc2"])
        return res + y

    if remat:
        return jax.checkpoint(block)(x, p, mask, key_mask)
    return block(x, p, mask, key_mask)
