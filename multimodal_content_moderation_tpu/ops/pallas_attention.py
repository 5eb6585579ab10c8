"""Pallas TPU kernels: fused attention.

Three kernels, selected by sequence length and layout:

- ``attention_nhd`` (+ ``attention_nhd_diff``, its custom-VJP form): THE
  in-model short-seq path. Consumes the QKV projections' natural [B, T, D]
  layout — no [B, H, T, dh] transpose exists anywhere in the HLO (the XLA
  path loses 5.4 ms/batch at B=192/T=50 to those layout copies, as much as
  the attention GEMMs themselves). Heads are peeled off with lane slices in
  VMEM; bB-batched MXU matmuls per head; fp32 softmax; causal/key-padding
  applied in-kernel. Differentiable via a recompute backward kernel.
- ``attention_small``: pre-split [BH, T, dh] variant (kept for the
  ``fused_mha`` dense-mask path). One (batch*heads) grid step holds the
  whole [T, dh] tile in VMEM and fuses QK^T -> bias -> softmax -> V, so the
  [B, H, T, T] score tensor never touches HBM (XLA materializes it;
  ~380 MB/layer round-trip at B=500, T=77).
- ``flash_attention``: blockwise online-softmax (flash-style) for long
  sequences — the headroom path for higher-resolution ViTs / longer text
  (SURVEY.md §5 long-context note). Grid (BH, Tq/blk, S/blk); K/V stream in
  blocks with running max/denominator rescaling.

Both kernels have mask-free variants: materializing a dense [B*H, T, S] fp32
mask costs more HBM traffic than the attention itself at long sequence
(6.4 GB at B=8, H=12, T=S=4096 — measured 6.5x slowdown), so unmasked
attention (every ViT tower) never touches a mask tensor. Masked attention
takes an additive fp32 mask (causal and/or padding, same convention as
ops/layers.mha) with fp32 softmax statistics. Parity vs the jnp reference is
tested in interpret mode; ``fused_mha`` dispatches by shape and is a drop-in
replacement for ``ops.layers.mha``'s inner attention.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -3.4028235e38


def _small_body(q_ref, k_ref, v_ref, m_ref, o_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32)  # [T, dh]
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [T, T]
    if m_ref is not None:
        s = s + m_ref[0]
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0] = jnp.dot(p, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _small_kernel(q_ref, k_ref, v_ref, m_ref, o_ref, *, scale: float):
    _small_body(q_ref, k_ref, v_ref, m_ref, o_ref, scale=scale)


def _small_kernel_nomask(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    _small_body(q_ref, k_ref, v_ref, None, o_ref, scale=scale)


@functools.partial(jax.jit, static_argnames=("interpret",))
def attention_small(
    q: jnp.ndarray,  # [BH, T, dh]
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,  # [BH, T, T] additive fp32
    interpret: bool = False,
) -> jnp.ndarray:
    BH, T, dh = q.shape
    scale = float(dh) ** -0.5
    tile = lambda *shape: pl.BlockSpec(
        (1,) + shape, lambda i: (i,) + (0,) * len(shape), memory_space=pltpu.VMEM
    )
    in_specs = [tile(T, dh), tile(T, dh), tile(T, dh)]
    operands = [q, k, v]
    if mask is not None:
        in_specs.append(tile(T, T))
        operands.append(mask)
        kernel = functools.partial(_small_kernel, scale=scale)
    else:
        kernel = functools.partial(_small_kernel_nomask, scale=scale)
    return pl.pallas_call(
        kernel,
        grid=(BH,),
        in_specs=in_specs,
        out_specs=tile(T, dh),
        out_shape=jax.ShapeDtypeStruct((BH, T, dh), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * T * T * dh,
            bytes_accessed=BH * T * dh * 3 * q.dtype.itemsize
            + (BH * T * T * 4 if mask is not None else 0),
            transcendentals=BH * T * T,
        ),
        interpret=interpret,
    )(*operands)


def _padded_seq_len(T: int) -> int:
    """Mosaic compile-pathology guard for the nhd kernels. T=197 (the
    ViT-with-CLS length) measured a 352 s Mosaic compile vs 4.8 s after
    padding to 200 on the same shape — the compiler's masking for awkward
    sublane remainders at larger T blows up. Empirically-known-good shapes
    (50, 77, 196 and every bucket < 128) are left untouched; only T >= 128
    with a remainder outside {0, 4} is padded up to the next multiple of 8.
    """
    if T >= 128 and T % 8 not in (0, 4):
        return -(-T // 8) * 8
    return T


def _pad_pathological_seq(q, k, v, key_mask):
    """Zero-pad q (queries) and k/v (keys) along the seq axis to
    ``_padded_seq_len`` lengths; padded KEY columns are masked with a large
    negative additive bias (creating a key_mask if none existed). Padded
    QUERY rows produce garbage outputs the caller slices off. Causal stays
    valid: pad positions sit after every real position."""
    B, Tq, _ = q.shape
    S = k.shape[1]
    Tq_p, S_p = _padded_seq_len(Tq), _padded_seq_len(S)
    if Tq_p == Tq and S_p == S:
        return q, k, v, key_mask
    if Tq_p != Tq:
        q = jnp.pad(q, ((0, 0), (0, Tq_p - Tq), (0, 0)))
    if S_p != S:
        k = jnp.pad(k, ((0, 0), (0, S_p - S), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, S_p - S), (0, 0)))
        km = (
            key_mask.astype(jnp.float32)
            if key_mask is not None
            else jnp.zeros((B, S), jnp.float32)
        )
        # -1e9 (not -max_float): additive on fp32 scores without overflow
        key_mask = jnp.pad(km, ((0, 0), (0, S_p - S)), constant_values=-1e9)
    return q, k, v, key_mask


def _snap_to_divisor(B: int, block_b: int) -> int:
    """Halve ``block_b`` until it divides ``B``. Halving (never decrementing)
    keeps batch blocks power-of-2/sublane-aligned: non-power-of-2 blocks
    send the Mosaic compile off a cliff (measured 134 s at block_b=6 vs
    1.2 s at 4, B=132/T=50/D=768)."""
    while block_b > 1 and B % block_b:
        block_b //= 2
    return block_b


def _pick_block_b(
    B: int, per_item_bytes: int, budget: int = 5 * 2**20, start: int = 8
) -> int:
    """Default batch-block: start at ``start``, halve under the VMEM block
    budget, then snap to a power-of-2 divisor of ``B``."""
    block_b = start
    while block_b > 1 and block_b * per_item_bytes > budget:
        block_b //= 2
    return _snap_to_divisor(B, block_b)


# Forward-grid tuning knobs (sweepable without a code edit; defaults are the
# measured-best on v5e, full-model headline A/B at B=144:
# bb16/mult2 9179, bb16/mult1 9151, unrolled-heads 9141, bb8/mult2 9038,
# bb8/mult1 8872 samples/s — see docs/PERFORMANCE.md)
_FWD_BLOCK_B = int(os.environ.get("MMHARM_NHD_BLOCK_B", "16"))
_FWD_HPB_MULT = int(os.environ.get("MMHARM_NHD_HPB_MULT", "2"))
# bwd 16 vs 8: 2583 vs 2514 samples/s train step (B=256, v5e)
_BWD_BLOCK_B = int(os.environ.get("MMHARM_NHD_BWD_BLOCK_B", "16"))


def _nhd_body(
    q_ref, k_ref, v_ref, km_ref, o_ref, *, scale: float, causal: bool, num_heads: int
):
    """One batch-block step over [bB, T, D] tiles in natural N-T-D layout.

    Heads are peeled off with static lane-dim slices (a VMEM relayout, ~free
    at these tile sizes) and each head runs a bB-batched MXU matmul pair with
    an fp32 softmax between.
    """
    qa = q_ref[...]  # [bB, Tq, D]
    ka = k_ref[...]  # [bB, S, D]
    va = v_ref[...]
    km = km_ref[...] if km_ref is not None else None  # [bB, 1, S]
    dh = qa.shape[2] // num_heads
    Tq, S = qa.shape[1], ka.shape[1]
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, (Tq, S), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (Tq, S), 1)
        keep = (cols <= rows)[None]
    outs = []
    for hi in range(num_heads):
        sl = lambda a: jax.lax.slice_in_dim(a, hi * dh, (hi + 1) * dh, axis=2)
        q = sl(qa).astype(jnp.float32)  # [bB, Tq, dh]
        k = sl(ka).astype(jnp.float32)
        v = sl(va).astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ) * scale  # [bB, Tq, S]
        if km is not None:
            s = s + km
        if causal:
            s = jnp.where(keep, s, NEG_INF)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        outs.append(
            jax.lax.dot_general(
                p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
            )
        )  # [bB, Tq, dh]
    o_ref[...] = jnp.concatenate(outs, axis=2).astype(o_ref.dtype)


def _nhd_kernel(q_ref, k_ref, v_ref, km_ref, o_ref, *, scale, causal, num_heads):
    _nhd_body(
        q_ref, k_ref, v_ref, km_ref, o_ref,
        scale=scale, causal=causal, num_heads=num_heads,
    )


def _nhd_kernel_nokm(q_ref, k_ref, v_ref, o_ref, *, scale, causal, num_heads):
    _nhd_body(
        q_ref, k_ref, v_ref, None, o_ref,
        scale=scale, causal=causal, num_heads=num_heads,
    )


@functools.partial(
    jax.jit, static_argnames=("num_heads", "causal", "block_b", "interpret")
)
def attention_nhd(
    q: jnp.ndarray,  # [B, Tq, D]  (D = num_heads * dh) — natural GEMM layout
    k: jnp.ndarray,  # [B, S, D]
    v: jnp.ndarray,  # [B, S, D]
    num_heads: int,
    key_mask: Optional[jnp.ndarray] = None,  # [B, S] additive fp32 (padding)
    causal: bool = False,
    block_b: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Short-sequence fused attention that CONSUMES the [B, T, D] layout.

    The XLA small-seq path materializes per-layer [B, T, D] <-> [B, H, T, dh]
    layout copies around its batched matmuls (measured 5.4 ms/batch at
    B=192/T=50 on v5e — as much device time as the attention GEMMs). This
    kernel takes the QKV projections' natural output layout directly, so no
    transpose exists anywhere in the HLO: grid (B/bB, heads/hpb), each step
    loads [bB, T, hpb*dh] tiles of its head pack, peels heads off with
    static lane slices in VMEM (~22 TB/s, vs HBM for the XLA copies), and
    runs a bB-batched MXU matmul pair with fp32 softmax per head, writing
    its D-slice of [bB, Tq, D] straight back. Gridding over head packs
    (vs unrolling all heads in one body) cut the Mosaic compile from ~95 s
    to ~3 s per shape at equal-or-better runtime.

    Measured (v5e, chained dispatch): B=192/T=50/h=12: 0.75 ms vs 1.10 ms
    XLA einsum-with-transposes and 1.87 ms transpose+``attention_small``.

    ``causal`` and ``key_mask`` are applied in-kernel (no mask tensor in
    HBM). This raw call defines no VJP; use ``attention_nhd_diff`` (custom
    VJP with the recompute backward kernel below) for the training path.
    """
    B, _orig_Tq, D = q.shape
    q, k, v, key_mask = _pad_pathological_seq(q, k, v, key_mask)
    Tq = q.shape[1]
    S = k.shape[1]
    dh = D // num_heads
    scale = float(dh) ** -0.5
    # heads per grid block (same packing rule as the backward): the smallest
    # pack whose D-block is a legal lane multiple. Gridding over head packs
    # instead of unrolling all heads in one body cuts the Mosaic compile
    # from ~95 s to ~2 s for the 12-head vision shape, and each step then
    # streams only its own D-slice of q/k/v through VMEM.
    hpb = max(1, -(-128 // dh)) * _FWD_HPB_MULT
    if num_heads % hpb:
        hpb = num_heads
    dblk = dh * hpb
    if dblk % 128 and dblk != D:
        hpb, dblk = num_heads, D
    if not block_b:
        # measured best at B=192/T=50: 8 (0.748 ms vs 0.862 @ 16); shrink to
        # a ~5 MB input+output block budget (x2 for double buffering + fp32
        # softmax temporaries must fit in ~16 MB VMEM); e.g. SigLIP
        # T=196/D=768 -> block_b 4
        # live tiles per grid step: q(Tq) + k(S) + v(S) + out(Tq)
        block_b = _pick_block_b(
            B, (2 * Tq + 2 * S) * dblk * q.dtype.itemsize, start=_FWD_BLOCK_B
        )
    else:
        block_b = _snap_to_divisor(B, block_b)

    tile = lambda T: pl.BlockSpec(
        (block_b, T, dblk), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
    )
    in_specs = [tile(Tq), tile(S), tile(S)]
    operands = [q, k, v]
    if key_mask is not None:
        # carried as [B, 1, S] so the block's last-two dims equal the array's
        # (the 2D [block_b, S] form is only a legal block when block_b is a
        # multiple of 8 — this works for every block_b)
        in_specs.append(
            pl.BlockSpec(
                (block_b, 1, S), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
            )
        )
        operands.append(key_mask.astype(jnp.float32)[:, None, :])
        kernel = functools.partial(
            _nhd_kernel, scale=scale, causal=causal, num_heads=hpb
        )
    else:
        kernel = functools.partial(
            _nhd_kernel_nokm, scale=scale, causal=causal, num_heads=hpb
        )
    out = pl.pallas_call(
        kernel,
        grid=(B // block_b, num_heads // hpb),
        in_specs=in_specs,
        out_specs=tile(Tq),
        out_shape=jax.ShapeDtypeStruct((B, Tq, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * num_heads * Tq * S * dh,
            bytes_accessed=(B * Tq * D + 2 * B * S * D) * q.dtype.itemsize
            + B * Tq * D * q.dtype.itemsize,
            transcendentals=B * num_heads * Tq * S,
        ),
        interpret=interpret,
    )(*operands)
    return out if Tq == _orig_Tq else out[:, :_orig_Tq]


def _nhd_bwd_body(
    q_ref, k_ref, v_ref, do_ref, km_ref, dq_ref, dk_ref, dv_ref,
    *, scale: float, causal: bool, num_heads: int,
):
    """Backward for ``attention_nhd``: recompute the softmax per head (short
    seq — cheaper than storing [B, h, T, S] probabilities in HBM) and form
    dq/dk/dv with bB-batched MXU matmuls, all in the natural [bB, T, D]
    layout. ``num_heads`` here is the number of heads IN THIS BLOCK: the
    grid is (batch-block, head-pair) with 128-wide D blocks — unrolling all
    12 heads x 5 dots x bB batched matmuls in one kernel body made the
    Mosaic compile blow past 400 s; two heads per instance compiles in
    seconds and pipelines the same."""
    qa = q_ref[...]
    ka = k_ref[...]
    va = v_ref[...]
    doa = do_ref[...]
    km = km_ref[...] if km_ref is not None else None  # [bB, 1, S]
    dh = qa.shape[2] // num_heads
    Tq, S = qa.shape[1], ka.shape[1]
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, (Tq, S), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (Tq, S), 1)
        keep = (cols <= rows)[None]
    dqs, dks, dvs = [], [], []
    bdims = ((0,), (0,))
    for hi in range(num_heads):
        sl = lambda a: jax.lax.slice_in_dim(a, hi * dh, (hi + 1) * dh, axis=2)
        q = sl(qa).astype(jnp.float32)  # [bB, Tq, dh]
        k = sl(ka).astype(jnp.float32)  # [bB, S, dh]
        v = sl(va).astype(jnp.float32)
        do = sl(doa).astype(jnp.float32)  # [bB, Tq, dh]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), bdims), preferred_element_type=jnp.float32
        ) * scale  # [bB, Tq, S]
        if km is not None:
            s = s + km
        if causal:
            s = jnp.where(keep, s, NEG_INF)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        # dv = p^T do ; dp = do v^T ; ds = p*(dp - rowsum(dp*p)) ; dz = ds*scale
        dvs.append(
            jax.lax.dot_general(
                p, do, (((1,), (1,)), bdims), preferred_element_type=jnp.float32
            )
        )  # [bB, S, dh]
        dp = jax.lax.dot_general(
            do, v, (((2,), (2,)), bdims), preferred_element_type=jnp.float32
        )  # [bB, Tq, S]
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dz = ds * scale
        dqs.append(
            jax.lax.dot_general(
                dz, k, (((2,), (1,)), bdims), preferred_element_type=jnp.float32
            )
        )  # [bB, Tq, dh]
        dks.append(
            jax.lax.dot_general(
                dz, q, (((1,), (1,)), bdims), preferred_element_type=jnp.float32
            )
        )  # [bB, S, dh]
    dq_ref[...] = jnp.concatenate(dqs, axis=2).astype(dq_ref.dtype)
    dk_ref[...] = jnp.concatenate(dks, axis=2).astype(dk_ref.dtype)
    dv_ref[...] = jnp.concatenate(dvs, axis=2).astype(dv_ref.dtype)


def _nhd_bwd_kernel(q, k, v, do, km, dq, dk, dv, *, scale, causal, num_heads):
    _nhd_bwd_body(
        q, k, v, do, km, dq, dk, dv,
        scale=scale, causal=causal, num_heads=num_heads,
    )


def _nhd_bwd_kernel_nokm(q, k, v, do, dq, dk, dv, *, scale, causal, num_heads):
    _nhd_bwd_body(
        q, k, v, do, None, dq, dk, dv,
        scale=scale, causal=causal, num_heads=num_heads,
    )


@functools.partial(
    jax.jit, static_argnames=("num_heads", "causal", "block_b", "interpret")
)
def _attention_nhd_bwd_call(
    q, k, v, do, key_mask, num_heads, causal=False, block_b=0, interpret=False
):
    B, _orig_Tq, D = q.shape
    _orig_S = k.shape[1]
    q, k, v, key_mask = _pad_pathological_seq(q, k, v, key_mask)
    if q.shape[1] != _orig_Tq:
        # padded query rows carry zero cotangent -> zero extra gradient
        do = jnp.pad(do, ((0, 0), (0, q.shape[1] - _orig_Tq), (0, 0)))
    Tq = q.shape[1]
    S = k.shape[1]
    dh = D // num_heads
    scale = float(dh) ** -0.5
    # heads per grid block: smallest pack whose D-block is a legal lane
    # multiple (>=128); falls back to all heads in one block if they don't
    # divide evenly (e.g. dh=96)
    hpb = max(1, -(-128 // dh))
    if num_heads % hpb:
        hpb = num_heads
    dblk = dh * hpb
    if dblk % 128 and dblk != D:
        hpb, dblk = num_heads, D
    if not block_b:
        # 7 [*, T, dblk] tiles live per step (q/k/v/do in, dq/dk/dv out)
        block_b = _pick_block_b(
            B, (3 * Tq + 4 * S) * dblk * q.dtype.itemsize, start=_BWD_BLOCK_B
        )
    else:
        block_b = _snap_to_divisor(B, block_b)
    tile = lambda T: pl.BlockSpec(
        (block_b, T, dblk), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
    )
    in_specs = [tile(Tq), tile(S), tile(S), tile(Tq)]
    operands = [q, k, v, do]
    if key_mask is not None:
        # [B, 1, S] carrier — same sublane-legality trick as the forward
        in_specs.append(
            pl.BlockSpec(
                (block_b, 1, S), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
            )
        )
        operands.append(key_mask.astype(jnp.float32)[:, None, :])
        kernel = functools.partial(
            _nhd_bwd_kernel, scale=scale, causal=causal, num_heads=hpb
        )
    else:
        kernel = functools.partial(
            _nhd_bwd_kernel_nokm, scale=scale, causal=causal, num_heads=hpb
        )
    out = pl.pallas_call(
        kernel,
        grid=(B // block_b, num_heads // hpb),
        in_specs=in_specs,
        out_specs=[tile(Tq), tile(S), tile(S)],
        out_shape=[
            jax.ShapeDtypeStruct((B, Tq, D), q.dtype),
            jax.ShapeDtypeStruct((B, S, D), k.dtype),
            jax.ShapeDtypeStruct((B, S, D), v.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=10 * B * num_heads * Tq * S * dh,
            bytes_accessed=(3 * Tq + 4 * S) * B * D * q.dtype.itemsize,
            transcendentals=B * num_heads * Tq * S,
        ),
        interpret=interpret,
    )(*operands)
    if Tq != _orig_Tq or S != _orig_S:
        dq, dk, dv = out
        return dq[:, :_orig_Tq], dk[:, :_orig_S], dv[:, :_orig_S]
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def attention_nhd_diff(
    q, k, v, key_mask, num_heads, causal=False, block_b=0, interpret=False
):
    """Differentiable ``attention_nhd`` (custom VJP, recompute-style backward
    kernel) — lets the training path keep the transpose-free [B, T, D]
    layout in both passes. ``key_mask`` gets a zero cotangent (attention
    masks are not trained)."""
    return attention_nhd(
        q, k, v, num_heads,
        key_mask=key_mask, causal=causal, block_b=block_b, interpret=interpret,
    )


def _attention_nhd_fwd(q, k, v, key_mask, num_heads, causal, block_b, interpret):
    out = attention_nhd(
        q, k, v, num_heads,
        key_mask=key_mask, causal=causal, block_b=block_b, interpret=interpret,
    )
    return out, (q, k, v, key_mask)


def _attention_nhd_bwd(num_heads, causal, block_b, interpret, res, g):
    q, k, v, key_mask = res
    dq, dk, dv = _attention_nhd_bwd_call(
        q, k, v, g.astype(q.dtype), key_mask, num_heads,
        causal=causal, block_b=block_b, interpret=interpret,
    )
    dkm = None if key_mask is None else jnp.zeros_like(key_mask)
    return dq, dk, dv, dkm


attention_nhd_diff.defvjp(_attention_nhd_fwd, _attention_nhd_bwd)


def _make_flash_kernel(
    has_mask: bool,
    has_key_mask: bool,
    causal: bool,
    scale: float,
    kv_blocks: int,
    block_q: int,
    block_k: int,
):
    """Flash kernel specialized on its mask sources. Grid:
    (BH, num_q_blocks, kv_blocks); the kv axis is the innermost grid dim.

    Mask sources compose: optional dense additive block [bq, bk], optional
    key-padding additive row [1, bk], and a causal predicate computed from
    block offsets IN-KERNEL (never a [T, S] tensor in HBM). Causal blocks
    entirely above the diagonal are skipped (no MXU work)."""

    def kernel(*refs):
        q_ref, k_ref, v_ref = refs[:3]
        idx = 3
        m_ref = refs[idx] if has_mask else None
        idx += int(has_mask)
        km_ref = refs[idx] if has_key_mask else None
        idx += int(has_key_mask)
        o_ref = refs[idx]
        acc_ref, row_max_ref, row_sum_ref = refs[idx + 1 : idx + 4]

        q_idx = pl.program_id(1)
        kv_idx = pl.program_id(2)

        @pl.when(kv_idx == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)
            row_max_ref[...] = jnp.full_like(row_max_ref, NEG_INF)
            row_sum_ref[...] = jnp.zeros_like(row_sum_ref)

        def _compute():
            q = q_ref[0].astype(jnp.float32)  # [bq, dh]
            k = k_ref[0].astype(jnp.float32)  # [bk, dh]
            v = v_ref[0].astype(jnp.float32)  # [bk, dh]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale  # [bq, bk]
            if m_ref is not None:
                s = s + m_ref[0]
            if km_ref is not None:
                s = s + km_ref[0]  # [1, bk] broadcasts over rows
            if causal:
                rows = q_idx * block_q + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 0
                )
                cols = kv_idx * block_k + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 1
                )
                s = jnp.where(cols <= rows, s, NEG_INF)

            prev_max = row_max_ref[...]  # [bq, 1]
            cur_max = jnp.max(s, axis=-1, keepdims=True)
            new_max = jnp.maximum(prev_max, cur_max)
            correction = jnp.exp(prev_max - new_max)
            p = jnp.exp(s - new_max)  # [bq, bk]

            row_sum_ref[...] = row_sum_ref[...] * correction + jnp.sum(
                p, axis=-1, keepdims=True
            )
            acc_ref[...] = acc_ref[...] * correction + jnp.dot(
                p, v, preferred_element_type=jnp.float32
            )
            row_max_ref[...] = new_max

        if causal:
            # kv blocks entirely above the diagonal contribute nothing:
            # skip their MXU work (the q block's last row is its bound)
            pl.when(kv_idx * block_k <= q_idx * block_q + block_q - 1)(_compute)
        else:
            _compute()

        @pl.when(kv_idx == kv_blocks - 1)
        def _finish():
            o_ref[0] = (acc_ref[...] / row_sum_ref[...]).astype(o_ref.dtype)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("causal", "block_q", "block_k", "interpret")
)
def flash_attention(
    q: jnp.ndarray,  # [BH, T, dh]
    k: jnp.ndarray,  # [BH, S, dh]
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,  # [BH, T, S] additive fp32
    key_mask: Optional[jnp.ndarray] = None,  # [BH, S] additive fp32 (padding)
    causal: bool = False,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    BH, T, dh = q.shape
    S = k.shape[1]
    assert T % block_q == 0 and S % block_k == 0, "pad seq to block multiples"
    scale = float(dh) ** -0.5
    kv_blocks = S // block_k

    in_specs = [
        pl.BlockSpec(
            (1, block_q, dh), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (1, block_k, dh), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (1, block_k, dh), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM
        ),
    ]
    operands = [q, k, v]
    if mask is not None:
        in_specs.append(
            pl.BlockSpec(
                (1, block_q, block_k),
                lambda b, i, j: (b, i, j),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(mask)
    if key_mask is not None:
        in_specs.append(
            pl.BlockSpec(
                (1, block_k), lambda b, i, j: (b, j), memory_space=pltpu.VMEM
            )
        )
        operands.append(key_mask)

    kernel = _make_flash_kernel(
        mask is not None, key_mask is not None, causal,
        scale, kv_blocks, block_q, block_k,
    )
    return pl.pallas_call(
        kernel,
        grid=(BH, T // block_q, kv_blocks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, block_q, dh), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((BH, T, dh), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, dh), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)


def fused_mha(
    q: jnp.ndarray,  # [B, H, T, dh]
    k: jnp.ndarray,  # [B, H, S, dh]
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray],  # broadcastable to [B, H, T, S], additive
    small_threshold: int = 256,
    interpret: bool = False,
    causal: bool = False,
    key_mask: Optional[jnp.ndarray] = None,  # [B, S] additive fp32 (padding)
) -> jnp.ndarray:
    """Shape-dispatching fused attention over [B, H, ...] inputs.

    Prefer ``causal=True`` and/or ``key_mask`` over a dense ``mask``: both
    are applied in-kernel on the long-sequence path, so no [B*H, T, S] mask
    tensor ever reaches HBM (it would dominate traffic — 6.4 GB at B=8,
    H=12, T=S=4096). ``mask=None`` with no flags (every ViT tower) reads no
    mask at all.
    """
    B, H, T, dh = q.shape
    S = k.shape[2]
    m = None
    if mask is not None:
        m = jnp.broadcast_to(mask.astype(jnp.float32), (B, H, T, S)).reshape(
            B * H, T, S
        )
    km = None
    if key_mask is not None:
        km = jnp.broadcast_to(
            key_mask.astype(jnp.float32)[:, None, :], (B, H, S)
        ).reshape(B * H, S)
    qf = q.reshape(B * H, T, dh)
    kf = k.reshape(B * H, S, dh)
    vf = v.reshape(B * H, S, dh)
    if max(T, S) <= small_threshold:
        # short path: fold flags into one dense block (tiny at these shapes)
        if causal or km is not None:
            base = jnp.zeros((B * H, T, S), jnp.float32) if m is None else m
            if causal:
                rows = jax.lax.broadcasted_iota(jnp.int32, (T, S), 0)
                cols = jax.lax.broadcasted_iota(jnp.int32, (T, S), 1)
                base = base + jnp.where(cols <= rows, 0.0, NEG_INF)[None]
            if km is not None:
                base = base + km[:, None, :]
            m = base
        out = attention_small(qf, kf, vf, m, interpret=interpret)
    else:
        pad_q = (-T) % 128
        pad_k = (-S) % 128
        if pad_q or pad_k:
            qf = jnp.pad(qf, ((0, 0), (0, pad_q), (0, 0)))
            kf = jnp.pad(kf, ((0, 0), (0, pad_k), (0, 0)))
            vf = jnp.pad(vf, ((0, 0), (0, pad_k), (0, 0)))
            if m is not None:
                m = jnp.pad(
                    m, ((0, 0), (0, pad_q), (0, pad_k)), constant_values=NEG_INF
                )
            elif pad_k:
                # padded keys MUST drop out of the softmax; a key row mask is
                # enough (padded query rows are sliced off below)
                if km is None:
                    km = jnp.zeros((B * H, S), jnp.float32)
            if km is not None and pad_k:
                km = jnp.pad(km, ((0, 0), (0, pad_k)), constant_values=NEG_INF)
        Tp, Sp = qf.shape[1], kf.shape[1]
        # measured block heuristic (v5e, dh=64): large KV blocks amortize the
        # MXU's 128-lane tile over the dh=64 contraction; 128x128 blocks were
        # 5.9x slower at seq 4096 (grid overhead + tiny GEMMs)
        block_k = _largest_divisor_block(Sp, 1024)
        block_q = _largest_divisor_block(Tp, 1024 if Sp > 2048 else 256)
        out = flash_attention(
            qf, kf, vf, m, key_mask=km, causal=causal,
            block_q=block_q, block_k=block_k, interpret=interpret,
        )[:, :T]
    return out.reshape(B, H, T, dh)


def _largest_divisor_block(n: int, cap: int) -> int:
    """Largest multiple-of-128 block <= cap that divides n (n is a multiple
    of 128 after padding)."""
    b = min(n, cap)
    while n % b:
        b -= 128
    return max(b, 128)
