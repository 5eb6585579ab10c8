"""Pallas TPU kernel: fused image normalize + patchify + embed.

Replaces the host-side normalize + device patchify + GEMM chain with one
kernel that reads the **uint8 wire format** directly from HBM and writes
embedded patch tokens:

    u8 [B, N_patches, C*p*p] -> (x/255 - mean)/std -> @ W [C*p*p, D] (+ b)

Feeding uint8 quarters the host->HBM transfer bytes vs fp32 pixels, and the
fusion avoids materializing the normalized fp32 image in HBM (~300 MB per
500-image batch for 224x224 RGB). The normalization constants are folded
into the GEMM:  ((x/255 - mean)/std) @ W  ==  x @ (W/(255*std)) - (mean/std)@W,
so the kernel body is a single MXU matmul over uint8-promoted inputs plus a
precomputed bias — the per-pixel normalize costs zero extra HBM traffic and
zero VPU passes over the full image.

The host-side patch extraction (HWC uint8 crop -> [N, C*p*p] rows) is a pure
reshape/transpose done once by the input pipeline (data/pipeline.py), so the
bytes that cross the wire are already in patch-major order.

Pure-JAX fallback (`patch_embed_reference`) keeps CPU tests and non-TPU
platforms working; parity is tested in interpret mode.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fold_norm_into_embed(
    w: jnp.ndarray,
    b: Optional[jnp.ndarray],
    mean: Sequence[float],
    std: Sequence[float],
    patch_size: int,
    num_channels: int = 3,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fold (x/255 - mean)/std into the patch-embedding GEMM.

    ``w`` is the (C*p*p, D) embedding with channel-major patch ordering
    (models/convert._conv_patch_embed). Returns (w_folded, b_folded) such
    that ``u8 @ w_folded + b_folded == normalize(u8) @ w + b``.
    """
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    pp = patch_size * patch_size
    # per-input-row scale 1/(255*std_c) and shift -mean_c/std_c
    scale = jnp.repeat(1.0 / (255.0 * std), pp)  # [C*p*p]
    shift = jnp.repeat(-mean / std, pp)  # [C*p*p]
    wf = w.astype(jnp.float32) * scale[:, None]
    bf = shift @ w.astype(jnp.float32)
    if b is not None:
        bf = bf + b.astype(jnp.float32)
    return wf, bf


def _embed_kernel(x_ref, w_ref, b_ref, o_ref):
    """One block of rows: u8 -> f32 -> GEMM -> +bias.

    The int32 hop is required: Mosaic has no direct uint8->float32 cast.
    """
    x = x_ref[...].astype(jnp.int32).astype(jnp.float32)
    acc = jnp.dot(x, w_ref[...], preferred_element_type=jnp.float32)
    o_ref[...] = (acc + b_ref[...]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_rows", "out_dtype", "interpret"))
def patch_embed_u8(
    patches_u8: jnp.ndarray,  # [B, N, K] uint8, K = C*p*p
    w_folded: jnp.ndarray,  # [K, D] f32 (fold_norm_into_embed output)
    b_folded: jnp.ndarray,  # [D] f32
    block_rows: int = 256,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """[B, N, K] uint8 patches -> [B, N, D] embedded tokens."""
    B, N, K = patches_u8.shape
    D = w_folded.shape[1]
    rows = B * N
    x = patches_u8.reshape(rows, K)
    padded = ((rows + block_rows - 1) // block_rows) * block_rows
    if padded != rows:
        x = jnp.pad(x, ((0, padded - rows), (0, 0)))

    out = pl.pallas_call(
        _embed_kernel,
        grid=(padded // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_rows, D), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((padded, D), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * padded * K * D,
            bytes_accessed=padded * K + K * D * 4 + padded * D * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, w_folded, b_folded)
    return out[:rows].reshape(B, N, D)


def extract_patches_u8(images_hwc: np.ndarray, patch_size: int) -> np.ndarray:
    """Host-side: [B, H, W, C] uint8 -> [B, N, C*p*p] patch rows in the
    channel-major order the folded GEMM expects. Pure numpy (cheap transpose;
    done in the input pipeline workers)."""
    B, H, W, C = images_hwc.shape
    p = patch_size
    nh, nw = H // p, W // p
    x = images_hwc.reshape(B, nh, p, nw, p, C)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # [B, nh, nw, C, p, p]
    return np.ascontiguousarray(x.reshape(B, nh * nw, C * p * p))


def patch_embed_reference(
    patches_u8: jnp.ndarray,
    w_folded: jnp.ndarray,
    b_folded: jnp.ndarray,
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Pure-JAX reference/fallback of patch_embed_u8 (same math)."""
    x = patches_u8.astype(jnp.float32)
    return (
        jnp.einsum("bnk,kd->bnd", x, w_folded, preferred_element_type=jnp.float32)
        + b_folded
    ).astype(out_dtype)


# ---------------------------------------------------------------------------
# Differentiable u8 embed (training path)
# ---------------------------------------------------------------------------
#
# Training with the u8 wire format needs gradients w.r.t. the folded weight
# and bias (the fold itself is a linear reparameterization upstream, so
# d(w)/d(w_folded) chains through automatically). The custom VJP below keeps
# the Pallas kernel on the forward pass and computes dW = x^T g with the
# uint8 patches CAST TO fp32 FIRST — XLA must never see a uint8 GEMM operand
# (measured 540x cliff on this backend).


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def patch_embed_u8_train(
    patches_u8: jnp.ndarray,
    w_folded: jnp.ndarray,
    b_folded: jnp.ndarray,
    out_dtype=jnp.bfloat16,
    use_pallas: bool = True,
) -> jnp.ndarray:
    embed = patch_embed_u8 if use_pallas else patch_embed_reference
    return embed(patches_u8, w_folded, b_folded, out_dtype=out_dtype)


def _embed_train_fwd(patches_u8, w_folded, b_folded, out_dtype, use_pallas):
    out = patch_embed_u8_train(patches_u8, w_folded, b_folded, out_dtype, use_pallas)
    return out, patches_u8


def _embed_train_bwd(out_dtype, use_pallas, patches_u8, g):
    x = patches_u8.astype(jnp.float32)
    g32 = g.astype(jnp.float32)
    dw = jnp.einsum("bnk,bnd->kd", x, g32, preferred_element_type=jnp.float32)
    db = jnp.sum(g32, axis=(0, 1))
    # integer primal: cotangent is float0 (pixels are data, not parameters)
    dx = np.zeros(patches_u8.shape, dtype=jax.dtypes.float0)
    return dx, dw, db


patch_embed_u8_train.defvjp(_embed_train_fwd, _embed_train_bwd)
