"""Opt-in int8 weight quantization for the measured-winning MLP GEMM shape.

The reference never quantizes (pure fp32/AMP torch —
src/models/fusion.py:157-229); this is a TPU-native performance option. On
this chip the int8 MXU path measured a 1.75x speedup ONLY at the K768xN3072
fc1 shape (docs/PERFORMANCE.md "Tried and rejected"); other shapes lose or
break even, so quantization is applied surgically: exactly the fc1 layers
whose weight is (768, 3072).

Scheme (standard dynamic-activation / static-weight int8):
- weights: per-output-channel symmetric int8, ``scale_n = max|w[:, n]| / 127``
- activations: per-row dynamic symmetric int8, ``s_r = max|x[r, :]| / 127``
  (one fp32 reduction the compiler fuses with the preceding LayerNorm/GELU)
- GEMM: int8 x int8 -> int32 on the MXU (``preferred_element_type=int32``),
  dequantized by the rank-1 outer product of the two scale vectors.

Eval-only: the quantized pytree replaces ``fc1`` leaves with
``{"w_i8", "scale", "b"}``; ``ops.layers.transformer_block`` dispatches on
the presence of ``w_i8`` (pytree-structural, so it stays a compile-time
branch). Training never sees quantized params.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# the one shape the microbench showed winning on this chip (docs/PERFORMANCE.md)
WINNING_FC1_SHAPE: Tuple[int, int] = (768, 3072)


def quantize_linear_int8(p: dict) -> dict:
    """``{"w": (K, N) float, "b"?}`` -> ``{"w_i8", "scale", "b"?}``."""
    w = np.asarray(jax.device_get(p["w"]), np.float32)
    scale = np.abs(w).max(axis=0) / 127.0
    scale = np.maximum(scale, 1e-12)
    w_i8 = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
    out = {"w_i8": jnp.asarray(w_i8), "scale": jnp.asarray(scale, jnp.float32)}
    if "b" in p and p["b"] is not None:
        out["b"] = p["b"]
    return out


def dense_int8(x: jnp.ndarray, q: dict) -> jnp.ndarray:
    """Dynamic-activation int8 GEMM matching ``ops.layers.dense``'s contract
    (returns ``x.dtype``, fp32 bias add)."""
    xf = x.astype(jnp.float32)
    s_x = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    s_x = jnp.maximum(s_x, 1e-12)
    x_i8 = jnp.clip(jnp.rint(xf / s_x), -127, 127).astype(jnp.int8)
    y = jnp.dot(x_i8, q["w_i8"], preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (s_x * q["scale"].astype(jnp.float32))
    if "b" in q and q["b"] is not None:
        y = y + q["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def quantize_fc1_layers(
    params, shape: Optional[Tuple[int, int]] = WINNING_FC1_SHAPE
) -> Tuple[dict, int]:
    """Return a copy of a model/backbone pytree with every encoder-layer
    ``fc1`` whose weight matches ``shape`` replaced by its int8 form
    (``shape=None`` quantizes every fc1). Returns (new_params, n_quantized).
    """
    n = 0

    def walk(node):
        nonlocal n
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if k == "map_head":
                    # SigLIP pooling head: its fc1 GEMM has one query row per
                    # image (M = B), far too small for the int8 win — keep it
                    # at full precision
                    out[k] = v
                elif (
                    k == "fc1"
                    and isinstance(v, dict)
                    and "w" in v
                    and (shape is None or tuple(v["w"].shape) == tuple(shape))
                ):
                    out[k] = quantize_linear_int8(v)
                    n += 1
                else:
                    out[k] = walk(v)
            return out
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(params), n
