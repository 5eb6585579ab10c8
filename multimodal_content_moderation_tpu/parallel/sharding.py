"""Semantic parameter sharding rules for the ("data", "model") mesh.

Tensor parallelism is a config choice (`parallel: {data: -1, model: N}` in the
train YAML): with ``model=1`` every rule collapses to replication; with
``model>1`` the transformer blocks shard Megatron-style and XLA/GSPMD inserts
the collectives over ICI. The flagship models (~150M params) fit on one chip,
so TP is headroom, not a requirement (SURVEY.md §2 TP row) — but it is wired
end-to-end: the Trainer places params by these rules and the train CLI exposes
the mesh shape.

Rules (keyed on the parameter's pytree path, not its shape):

- attention ``q/k/v``: column-parallel — weight [D, D] sharded on the output
  (head) axis, bias sharded to match. Each model shard owns a contiguous
  slice of heads.
- attention ``o``: row-parallel — weight sharded on the input axis (the
  partial sums reduce-scatter/all-reduce back to the replicated residual);
  bias replicated.
- MLP ``fc1``: column-parallel (weight [D, F] on F, bias on F);
  ``fc2``: row-parallel (weight [F, D] on F, bias replicated).
- ``token_embedding`` [V, D]: sharded over the vocab axis.
- LayerNorms, position/class embeddings, patch embedding, projections and
  head parameters: replicated (all small).

Any rule whose shard axis is not divisible by the model-axis size falls back
to replication, so odd head counts/tiny test configs never error.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multimodal_content_moderation_tpu.parallel.mesh import MODEL_AXIS


def _path_str(path) -> str:
    """Stringify a tree_map_with_path key path: 'backbone/text_model/layers/0/attn/q/w'."""
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:  # pragma: no cover - future key kinds
            parts.append(str(k))
    return "/".join(parts)


def _spec_for(path: str, ndim: int) -> Optional[tuple]:
    """(axis_index, ...) partition spec template for a param path, or None
    for replication. Returns a tuple of axis names/None of length ndim.

    Rules apply only inside the transformer block stack (``.../layers/<i>/``):
    head params like ``head/cls_fc1`` or ``head/heads/0/fc1`` are tiny and
    must replicate, so a bare ``fc1`` suffix match would be wrong."""
    if "layers/" not in path:
        if path.endswith("token_embedding") and ndim == 2:
            return (MODEL_AXIS, None)  # vocab-axis sharding
        return None
    if path.endswith("/w"):
        stem = path[: -len("/w")]
        if stem.endswith(("attn/q", "attn/k", "attn/v", "/fc1")) and ndim == 2:
            return (None, MODEL_AXIS)  # column-parallel: shard outputs
        if stem.endswith(("attn/o", "/fc2")) and ndim == 2:
            return (MODEL_AXIS, None)  # row-parallel: shard inputs
    elif path.endswith("/b"):
        stem = path[: -len("/b")]
        if stem.endswith(("attn/q", "attn/k", "attn/v", "/fc1")) and ndim == 1:
            return (MODEL_AXIS,)  # bias follows the column-parallel outputs
    return None


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree for ``params`` under the semantic rules above.

    With ``mesh.shape[MODEL_AXIS] == 1`` everything replicates (pure DP)."""
    model_size = mesh.shape[MODEL_AXIS]

    def rule(path, x) -> NamedSharding:
        ndim = getattr(x, "ndim", 0)
        if model_size > 1:
            spec = _spec_for(_path_str(path), ndim)
            if spec is not None:
                axis = spec.index(MODEL_AXIS)
                if x.shape[axis] % model_size == 0 and x.shape[axis] >= model_size:
                    return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place ``params`` on the mesh according to ``param_shardings``.

    Single-device meshes collapse to a plain ``device_put`` (GSPMD-annotated
    arrays hit a ~130x slow path on some backends — parallel/mesh.shard_batch)."""
    if mesh.devices.size == 1:
        dev = mesh.devices.reshape(-1)[0]
        return jax.device_put(params, dev)
    shardings = param_shardings(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
