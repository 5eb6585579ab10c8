"""Parameter sharding rules for the ("data", "model") mesh.

Tensor parallelism is a config choice: with ``model=1`` every rule collapses
to replication; with ``model>1`` the large matrices (embeddings, MLP and
projection weights) are sharded over the model axis and XLA inserts the
all-gathers/reduce-scatters. The flagship models (~150M params) fit on one
chip, so this is headroom, not a requirement (SURVEY.md §2 TP row).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multimodal_content_moderation_tpu.parallel.mesh import MODEL_AXIS


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree for ``params``: 2D+ leaves shard their largest
    divisible axis over the model axis; everything else replicates."""
    model_size = mesh.shape[MODEL_AXIS]

    def rule(x) -> NamedSharding:
        if model_size > 1 and hasattr(x, "ndim") and x.ndim >= 2:
            # pick the largest axis divisible by the model-axis size
            axes = sorted(range(x.ndim), key=lambda a: -x.shape[a])
            for a in axes:
                if x.shape[a] % model_size == 0 and x.shape[a] >= model_size:
                    spec = [None] * x.ndim
                    spec[a] = MODEL_AXIS
                    return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, params)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place ``params`` on the mesh according to ``param_shardings``."""
    shardings = param_shardings(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
