"""Device mesh construction and sharding rules.

The reference has no distributed implementation of its own (HF Trainer's
latent DDP was never configured — SURVEY.md §2 parallelism census). Here
data parallelism is first-class and TPU-native:

- a ("data", "model") mesh over all visible devices (model axis defaults to
  1; it exists so tensor-parallel sharding rules are a config change, not a
  rewrite)
- batches are sharded over "data" via NamedSharding; parameters are
  replicated. Under jit, XLA inserts the gradient all-reduce over ICI
  automatically — no hand-written collectives in the train step.
- multi-host: ``init_distributed`` wires ``jax.distributed`` and
  ``make_array_from_process_local_data`` assembles global batches from
  per-host shards.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def build_mesh(
    num_data: int = -1, num_model: int = 1, devices: Optional[list] = None
) -> Mesh:
    """Create a ("data", "model") mesh. ``num_data=-1`` -> all devices / model."""
    devices = devices if devices is not None else jax.devices()
    if num_data == -1:
        num_data = len(devices) // num_model
    arr = np.asarray(devices[: num_data * num_model]).reshape(num_data, num_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _put_global(x: Any, s: NamedSharding) -> jax.Array:
    """``device_put`` that also works when ``s`` spans devices owned by
    OTHER processes (``jax.device_put`` only accepts fully-addressable
    shardings). Every process must hold the same full host value ``x``
    (replicated params / opt state / restored checkpoints); each process
    contributes its addressable shards by slicing its local copy. Typed PRNG
    keys are unwrapped to their uint32 data and re-wrapped, since
    ``make_array_from_callback`` is raw-dtype only."""
    if jax.process_count() == 1:
        return jax.device_put(x, s)
    import jax.numpy as jnp

    dt = getattr(x, "dtype", None)
    if dt is not None and jnp.issubdtype(dt, jax.dtypes.prng_key):
        impl = jax.random.key_impl(x)
        data = np.asarray(jax.random.key_data(x))
        g = jax.make_array_from_callback(data.shape, s, lambda idx: data[idx])
        return jax.random.wrap_key_data(g, impl=impl)
    data = np.asarray(x)
    return jax.make_array_from_callback(data.shape, s, lambda idx: data[idx])


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a host batch on the mesh, sharded over the data axis.

    Scalar entries (e.g. ``_valid``) are replicated. On a single-device mesh
    this collapses to a plain ``device_put``: GSPMD-annotated arrays take a
    pathologically slow path on some backends (measured 130x on the tunneled
    axon chip) and carry no information when there is nothing to shard.

    Multi-host (``jax.process_count() > 1``): ``batch`` is this process's
    *local* slice of the global batch; ``make_array_from_process_local_data``
    assembles the global jax.Array from the per-host shards without any
    cross-host data movement (each host's rows land on its own devices; the
    global batch size is ``local_batch * num_processes``).
    """
    if mesh.devices.size == 1:
        dev = mesh.devices.reshape(-1)[0]
        return {k: jax.device_put(np.asarray(v), dev) for k, v in batch.items()}

    data = batch_sharding(mesh)
    repl = replicated_sharding(mesh)
    multihost = jax.process_count() > 1

    def place(x):
        x = np.asarray(x)
        if x.ndim < 1:
            return _put_global(x, repl)
        if multihost:
            return jax.make_array_from_process_local_data(data, x)
        return jax.device_put(x, data)

    return {k: place(v) for k, v in batch.items()}


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params/opt state) across the mesh.

    Single-device meshes use a plain ``device_put`` (see shard_batch)."""
    if mesh.devices.size == 1:
        dev = mesh.devices.reshape(-1)[0]
        return jax.device_put(tree, dev)
    repl = replicated_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(lambda x: _put_global(x, repl), tree)
    return jax.device_put(tree, repl)


def place_like(tree: Any, template: Any, mesh: Mesh) -> Any:
    """Re-place ``tree`` with the shardings of ``template`` (same structure).

    Used when restoring train state: Orbax restores to host/single-device
    arrays; this puts every leaf back on the mesh exactly where its live
    counterpart was (replicated or model-sharded). Template leaves that are
    not mesh-placed (e.g. optax step counters, which ``tx.init`` creates as
    plain single-device scalars) are replicated — committing them to one
    device would make the jitted step reject the mixed placement."""
    if mesh.devices.size == 1:
        dev = mesh.devices.reshape(-1)[0]
        return jax.device_put(tree, dev)
    repl = replicated_sharding(mesh)

    def place(x, t):
        s = getattr(t, "sharding", None)
        if isinstance(s, NamedSharding) and s.mesh == mesh:
            return _put_global(x, s)
        return _put_global(x, repl)

    return jax.tree_util.tree_map(place, tree, template)


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX. No-op when single-process (the common
    single-slice case); explicit args for DCN multi-slice deployments."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
