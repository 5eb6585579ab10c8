"""REAL multi-host test: two OS processes, 4 virtual CPU devices each,
jax.distributed + gloo collectives.

Verifies the actual multi-host path (not just its single-process
equivalence): ``init_distributed`` wires the cluster, ``shard_batch``
assembles the global batch from per-process local shards via
``make_array_from_process_local_data``, and a jitted global reduction
produces the same (correct) value on every host.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
proc_id = int(sys.argv[1]); port = sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from multimodal_content_moderation_tpu.parallel.mesh import (
    build_mesh, init_distributed, shard_batch,
)
init_distributed(f"localhost:{port}", num_processes=2, process_id=proc_id)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8 and jax.local_device_count() == 4
mesh = build_mesh()  # 8 x 1 across both processes
import numpy as np, jax.numpy as jnp
# each process contributes 8 local rows -> global batch of 16
local = (np.arange(8, dtype=np.float32) + 100.0 * proc_id).reshape(8, 1)
batch = shard_batch({"x": local}, mesh)
assert batch["x"].shape == (16, 1), batch["x"].shape
total = jax.jit(lambda b: jnp.sum(b["x"]))(batch)
print("TOTAL", float(total), flush=True)
"""


def test_two_process_global_batch_assembly(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
    # sum(0..7) + sum(100..107) = 28 + 828 = 856
    for out in outs:
        totals = [l for l in out.splitlines() if l.startswith("TOTAL")]
        assert totals, out
        assert float(totals[0].split()[1]) == 856.0, out
