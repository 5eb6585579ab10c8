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


def _spawn_workers(tmp_path, source, n=2, timeout=300, extra_args=()):
    script = tmp_path / "worker.py"
    script.write_text(source)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port), *extra_args],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for i in range(n)
    ]
    outs = [p.communicate(timeout=timeout)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
    return outs


def test_two_process_global_batch_assembly(tmp_path):
    outs = _spawn_workers(tmp_path, WORKER)
    # sum(0..7) + sum(100..107) = 28 + 828 = 856
    for out in outs:
        totals = [l for l in out.splitlines() if l.startswith("TOTAL")]
        assert totals, out
        assert float(totals[0].split()[1]) == 856.0, out


# ---------------------------------------------------------------------------
# Multi-process TRAIN STEP (VERDICT r3 #5): the real production train step
# (make_train_step: value_and_grad + optax update, donated buffers) run by
# two OS processes over a global 8-device mesh must produce the same loss
# trajectory as the single-process 8-device run on the same global batches.
# ---------------------------------------------------------------------------

_TRAIN_COMMON = r"""
import numpy as np


def tiny_model_and_batches():
    import jax
    from multimodal_content_moderation_tpu.models import CLIPConfig, FusionModel
    from multimodal_content_moderation_tpu.models.clip import (
        CLIPTextConfig, CLIPVisionConfig,
    )

    cfg = CLIPConfig(
        text=CLIPTextConfig(
            vocab_size=64, hidden_size=32, num_layers=2, num_heads=2,
            intermediate_size=64, max_positions=12, eos_token_id=63,
        ),
        vision=CLIPVisionConfig(
            hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64,
            image_size=32, patch_size=16,
        ),
        projection_dim=32,
    )
    model = FusionModel.create("clip", num_labels=3, fusion_dim=16, clip_config=cfg)
    params = model.init(jax.random.key(0))

    def global_batch(step):
        g = np.random.default_rng(1000 + step)
        B = 16
        ids = g.integers(1, 62, size=(B, 12)).astype(np.int32)
        ids[:, 7] = 63
        return {
            "input_ids": ids,
            "attention_mask": np.ones((B, 12), np.int32),
            "pixel_values": g.normal(size=(B, 3, 32, 32)).astype(np.float32),
            "text_present": np.ones((B,), np.float32),
            "image_present": np.ones((B,), np.float32),
            "labels": (g.random((B, 3)) < 0.5).astype(np.float32),
        }

    return model, params, global_batch


def run_steps(model, params, global_batch, mesh, local_rows, n_steps=3):
    import jax
    import optax
    from multimodal_content_moderation_tpu.parallel.mesh import replicate, shard_batch
    from multimodal_content_moderation_tpu.training.loop import make_train_step

    tx = optax.adamw(1e-3)
    params = replicate(params, mesh)
    opt_state = replicate(tx.init(params), mesh)
    step = make_train_step(model, tx)
    rng = replicate(jax.random.key(7), mesh)
    losses = []
    for s in range(n_steps):
        gb = global_batch(s)
        batch = shard_batch({k: v[local_rows] for k, v in gb.items()}, mesh)
        params, opt_state, rng, loss = step(params, opt_state, rng, batch)
        losses.append(float(loss))
    return losses
"""

_TRAIN_WORKER = _TRAIN_COMMON + r"""
import os, sys
proc_id = int(sys.argv[1]); port = sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from multimodal_content_moderation_tpu.parallel.mesh import build_mesh, init_distributed

init_distributed(f"localhost:{port}", num_processes=2, process_id=proc_id)
assert jax.device_count() == 8 and jax.local_device_count() == 4
mesh = build_mesh()
model, params, global_batch = tiny_model_and_batches()
# each process feeds its half of every global batch (rows 0-7 / 8-15)
local = slice(proc_id * 8, proc_id * 8 + 8)
losses = run_steps(model, params, global_batch, mesh, local)
print("LOSSES", " ".join(f"{l:.8f}" for l in losses), flush=True)
"""


# ---------------------------------------------------------------------------
# Multi-process STREAMING EVAL (VERDICT r4 #8): the production bucketed u8
# eval loop (evaluate_logits_u8 + FastInferenceEngine on a mesh) run by two
# OS processes — each transferring only its half of every global batch, with
# logits allgathered back — must reproduce the single-process logits.
# ---------------------------------------------------------------------------

_EVAL_COMMON = r"""
import numpy as np


def build_eval(data_dir):
    import jax
    from multimodal_content_moderation_tpu.data.dataset import CSVDataset
    from multimodal_content_moderation_tpu.data.images import ImagePreprocessor
    from multimodal_content_moderation_tpu.models import CLIPConfig, FusionModel
    from multimodal_content_moderation_tpu.models.clip import (
        CLIPTextConfig, CLIPVisionConfig,
    )

    class VarLenTok:
        def encode_batch(self, texts, max_length):
            ids = np.zeros((len(texts), max_length), np.int32)
            mask = np.zeros_like(ids)
            for r, t in enumerate(texts):
                n = min(len(t.split()) + 2, max_length)
                ids[r, : n - 1] = 1 + (np.arange(n - 1) % 60)
                ids[r, n - 1] = 63
                mask[r, :n] = 1
            return ids, mask

        def __call__(self, texts, max_length):
            return self.encode_batch(texts, max_length)

    cfg = CLIPConfig(
        text=CLIPTextConfig(
            vocab_size=64, hidden_size=32, num_layers=2, num_heads=2,
            intermediate_size=64, max_positions=12, eos_token_id=63,
        ),
        vision=CLIPVisionConfig(
            hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64,
            image_size=32, patch_size=16,
        ),
        projection_dim=32,
    )
    model = FusionModel.create("clip", num_labels=3, fusion_dim=16, clip_config=cfg)
    params = model.init(jax.random.key(0))
    MEAN = STD = (0.5, 0.5, 0.5)
    pre = ImagePreprocessor(32, 32, MEAN, STD, output="uint8_hwc")
    ds = CSVDataset(
        data_dir + "/test.csv", data_dir + "/imgs", VarLenTok(), pre, 12,
        class_names=["racist", "sexist", "other"],
    )
    return model, params, ds, MEAN, STD
"""

_EVAL_WORKER = _EVAL_COMMON + r"""
import os, sys
proc_id = int(sys.argv[1]); port = sys.argv[2]
data_dir = sys.argv[3]; out_dir = sys.argv[4]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from multimodal_content_moderation_tpu.parallel.mesh import (
    build_mesh, init_distributed,
)

init_distributed(f"localhost:{port}", num_processes=2, process_id=proc_id)
assert jax.device_count() == 8 and jax.local_device_count() == 4
from multimodal_content_moderation_tpu.models.fast_infer import (
    FastInferenceEngine, evaluate_logits_u8,
)

model, params, ds, MEAN, STD = build_eval(data_dir)
engine = FastInferenceEngine(
    model, params, MEAN, STD, use_pallas=False, mesh=build_mesh()
)
lg, lb = evaluate_logits_u8(
    engine, ds, batch_size=8, num_workers=2, seq_buckets=(6, 8)
)
np.save(os.path.join(out_dir, f"logits_{proc_id}.npy"), lg)
print("EVAL_DONE", lg.shape, flush=True)
"""


def _build_eval_data(data_dir):
    import numpy as np
    import pandas as pd
    from PIL import Image

    img_dir = data_dir / "imgs"
    img_dir.mkdir(parents=True)
    g = np.random.default_rng(7)
    rows = []
    for i in range(20):  # 20 % 8 != 0: exercises last-batch padding
        if i == 4:
            name = "missing.png"  # degradation path: zeros + present=0
        else:
            name = f"im{i}.png"
            Image.fromarray(
                g.integers(0, 256, size=(36, 40, 3), dtype=np.uint8)
            ).save(img_dir / name)
        words = " ".join(["w"] * (1 + (7 * i) % 9))
        rows.append(
            {"text": words, "image_path": name,
             "labels": "racist" if i % 2 else "sexist"}
        )
    pd.DataFrame(rows).to_csv(data_dir / "test.csv", index=False)


@pytest.mark.slow
def test_two_process_bucketed_eval_matches_single_process(tmp_path):
    """Two OS processes x 4 virtual devices running the production bucketed
    streaming eval (evaluate_logits_u8, seq buckets, padded last batch,
    missing-image degradation) over a global 8-device mesh: the allgathered
    logits on BOTH hosts must equal the single-process run (SURVEY §5
    comm-backend row — multi-chip streaming evaluation)."""
    import numpy as np

    data_dir = tmp_path / "data"
    _build_eval_data(data_dir)

    ns = {}
    exec(compile(_EVAL_COMMON, "<eval_common>", "exec"), ns)
    model, params, ds, MEAN, STD = ns["build_eval"](str(data_dir))

    from multimodal_content_moderation_tpu.models.fast_infer import (
        FastInferenceEngine,
        evaluate_logits_u8,
    )

    single = FastInferenceEngine(model, params, MEAN, STD, use_pallas=False)
    lg_ref, lb_ref = evaluate_logits_u8(
        single, ds, batch_size=8, num_workers=2, seq_buckets=(6, 8)
    )

    outs = _spawn_workers(
        tmp_path, _EVAL_WORKER,
        extra_args=(str(data_dir), str(tmp_path)),
    )
    for proc_id, out in enumerate(outs):
        assert "EVAL_DONE" in out, out
        lg = np.load(tmp_path / f"logits_{proc_id}.npy")
        np.testing.assert_allclose(lg, lg_ref, atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_two_process_train_step_matches_single_process(tmp_path):
    """Two OS processes x 4 virtual devices running the production
    make_train_step over a global 8-device mesh: per-step losses must equal
    the single-process 8-device run on the same global batches (SURVEY §5
    comm-backend row — jax.distributed over DCN, not just batch assembly)."""
    import numpy as np

    # single-process reference on this process's own 8 virtual devices
    import jax  # conftest pinned CPU + 8 devices

    from multimodal_content_moderation_tpu.parallel.mesh import build_mesh

    ns = {}
    exec(compile(_TRAIN_COMMON, "<train_common>", "exec"), ns)
    model, params, global_batch = ns["tiny_model_and_batches"]()
    ref_losses = ns["run_steps"](
        model, params, global_batch, build_mesh(), slice(0, 16)
    )

    outs = _spawn_workers(tmp_path, _TRAIN_WORKER)
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("LOSSES")]
        assert lines, out
        got = [float(x) for x in lines[0].split()[1:]]
        np.testing.assert_allclose(got, ref_losses, rtol=1e-5, atol=1e-6)
