"""Export round-trip: JAX params -> reference-format safetensors -> torch.

The exported state dict must (a) convert back into an identical pytree and
(b) load into the torch oracle with matching logits — proving reference users
can consume TPU-trained checkpoints unchanged."""

import numpy as np
import pytest

import jax

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from multimodal_content_moderation_tpu.models import CLIPConfig, FusionModel, MultiTaskModel
from multimodal_content_moderation_tpu.models.convert import (
    fusion_model_from_torch,
    mtl_model_from_torch,
)
from multimodal_content_moderation_tpu.models.export import (
    export_safetensors,
    fusion_model_to_torch,
    mtl_model_to_torch,
)
from tests.test_head_parity import TINY_TEXT, TINY_VISION, TorchFullFusion, TorchFullMTL


def _tiny_cfg():
    hf_cfg = transformers.CLIPConfig(
        text_config=dict(TINY_TEXT), vision_config=dict(TINY_VISION), projection_dim=32
    )
    return hf_cfg, CLIPConfig.from_hf(hf_cfg)


def _tree_equal(a, b):
    flat_a = jax.tree_util.tree_leaves_with_path(a)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(b))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_b[path]), atol=1e-7,
            err_msg=jax.tree_util.keystr(path),
        )


def test_fusion_export_roundtrip_and_torch_load(tmp_path):
    hf_cfg, cfg = _tiny_cfg()
    model = FusionModel.create("clip", num_labels=5, fusion_dim=32, clip_config=cfg)
    params = model.init(jax.random.key(0))

    sd = fusion_model_to_torch(params, model)
    back = fusion_model_from_torch(sd, "clip", clip_cfg=cfg)
    _tree_equal(params, back)

    # the torch oracle must accept the exported dict with zero missing keys
    torch.manual_seed(0)
    oracle = TorchFullFusion(hf_cfg, num_labels=5, fusion_dim=32).eval()
    missing, unexpected = oracle.load_state_dict(
        {k: torch.tensor(v) for k, v in sd.items()}, strict=False
    )
    # position_ids buffers may be absent from our export; nothing else
    assert not unexpected
    assert all("position_ids" in m for m in missing)

    # logits parity through torch after the round trip
    g = np.random.default_rng(0)
    B = 2
    ids = g.integers(1, 900, size=(B, 77)).astype(np.int64)
    ids[:, 9] = 999
    mask = np.ones((B, 77), np.int64)
    px = g.normal(size=(B, 3, 32, 32)).astype(np.float32)
    tp = np.ones((B,), np.float32)
    ip = np.ones((B,), np.float32)
    with torch.no_grad():
        ref = oracle(
            torch.tensor(ids), torch.tensor(mask), torch.tensor(px),
            torch.tensor(tp), torch.tensor(ip),
        ).numpy()
    got = np.asarray(
        model.apply(
            params,
            {
                "input_ids": ids,
                "attention_mask": mask,
                "pixel_values": px,
                "text_present": tp,
                "image_present": ip,
            },
        )["logits"]
    )
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-4)

    # file-level API
    from safetensors.numpy import load_file

    path = export_safetensors(params, model, str(tmp_path / "model.safetensors"))
    assert set(load_file(path).keys()) == set(sd.keys())


def test_mtl_export_roundtrip(tmp_path):
    hf_cfg, cfg = _tiny_cfg()
    model = MultiTaskModel.create(
        "clip", num_tasks=3, fusion_dim=32, head_hidden_dim=16,
        learnable_task_weights=True, clip_config=cfg,
    )
    params = model.init(jax.random.key(1))
    sd = mtl_model_to_torch(params, model)
    back = mtl_model_from_torch(sd, "clip", num_tasks=3, clip_cfg=cfg)
    _tree_equal(params, back)

    torch.manual_seed(1)
    oracle = TorchFullMTL(hf_cfg, num_tasks=3, fusion_dim=32, head_hidden_dim=16)
    # add log_vars to the oracle to mirror learnable_task_weights
    oracle.log_vars = torch.nn.Parameter(torch.zeros(3))
    missing, unexpected = oracle.load_state_dict(
        {k: torch.tensor(v) for k, v in sd.items()}, strict=False
    )
    assert not unexpected
    assert all("position_ids" in m for m in missing)


def test_export_cli_roundtrip(trained_run, data_dir, tmp_path):
    """Orbax run -> export CLI -> reference-format bundle -> inference API."""
    from multimodal_content_moderation_tpu.cli import export as export_cli
    from multimodal_content_moderation_tpu.cli.inference import MultiModalClassifier

    _, result = trained_run
    ckpt = result["result"]["best_checkpoint"]
    out = str(tmp_path / "exported")
    export_cli.main(["--checkpoint", ckpt, "--output_dir", out])

    import os

    bundle = os.path.join(out, "checkpoint-exported")
    assert os.path.exists(os.path.join(bundle, "model.safetensors"))
    assert os.path.exists(os.path.join(bundle, "vocab.json"))  # assets carried

    # the exported bundle loads through the same API as a reference checkpoint
    clf_ref = MultiModalClassifier(bundle, batch_size=4)
    clf_orbax = MultiModalClassifier(ckpt, batch_size=4)
    r1 = clf_ref.predict("hate hate hate", None)
    r2 = clf_orbax.predict("hate hate hate", None)
    for name in r1["predictions"]:
        assert r1["predictions"][name]["probability"] == pytest.approx(
            r2["predictions"][name]["probability"], abs=1e-5
        )
