"""Interop with reference-format run checkpoints.

A user of the PyTorch reference has ``runs/<exp>/checkpoint-N/model.safetensors``
(flat torch state dict with ``backbone.*``/head keys) and
``runs/<exp>/inference_config.json`` (scripts/train.py:357-366 schema). This
framework must load those directly — the migration path."""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def reference_run(tmp_path_factory, encoder_dir):
    """Build a reference-layout run dir from a torch fusion model."""
    from tests.test_head_parity import TINY_TEXT, TINY_VISION, TorchFullFusion

    run = tmp_path_factory.mktemp("refrun")
    ckpt = run / "checkpoint-100"
    ckpt.mkdir()

    # the encoder fixture's config (tiny CLIP) — rebuild the same torch model
    with open(os.path.join(encoder_dir, "config.json")) as f:
        enc_cfg_dict = json.load(f)
    hf_cfg = transformers.CLIPConfig(
        text_config=enc_cfg_dict["text_config"],
        vision_config=enc_cfg_dict["vision_config"],
        projection_dim=enc_cfg_dict["projection_dim"],
    )
    torch.manual_seed(7)
    oracle = TorchFullFusion(hf_cfg, num_labels=5, fusion_dim=16).eval()

    from safetensors.torch import save_file

    save_file(oracle.state_dict(), str(ckpt / "model.safetensors"))

    # reference inference_config.json schema (scripts/train.py:357-366),
    # written to the run dir (parent of the checkpoint)
    with open(run / "inference_config.json", "w") as f:
        json.dump(
            {
                "encoder_name": "tiny-clip",
                "encoder_dir": encoder_dir,
                "backend": "clip",
                "fusion_dim": 16,
                "thresholds": [0.35, 0.7, 0.75, 0.3, 0.6],
                "class_names": ["racist", "sexist", "homophobe", "religion", "otherhate"],
                "best_checkpoint_dir": str(ckpt),
                "use_logit_adjustment": False,
            },
            f,
        )
    return str(ckpt), oracle, hf_cfg


def test_load_reference_checkpoint_logit_parity(reference_run, encoder_dir):
    """Converted reference checkpoint produces the torch model's logits."""
    from multimodal_content_moderation_tpu.models import model_io

    ckpt, oracle, hf_cfg = reference_run
    model, params, cfg = model_io.load_checkpoint(ckpt, encoder_dir)
    assert cfg["thresholds"][0] == 0.35

    g = np.random.default_rng(0)
    B = 3
    eos = hf_cfg.text_config.eos_token_id
    ids = g.integers(1, eos - 2, size=(B, 16)).astype(np.int64)
    ids[:, 8] = eos
    mask = np.ones((B, 16), np.int64)
    px = g.normal(size=(B, 3, 32, 32)).astype(np.float32)
    tp = np.ones((B,), np.float32)
    ip = np.ones((B,), np.float32)

    with torch.no_grad():
        ref = oracle(
            torch.tensor(ids),
            torch.tensor(mask),
            torch.tensor(px),
            torch.tensor(tp),
            torch.tensor(ip),
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


def test_evaluate_cli_on_reference_checkpoint(reference_run, data_dir, tmp_path):
    from multimodal_content_moderation_tpu.cli import evaluate as eval_cli

    ckpt, _, _ = reference_run
    out = str(tmp_path / "ref_eval.json")
    metrics = eval_cli.main(
        [
            "--checkpoint",
            ckpt,
            "--test_csv",
            f"{data_dir}/test.csv",
            "--image_root",
            f"{data_dir}/images",
            "--batch_size",
            "8",
            "--output",
            out,
        ]
    )
    assert os.path.exists(out)
    # calibrated thresholds from the reference config flowed through
    assert metrics["per_class"]["racist"]["threshold"] == 0.35


def test_inference_api_on_reference_checkpoint(reference_run, data_dir):
    from multimodal_content_moderation_tpu.cli.inference import MultiModalClassifier

    ckpt, _, _ = reference_run
    clf = MultiModalClassifier(ckpt, batch_size=4)
    r = clf.predict("hate hate", os.path.join(data_dir, "images", "im0.png"))
    assert r["predictions"]["racist"]["threshold"] == 0.35
