"""Quality-parity harness (tools/quality_parity.py) on the synthetic fixture.

In locked mode (identical init, identical data, dropout off) the torch and
JAX fine-tunes are the same trajectory up to fp32 numerics, so the final
metrics must agree within the BASELINE +-0.005 band — proving the harness
and the training stack; pointing it at real MMHS150K assets is then just a
path change.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("transformers")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


@pytest.mark.slow
def test_locked_mode_quality_parity(encoder_dir, data_dir):
    import quality_parity

    report = quality_parity.run(
        encoder_dir=encoder_dir,
        train_csv=f"{data_dir}/train.csv",
        val_csv=f"{data_dir}/val.csv",
        image_root=f"{data_dir}/images",
        class_names=["racist", "sexist", "homophobe", "religion", "otherhate"],
        mode="locked",
        epochs=2,
        batch_size=8,
        fusion_dim=16,
        max_text_length=16,
        lr=1e-3,
    )
    assert report["steps"] == 8  # 32 rows / 8 per batch * 2 epochs
    # same trajectory up to numerics
    assert report["max_step_loss_delta"] < 1e-4
    assert report["max_val_logit_delta"] < 1e-3
    # BASELINE quality band
    assert report["delta"]["f1_macro"] <= 0.005
    assert report["delta"]["roc_macro"] <= 0.005


@pytest.mark.slow
def test_cli_exit_code(encoder_dir, data_dir, tmp_path, capsys):
    import quality_parity

    out = tmp_path / "report.json"
    rc = quality_parity.main(
        [
            "--encoder_dir", encoder_dir,
            "--train_csv", f"{data_dir}/train.csv",
            "--val_csv", f"{data_dir}/val.csv",
            "--image_root", f"{data_dir}/images",
            "--class_names", "racist,sexist,homophobe,religion,otherhate",
            "--epochs", "1",
            "--batch_size", "8",
            "--fusion_dim", "16",
            "--max_text_length", "16",
            "--output", str(out),
        ]
    )
    assert rc == 0
    assert out.exists()


@pytest.mark.slow
def test_locked_mode_quality_parity_mtl(encoder_dir, data_dir):
    """Locked-mode parity for the MTL head (the reference's best-published
    configuration), incl. hidden task heads."""
    import quality_parity

    report = quality_parity.run(
        encoder_dir=encoder_dir,
        train_csv=f"{data_dir}/train.csv",
        val_csv=f"{data_dir}/val.csv",
        image_root=f"{data_dir}/images",
        class_names=["racist", "sexist", "homophobe", "religion", "otherhate"],
        mode="locked",
        epochs=1,
        batch_size=8,
        fusion_dim=16,
        head="mtl",
        head_hidden_dim=8,
        max_text_length=16,
        lr=1e-3,
    )
    assert report["head"] == "mtl"
    assert report["max_step_loss_delta"] < 1e-4
    assert report["delta"]["f1_macro"] <= 0.005
    assert report["delta"]["roc_macro"] <= 0.005
