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


@pytest.fixture(scope="module")
def siglip_encoder_dir(tmp_path_factory):
    """Tiny SigLIP checkpoint dir (config + safetensors + tokenizer.json)."""
    import json

    import transformers
    from safetensors.torch import save_file

    d = tmp_path_factory.mktemp("siglip_qp_enc")
    words = ["<unk>", "<pad>", "hate", "love", "people", "you", "stop", "go",
             "bad", "good"]
    vocab = {w: i for i, w in enumerate(words)}
    with open(d / "tokenizer.json", "w") as f:
        json.dump(
            {
                "version": "1.0",
                "normalizer": {"type": "Lowercase"},
                "pre_tokenizer": {"type": "Whitespace"},
                "model": {
                    "type": "WordLevel", "vocab": vocab, "unk_token": "<unk>",
                },
                "added_tokens": [],
                "post_processor": None,
                "decoder": None,
            },
            f,
        )
    with open(d / "tokenizer_config.json", "w") as f:
        json.dump({"pad_token": "<pad>"}, f)
    hf_cfg = transformers.SiglipConfig(
        text_config=dict(
            hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
            intermediate_size=64, max_position_embeddings=16,
            vocab_size=len(vocab),
        ),
        vision_config=dict(
            hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
            intermediate_size=64, image_size=32, patch_size=16,
        ),
    )
    torch.manual_seed(0)
    model = transformers.SiglipModel(hf_cfg).eval()
    save_file(model.state_dict(), str(d / "model.safetensors"))
    with open(d / "config.json", "w") as f:
        json.dump(hf_cfg.to_dict(), f)
    with open(d / "preprocessor_config.json", "w") as f:
        json.dump(
            {
                "size": {"height": 32, "width": 32},
                "image_mean": [0.5, 0.5, 0.5],
                "image_std": [0.5, 0.5, 0.5],
            },
            f,
        )
    return str(d)


@pytest.mark.slow
def test_locked_mode_quality_parity_siglip(siglip_encoder_dir, data_dir):
    """Locked-mode parity for the second encoder family: the SigLIP fusion
    trajectory (torch SiglipModel pooler features vs our converted towers)
    must agree step-for-step, same as CLIP."""
    import quality_parity

    report = quality_parity.run(
        encoder_dir=siglip_encoder_dir,
        train_csv=f"{data_dir}/train.csv",
        val_csv=f"{data_dir}/val.csv",
        image_root=f"{data_dir}/images",
        class_names=["racist", "sexist", "homophobe", "religion", "otherhate"],
        mode="locked",
        epochs=1,
        batch_size=8,
        fusion_dim=16,
        max_text_length=16,
        lr=1e-3,
        backend="siglip",
    )
    assert report["max_step_loss_delta"] < 1e-4
    assert report["max_val_logit_delta"] < 1e-3
    assert report["delta"]["f1_macro"] <= 0.005
    assert report["delta"]["roc_macro"] <= 0.005


@pytest.mark.slow
def test_locked_fast_config_quality_parity(encoder_dir, data_dir):
    """The PRODUCTION fast train config (u8 wire + bf16 compute/scores +
    bf16 Adam accumulators + text_fit) on the JAX side vs the fp32 torch
    reference: same init + data order, so metric deltas isolate the fast
    recipe's precision effects — they must stay inside the +-0.005 band
    (VERDICT r3 #2; full-scale artifact via
    tools/run_fullscale_quality_parity.py --jax_fast)."""
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
        jax_fast=True,
    )
    assert report["mode"] == "locked_fast"
    assert "text_fit" in report["jax_config"]
    # bf16 everywhere: losses track loosely, metrics must hold the band
    assert report["max_step_loss_delta"] < 0.05
    assert report["delta"]["f1_macro"] <= 0.005
    assert report["delta"]["roc_macro"] <= 0.005


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
