"""End-to-end CLI coverage for the other model families: SigLIP fusion
(auto backend + Rust tokenizer.json assets) and CLIP MTL (hidden task heads +
learnable uncertainty weights)."""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def siglip_encoder_dir(tmp_path_factory):
    """Tiny but complete SigLIP checkpoint dir: config.json +
    model.safetensors + tokenizer.json + preprocessor_config.json."""
    d = tmp_path_factory.mktemp("siglip_enc")

    # --- tokenizer.json via the Rust `tokenizers` library (wordlevel)
    from tokenizers import Tokenizer, models, pre_tokenizers

    words = ["<pad>", "<unk>", "hate", "love", "the", "a", "thing"]
    vocab = {w: i for i, w in enumerate(words)}
    tk = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tk.pre_tokenizer = pre_tokenizers.Whitespace()
    tk.save(str(d / "tokenizer.json"))
    with open(d / "tokenizer_config.json", "w") as f:
        json.dump({"pad_token": "<pad>"}, f)

    hf_cfg = transformers.SiglipConfig(
        text_config=dict(
            hidden_size=32,
            num_hidden_layers=1,
            num_attention_heads=2,
            intermediate_size=64,
            max_position_embeddings=16,
            vocab_size=len(vocab),
        ),
        vision_config=dict(
            hidden_size=32,
            num_hidden_layers=1,
            num_attention_heads=2,
            intermediate_size=64,
            image_size=32,
            patch_size=16,
        ),
    )
    torch.manual_seed(0)
    model = transformers.SiglipModel(hf_cfg).eval()
    from safetensors.torch import save_file

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


def _write_cfg(tmp_path, encoder_dir, data_dir, extra_model: str, max_len=16):
    cfg = f"""
model:
  backend: clip
  head: fusion
  encoder_dir: {encoder_dir}
  fusion_dim: 16
  max_text_length: {max_len}
{extra_model}
data:
  train_csv: {data_dir}/train.csv
  val_csv: {data_dir}/val.csv
  test_csv: {data_dir}/test.csv
  image_root: {data_dir}/images
  class_names: [racist, sexist, homophobe, religion, otherhate]
training:
  per_device_train_batch_size: 8
  per_device_eval_batch_size: 8
  num_train_epochs: 1
  num_workers: 2
early_stopping:
  enabled: false
seed: 0
"""
    p = tmp_path / "variant.yaml"
    p.write_text(cfg)
    return str(p)


@pytest.mark.slow
def test_siglip_fusion_end_to_end(siglip_encoder_dir, data_dir, tmp_path):
    from multimodal_content_moderation_tpu.cli import train as train_cli
    from multimodal_content_moderation_tpu.cli.inference import MultiModalClassifier

    cfg = _write_cfg(
        tmp_path,
        siglip_encoder_dir,
        data_dir,
        extra_model="  backend: siglip\n",
    )
    out = str(tmp_path / "siglip_run")
    result = train_cli.main(["--config", cfg, "--saving.output_dir", out])
    with open(os.path.join(out, "inference_config.json")) as f:
        icfg = json.load(f)
    assert icfg["backend"] == "siglip"

    clf = MultiModalClassifier(result["result"]["best_checkpoint"], batch_size=4)
    r = clf.predict("hate the thing", None)
    assert len(r["predictions"]) == 5

    # fast-engine evaluate with SigLIP seq buckets (carry-column path) must
    # reproduce the unbucketed fast-engine results exactly through the REAL
    # CLI surface (per-class probabilities land in eval_results.json)
    from multimodal_content_moderation_tpu.cli import evaluate as eval_cli

    ckpt = result["result"]["best_checkpoint"]
    common = [
        "--checkpoint", ckpt,
        "--test_csv", f"{data_dir}/test.csv",
        "--image_root", f"{data_dir}/images",
        "--batch_size", "8",
        "--engine", "fast",
    ]
    m_off = eval_cli.main(
        common + ["--seq_buckets", "off", "--output", str(tmp_path / "off.json")]
    )
    m_b = eval_cli.main(
        common + ["--seq_buckets", "6,8", "--output", str(tmp_path / "b.json")]
    )
    assert m_b["f1_macro"] == pytest.approx(m_off["f1_macro"], abs=1e-9)
    assert m_b["roc_auc_macro"] == pytest.approx(m_off["roc_auc_macro"], abs=1e-7)


def test_siglip_backbone_weights_loaded_not_random(siglip_encoder_dir):
    """init_from_encoder_dir must convert the HF SigLIP weights."""
    import jax

    from multimodal_content_moderation_tpu.models import model_io
    from safetensors.numpy import load_file

    enc_cfg = model_io.load_encoder_config(siglip_encoder_dir, "siglip")
    model = model_io.build_model(
        "fusion", "siglip", ["a", "b"], fusion_dim=8, siglip_config=enc_cfg
    )
    params = model_io.init_from_encoder_dir(
        model, siglip_encoder_dir, jax.random.key(0)
    )
    sd = load_file(os.path.join(siglip_encoder_dir, "model.safetensors"))
    ref = sd["text_model.embeddings.token_embedding.weight"]
    np.testing.assert_allclose(
        np.asarray(params["backbone"]["text_model"]["token_embedding"]), ref
    )


def test_backend_auto_resolves_from_config_json(encoder_dir, siglip_encoder_dir):
    """The reference's ``backend: auto`` (AutoModel dispatch, fusion.py:88-111)
    maps here to model_type detection from the local encoder config.json."""
    from multimodal_content_moderation_tpu.models import model_io

    assert model_io.resolve_backend(encoder_dir, "auto") == "clip"
    assert model_io.resolve_backend(siglip_encoder_dir, "auto") == "siglip"
    # explicit values pass through untouched
    assert model_io.resolve_backend(encoder_dir, "siglip") == "siglip"
    # no config.json -> the reference's non-CLIP AutoModel branch
    assert model_io.resolve_backend("/nonexistent", "auto") == "siglip"


@pytest.mark.slow
def test_backend_auto_trains_clip_encoder(encoder_dir, data_dir, tmp_path):
    """backend: auto + a CLIP encoder dir must resolve to the CLIP tower
    path end-to-end (previously misparsed the config as SigLIP)."""
    from multimodal_content_moderation_tpu.cli import train as train_cli

    cfg = _write_cfg(
        tmp_path, encoder_dir, data_dir, extra_model="  backend: auto\n"
    )
    out = str(tmp_path / "auto_run")
    train_cli.main(["--config", cfg, "--saving.output_dir", out])
    with open(os.path.join(out, "inference_config.json")) as f:
        icfg = json.load(f)
    assert icfg["backend"] == "clip"


@pytest.mark.slow
def test_mtl_end_to_end(encoder_dir, data_dir, tmp_path):
    from multimodal_content_moderation_tpu.cli import train as train_cli
    from multimodal_content_moderation_tpu.cli import evaluate as eval_cli
    from multimodal_content_moderation_tpu.cli.inference import MultiModalClassifier

    cfg = _write_cfg(
        tmp_path,
        encoder_dir,
        data_dir,
        extra_model="  head: mtl\n  head_hidden_dim: 8\n  learnable_task_weights: true\n",
    )
    out = str(tmp_path / "mtl_run")
    result = train_cli.main(["--config", cfg, "--saving.output_dir", out])
    with open(os.path.join(out, "inference_config.json")) as f:
        icfg = json.load(f)
    assert icfg["head"] == "mtl"
    assert icfg["head_hidden_dim"] == 8
    assert icfg["learnable_task_weights"] is True

    # per-task metric keys present in the val report
    with open(os.path.join(out, "val_report.json")) as f:
        val = json.load(f)
    assert "f1_racist" in val and "roc_otherhate" in val

    # reload through the orbax path and serve
    clf = MultiModalClassifier(result["result"]["best_checkpoint"], batch_size=4)
    r = clf.predict("hate hate", None)
    assert len(r["predictions"]) == 5

    metrics = eval_cli.main(
        [
            "--checkpoint",
            result["result"]["best_checkpoint"],
            "--test_csv",
            f"{data_dir}/test.csv",
            "--image_root",
            f"{data_dir}/images",
            "--batch_size",
            "8",
            "--output",
            str(tmp_path / "mtl_eval.json"),
        ]
    )
    assert "per_class" in metrics
