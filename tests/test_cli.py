"""End-to-end CLI tests: train -> evaluate -> inference on synthetic data
with a complete tiny local encoder checkpoint (config.json +
model.safetensors + tokenizer + preprocessor assets) — the exact asset layout
a real local clone of openai/clip-vit-base-patch32 provides."""

import json
import os

import numpy as np
import pytest
from PIL import Image

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from multimodal_content_moderation_tpu.data.tokenizer import bytes_to_unicode


@pytest.fixture(scope="module")
def encoder_dir(tmp_path_factory):
    """A tiny but complete CLIP encoder checkpoint directory."""
    d = tmp_path_factory.mktemp("encoder")
    # --- tokenizer assets
    b2u = bytes_to_unicode()
    vocab = {}
    for ch in b2u.values():
        vocab[ch] = len(vocab)
    for ch in b2u.values():
        vocab[ch + "</w>"] = len(vocab)
    merges = ["h a", "ha t", "hat e</w>", "l o", "lo v", "lov e</w>"]
    for m in merges:
        vocab["".join(m.split())] = len(vocab)
    bos = len(vocab)
    vocab["<|startoftext|>"] = bos
    eos = len(vocab)
    vocab["<|endoftext|>"] = eos
    with open(d / "vocab.json", "w") as f:
        json.dump(vocab, f)
    with open(d / "merges.txt", "w") as f:
        f.write("#version: 0.2\n")
        for m in merges:
            f.write(m + "\n")

    # --- model config + weights
    hf_cfg = transformers.CLIPConfig(
        text_config=dict(
            hidden_size=32,
            num_hidden_layers=1,
            num_attention_heads=2,
            intermediate_size=64,
            max_position_embeddings=16,
            vocab_size=len(vocab),
            eos_token_id=eos,
            bos_token_id=bos,
            pad_token_id=eos,
        ),
        vision_config=dict(
            hidden_size=32,
            num_hidden_layers=1,
            num_attention_heads=2,
            intermediate_size=64,
            image_size=32,
            patch_size=16,
        ),
        projection_dim=32,
    )
    torch.manual_seed(0)
    model = transformers.CLIPModel(hf_cfg).eval()
    from safetensors.torch import save_file

    save_file(model.state_dict(), str(d / "model.safetensors"))
    with open(d / "config.json", "w") as f:
        json.dump(hf_cfg.to_dict(), f)

    with open(d / "preprocessor_config.json", "w") as f:
        json.dump(
            {
                "size": {"shortest_edge": 32},
                "crop_size": {"height": 32, "width": 32},
                "image_mean": [0.48145466, 0.4578275, 0.40821073],
                "image_std": [0.26862954, 0.26130258, 0.27577711],
            },
            f,
        )
    return str(d)


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("data")
    img_dir = d / "images"
    img_dir.mkdir()
    g = np.random.default_rng(0)
    import pandas as pd

    def make_rows(n, offset=0):
        rows = []
        for i in range(n):
            k = i + offset
            pos = k % 2 == 0
            img = f"im{k}.png"
            Image.fromarray(
                g.integers(0, 256, size=(40, 44, 3), dtype=np.uint8)
            ).save(img_dir / img)
            rows.append(
                {
                    "text": "hate hate hate" if pos else "love love love",
                    "image_path": img,
                    "labels": "racist,otherhate" if pos else "sexist",
                }
            )
        return rows

    pd.DataFrame(make_rows(32)).to_csv(d / "train.csv", index=False)
    pd.DataFrame(make_rows(16, 100)).to_csv(d / "val.csv", index=False)
    pd.DataFrame(make_rows(16, 200)).to_csv(d / "test.csv", index=False)
    return str(d)


@pytest.fixture(scope="module")
def config_file(tmp_path_factory, encoder_dir, data_dir):
    d = tmp_path_factory.mktemp("cfg")
    cfg = f"""
model:
  backend: clip
  head: fusion
  encoder_name: tiny-clip
  encoder_dir: {encoder_dir}
  fusion_dim: 16
  max_text_length: 16
data:
  train_csv: {data_dir}/train.csv
  val_csv: {data_dir}/val.csv
  test_csv: {data_dir}/test.csv
  image_root: {data_dir}/images
  class_names: [racist, sexist, homophobe, religion, otherhate]
training:
  per_device_train_batch_size: 8
  per_device_eval_batch_size: 8
  num_train_epochs: 2
  lr_encoder: 1.0e-4
  lr_head: 1.0e-2
  num_workers: 2
logging:
  logging_steps: 1
early_stopping:
  enabled: false
seed: 0
"""
    path = d / "test.yaml"
    path.write_text(cfg)
    return str(path)


@pytest.fixture(scope="module")
def trained_run(config_file, tmp_path_factory):
    from multimodal_content_moderation_tpu.cli import train as train_cli

    out = str(tmp_path_factory.mktemp("run") / "exp")
    result = train_cli.main(
        ["--config", config_file, "--saving.output_dir", out]
    )
    return out, result


class TestTrainCLI:
    def test_artifacts_written(self, trained_run):
        out, result = trained_run
        for name in [
            "config.json",
            "val_report.json",
            "test_metrics.json",
            "inference_config.json",
            "label_map.json",
        ]:
            assert os.path.exists(os.path.join(out, name)), name

    def test_inference_config_schema(self, trained_run):
        out, _ = trained_run
        with open(os.path.join(out, "inference_config.json")) as f:
            cfg = json.load(f)
        # same keys the reference writes (scripts/train.py:357-366) + extras
        for k in [
            "encoder_name",
            "backend",
            "fusion_dim",
            "thresholds",
            "class_names",
            "best_checkpoint_dir",
            "use_logit_adjustment",
        ]:
            assert k in cfg, k
        assert len(cfg["thresholds"]) == 5
        assert cfg["class_names"][0] == "racist"
        assert os.path.isdir(cfg["best_checkpoint_dir"])

    def test_test_metrics_schema(self, trained_run):
        out, _ = trained_run
        with open(os.path.join(out, "test_metrics.json")) as f:
            m = json.load(f)
        for k in ["test_f1_macro", "test_f1_micro", "test_roc_macro", "test_samples_per_second"]:
            assert k in m

    def test_label_map(self, trained_run):
        out, _ = trained_run
        with open(os.path.join(out, "label_map.json")) as f:
            lm = json.load(f)
        assert lm["0"] == "racist" and lm["4"] == "otherhate"


class TestEvaluateCLI:
    def test_evaluate_checkpoint(self, trained_run, data_dir, tmp_path):
        from multimodal_content_moderation_tpu.cli import evaluate as eval_cli

        out, result = trained_run
        ckpt = result["result"]["best_checkpoint"]
        out_json = str(tmp_path / "eval.json")
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
                out_json,
            ]
        )
        assert os.path.exists(out_json)
        assert "f1_macro" in metrics and "per_class" in metrics
        assert "f1_calibrated" in metrics["per_class"]["racist"]


class TestInferenceCLI:
    def test_single_predict(self, trained_run, data_dir):
        from multimodal_content_moderation_tpu.cli.inference import MultiModalClassifier

        out, result = trained_run
        clf = MultiModalClassifier(result["result"]["best_checkpoint"], batch_size=4)
        r = clf.predict("hate hate hate", os.path.join(data_dir, "images", "im0.png"))
        assert set(r["predictions"].keys()) == {
            "racist",
            "sexist",
            "homophobe",
            "religion",
            "otherhate",
        }
        for v in r["predictions"].values():
            assert set(v.keys()) == {"label", "probability", "threshold"}
        assert isinstance(r["any_harmful"], bool)

    def test_predict_missing_image(self, trained_run):
        from multimodal_content_moderation_tpu.cli.inference import MultiModalClassifier

        _, result = trained_run
        clf = MultiModalClassifier(result["result"]["best_checkpoint"], batch_size=4)
        r = clf.predict("some text", "/nonexistent.jpg")
        assert "predictions" in r  # degraded, not crashed

    def test_batch_csv_mode(self, trained_run, data_dir, tmp_path):
        from multimodal_content_moderation_tpu.cli import inference as inf_cli

        _, result = trained_run
        out_csv = str(tmp_path / "preds.csv")
        inf_cli.main(
            [
                "--checkpoint",
                result["result"]["best_checkpoint"],
                "--input_csv",
                f"{data_dir}/test.csv",
                "--output_csv",
                out_csv,
                "--image_root",
                f"{data_dir}/images",
                "--batch_size",
                "8",
            ]
        )
        import pandas as pd

        df = pd.read_csv(out_csv)
        assert "pred_racist" in df.columns and "prob_otherhate" in df.columns
        assert "any_harmful" in df.columns
        assert len(df) == 16

    def test_batched_equals_single(self, trained_run, data_dir):
        """The batched fast path must produce the same probabilities as
        one-at-a-time prediction (the reference's predict/predict_batch
        contract)."""
        from multimodal_content_moderation_tpu.cli.inference import MultiModalClassifier

        _, result = trained_run
        clf = MultiModalClassifier(result["result"]["best_checkpoint"], batch_size=4)
        texts = ["hate hate hate", "love love love", "hate love"]
        paths = [os.path.join(data_dir, "images", f"im{i}.png") for i in range(3)]
        batch_results = clf.predict_batch(texts, paths)
        for t, p, br in zip(texts, paths, batch_results):
            single = clf.predict(t, p)
            for name in br["predictions"]:
                assert br["predictions"][name]["probability"] == pytest.approx(
                    single["predictions"][name]["probability"], abs=1e-5
                )


def test_prepare_data_mmhs150k_quirk(tmp_path):
    """Label-index mapping must reproduce the reference quirk: idx 0 ->
    racist, idx 5 dropped."""
    from multimodal_content_moderation_tpu.cli import prepare_data

    raw = tmp_path / "raw"
    (raw / "splits").mkdir(parents=True)
    gt = {
        "111": {"tweet_text": "t1", "labels": [0, 2], "labels_str": []},
        "222": {"tweet_text": "t2", "labels": [5], "labels_str": []},
        "333": {"tweet_text": "t3", "labels": [1, 4, 5], "labels_str": []},
    }
    (raw / "MMHS150K_GT.json").write_text(json.dumps(gt))
    (raw / "splits" / "train_ids.txt").write_text("111\n222\n333\n")

    out = tmp_path / "out"
    prepare_data.main(
        ["--dataset", "mmhs150k", "--raw_dir", str(raw), "--out_dir", str(out)]
    )
    import pandas as pd

    df = pd.read_csv(out / "train.csv")
    assert df.iloc[0]["labels"] == "racist,homophobe"
    assert pd.isna(df.iloc[1]["labels"])  # idx 5 dropped -> empty
    assert df.iloc[2]["labels"] == "sexist,otherhate"
    names = (out / "class_names.txt").read_text().split()
    assert names == ["racist", "sexist", "homophobe", "religion", "otherhate"]
