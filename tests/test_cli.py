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


    def test_evaluate_cli_compile_cache_env(
        self, trained_run, data_dir, tmp_path, monkeypatch
    ):
        """MMHARM_COMPILE_CACHE on the evaluate CLI persists XLA executables
        (the serving/CLI cold-start knob, utils/compile_cache)."""
        import jax

        from multimodal_content_moderation_tpu.cli import evaluate as eval_cli

        out, result = trained_run
        ckpt = result["result"]["best_checkpoint"]
        cache = tmp_path / "xla_cache"
        monkeypatch.setenv("MMHARM_COMPILE_CACHE", str(cache))
        try:
            metrics = eval_cli.main(
                [
                    "--checkpoint", ckpt,
                    "--test_csv", f"{data_dir}/test.csv",
                    "--image_root", f"{data_dir}/images",
                    "--batch_size", "8",
                    "--output", str(tmp_path / "eval.json"),
                ]
            )
        finally:
            jax.config.update("jax_compilation_cache_dir", None)
        assert "f1_macro" in metrics
        assert cache.is_dir() and any(cache.iterdir()), (
            "no persistent XLA cache entries written by the evaluate CLI"
        )


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

    def test_native_scaled_backend_matches_pil(self, trained_run, tmp_path):
        """--image_backend native_scaled (fused C++ libjpeg decode) must
        produce near-identical probabilities to the reference-exact PIL
        path on real JPEG inputs."""
        from multimodal_content_moderation_tpu.cli.inference import MultiModalClassifier
        from multimodal_content_moderation_tpu.data import native

        if not native.jpeg_available():
            pytest.skip("libjpeg build unavailable")
        _, result = trained_run
        g = np.random.default_rng(7)
        base = np.add.outer(
            np.linspace(0, 255, 120), np.linspace(0, 255, 150)
        )
        arr = (base[..., None] / 2 + g.random((120, 150, 3)) * 30).astype(
            np.uint8
        )
        p = str(tmp_path / "tweet.jpg")
        Image.fromarray(arr).save(p, quality=88)

        ckpt = result["result"]["best_checkpoint"]
        r_pil = MultiModalClassifier(ckpt, batch_size=4).predict("some text", p)
        r_nat = MultiModalClassifier(
            ckpt, batch_size=4, image_backend="native_scaled"
        ).predict("some text", p)
        for name in r_pil["predictions"]:
            assert r_nat["predictions"][name]["probability"] == pytest.approx(
                r_pil["predictions"][name]["probability"], abs=5e-3
            )

    def test_evaluate_cli_native_backend(self, trained_run, tmp_path):
        """evaluate --image_backend native_scaled runs the fused decode path
        end-to-end over a JPEG test CSV."""
        from multimodal_content_moderation_tpu.cli import evaluate as eval_cli
        from multimodal_content_moderation_tpu.data import native

        if not native.jpeg_available():
            pytest.skip("libjpeg build unavailable")
        _, result = trained_run
        img_dir = tmp_path / "img"
        img_dir.mkdir()
        g = np.random.default_rng(3)
        rows = ["text,image_path,labels"]
        for i in range(8):
            arr = (g.random((80, 100, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(str(img_dir / f"{i}.jpg"), quality=85)
            lab = "racist,otherhate" if i % 2 == 0 else "sexist"
            rows.append(f"tweet {i},{i}.jpg,\"{lab}\"")
        csv = tmp_path / "test.csv"
        csv.write_text("\n".join(rows) + "\n")

        out_json = str(tmp_path / "eval.json")
        metrics = eval_cli.main(
            [
                "--checkpoint", result["result"]["best_checkpoint"],
                "--test_csv", str(csv),
                "--image_root", str(img_dir),
                "--batch_size", "8",
                "--output", out_json,
                "--image_backend", "native_scaled",
            ]
        )
        assert np.isfinite(metrics["f1_macro"])
        assert os.path.exists(out_json)

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


def test_inference_bf16_precision_close_to_fp32(trained_run, data_dir):
    """precision='bf16_fast' serving stays close to the fp32 path."""
    from multimodal_content_moderation_tpu.cli.inference import MultiModalClassifier

    _, result = trained_run
    ckpt = result["result"]["best_checkpoint"]
    clf32 = MultiModalClassifier(ckpt, batch_size=4)
    clf16 = MultiModalClassifier(ckpt, batch_size=4, precision="bf16_fast")
    img = os.path.join(data_dir, "images", "im0.png")
    r32 = clf32.predict("hate hate hate", img)
    r16 = clf16.predict("hate hate hate", img)
    for name in r32["predictions"]:
        assert r16["predictions"][name]["probability"] == pytest.approx(
            r32["predictions"][name]["probability"], abs=0.03
        )


def test_fast_engine_serving_equals_standard(trained_run, data_dir):
    """MultiModalClassifier(engine='fast') — the u8 wire + Pallas embed
    path — must match the standard pixel path, including the missing-image
    degradation branch."""
    from multimodal_content_moderation_tpu.cli.inference import MultiModalClassifier

    _, result = trained_run
    ckpt = result["result"]["best_checkpoint"]
    std = MultiModalClassifier(ckpt, batch_size=4)
    fast = MultiModalClassifier(ckpt, batch_size=4, engine="fast")
    cases = [
        ("hate hate hate", os.path.join(data_dir, "images", "im0.png")),
        ("love love love", os.path.join(data_dir, "images", "im1.png")),
        ("missing image case", "/nonexistent.png"),
        ("", os.path.join(data_dir, "images", "im2.png")),
    ]
    for text, img in cases:
        a = std.predict(text, img)
        b = fast.predict(text, img)
        for name in a["predictions"]:
            assert b["predictions"][name]["probability"] == pytest.approx(
                a["predictions"][name]["probability"], abs=1e-3
            ), (text, img, name)


@pytest.mark.slow
def test_train_text_fit_exact(config_file, trained_run, tmp_path):
    """training.text_fit=auto shrinks the static text width to the data's
    longest row (16 -> 8 here). For CLIP (causal + EOS pooling) the dropped
    columns carry zero pooled activations AND zero gradients, so the whole
    training trajectory — per-epoch val metrics and calibrated thresholds —
    must match the padded run, not just the final model."""
    from multimodal_content_moderation_tpu.cli import train as train_cli

    _, base = trained_run
    out = str(tmp_path / "fit")
    r = train_cli.main(
        ["--config", config_file, "--saving.output_dir", out,
         "--training.text_fit", "auto"]
    )
    def is_timing(k):
        return "runtime" in k or "per_second" in k or "ms" in k

    hist_fit = r["result"]["history"]
    hist_off = base["result"]["history"]
    assert len(hist_fit) == len(hist_off) and hist_fit
    for m_fit, m_off in zip(hist_fit, hist_off):
        for k, v in m_off.items():
            if isinstance(v, float) and not is_timing(k):
                assert m_fit[k] == pytest.approx(v, abs=1e-5), k
    for k, v in base["val"].items():
        if isinstance(v, float) and not is_timing(k):
            assert r["val"][k] == pytest.approx(v, abs=1e-5), k
    assert r["thresholds"] == pytest.approx(base["thresholds"], abs=1e-6)


def test_fast_engine_seq_buckets_exact(trained_run, data_dir):
    """Per-batch text bucketing in forward_batch (fast engine + CLIP) must
    leave probabilities unchanged — positions past a row's EOS are dead
    compute (causal text tower + EOS pooling), so running the batch at the
    6-token bucket instead of padded 16 is exact, not approximate."""
    from multimodal_content_moderation_tpu.cli.inference import MultiModalClassifier

    _, result = trained_run
    ckpt = result["result"]["best_checkpoint"]
    off = MultiModalClassifier(ckpt, batch_size=4, engine="fast", seq_buckets="off")
    # batch_size=2 < n=4 also engages the length-sorted visiting order in
    # _logits (scatter-back must restore input order exactly)
    bkt = MultiModalClassifier(ckpt, batch_size=2, engine="fast", seq_buckets="6")
    assert bkt._bucket_ladder == [6, bkt.max_len]
    texts = ["hate hate hate", "love love love", "", "hate love"]
    paths = [
        os.path.join(data_dir, "images", "im0.png"),
        os.path.join(data_dir, "images", "im1.png"),
        os.path.join(data_dir, "images", "im2.png"),
        "/nonexistent.png",  # degradation branch
    ]
    a = off.predict_batch(texts, paths)
    b = bkt.predict_batch(texts, paths)
    for ra, rb in zip(a, b):
        for name in ra["predictions"]:
            assert rb["predictions"][name]["probability"] == pytest.approx(
                ra["predictions"][name]["probability"], abs=1e-6
            )
    # single-row path too
    sa = off.predict(texts[0], paths[0])
    sb = bkt.predict(texts[0], paths[0])
    for name in sa["predictions"]:
        assert sb["predictions"][name]["probability"] == pytest.approx(
            sa["predictions"][name]["probability"], abs=1e-6
        )


def test_evaluate_cli_fast_engine_matches_standard(trained_run, data_dir, tmp_path):
    """--engine fast (u8 wire + fused embed, decode included in the timing
    boundary) must reproduce the standard path's metrics."""
    from multimodal_content_moderation_tpu.cli import evaluate as eval_cli

    out, result = trained_run
    ckpt = result["result"]["best_checkpoint"]
    common = [
        "--checkpoint", ckpt,
        "--test_csv", f"{data_dir}/test.csv",
        "--image_root", f"{data_dir}/images",
        "--batch_size", "8",
    ]
    m_std = eval_cli.main(common + ["--output", str(tmp_path / "std.json")])
    m_fast = eval_cli.main(
        common + ["--engine", "fast", "--output", str(tmp_path / "fast.json")]
    )
    assert m_fast["f1_macro"] == pytest.approx(m_std["f1_macro"], abs=1e-6)
    assert m_fast["roc_auc_macro"] == pytest.approx(m_std["roc_auc_macro"], abs=1e-4)


def test_evaluate_cli_pallas_attention_matches_xla(trained_run, data_dir, tmp_path):
    """--attention pallas (the [B,T,D]-layout fused kernel at these seq
    lengths; interpret mode on CPU) must reproduce the XLA path's metrics."""
    from multimodal_content_moderation_tpu.cli import evaluate as eval_cli

    out, result = trained_run
    ckpt = result["result"]["best_checkpoint"]
    common = [
        "--checkpoint", ckpt,
        "--test_csv", f"{data_dir}/test.csv",
        "--image_root", f"{data_dir}/images",
        "--batch_size", "8",
    ]
    m_xla = eval_cli.main(common + ["--output", str(tmp_path / "xla.json")])
    m_pal = eval_cli.main(
        common + ["--attention", "pallas", "--output", str(tmp_path / "pal.json")]
    )
    assert m_pal["f1_macro"] == pytest.approx(m_xla["f1_macro"], abs=1e-6)
    assert m_pal["roc_auc_macro"] == pytest.approx(m_xla["roc_auc_macro"], abs=1e-4)


@pytest.mark.slow
def test_train_cli_u8_wire(config_file, tmp_path):
    """training.wire=u8 trains end to end (u8 crops on the wire, normalize
    folded into the patch embed) and produces the same artifact schema."""
    import yaml

    from multimodal_content_moderation_tpu.cli import train as train_cli

    with open(config_file) as f:
        cfg = yaml.safe_load(f)
    cfg["training"]["wire"] = "u8"
    cfg["training"]["num_train_epochs"] = 1
    p = tmp_path / "u8.yaml"
    p.write_text(yaml.safe_dump(cfg))
    out = str(tmp_path / "run_u8")
    result = train_cli.main(["--config", str(p), "--saving.output_dir", out])
    assert os.path.exists(os.path.join(out, "inference_config.json"))
    assert np.isfinite(result["val"]["loss"])


def test_prepare_data_hateful_memes_offline(tmp_path):
    """--local_dir converts an existing snapshot without any network:
    3 jsonl splits -> binary-label CSVs + class_names.txt + copied images."""
    from multimodal_content_moderation_tpu.cli import prepare_data as prep_cli

    snap = tmp_path / "snapshot"
    (snap / "img").mkdir(parents=True)
    Image.fromarray(np.zeros((4, 4, 3), np.uint8)).save(snap / "img" / "a.png")
    rows = {
        "train.jsonl": [
            {"id": 1, "img": "img/a.png", "label": 1, "text": "bad meme"},
            {"id": 2, "img": "img/a.png", "label": 0, "text": "fine meme"},
        ],
        "dev_seen.jsonl": [{"id": 3, "img": "img/a.png", "label": 1, "text": "x"}],
        "test_seen.jsonl": [{"id": 4, "img": "img/a.png", "label": 0, "text": "y"}],
    }
    for name, recs in rows.items():
        with open(snap / name, "w") as f:
            for r in recs:
                f.write(json.dumps(r) + "\n")

    out = tmp_path / "out"
    prep_cli.main(
        [
            "--dataset", "hateful_memes",
            "--out_dir", str(out),
            "--local_dir", str(snap),
        ]
    )
    d = out / "hateful_memes"
    import pandas as pd

    train = pd.read_csv(d / "train.csv")
    assert list(train.columns) == ["text", "image_path", "label"]
    assert train["label"].tolist() == [1, 0]
    assert train["image_path"].tolist() == ["a.png", "a.png"]
    assert (d / "images" / "a.png").exists()
    assert (d / "class_names.txt").read_text().strip() == "hateful"
    assert len(pd.read_csv(d / "val.csv")) == 1
    assert len(pd.read_csv(d / "test.csv")) == 1


def test_logit_adjustment_applied(trained_run, data_dir, tmp_path):
    """use_logit_adjustment=true shifts probabilities by sigma(l - log(p/(1-p)))
    (opt-in; the reference wrote the flag + priors but never consumed them)."""
    import shutil

    from multimodal_content_moderation_tpu.cli.inference import MultiModalClassifier

    out, result = trained_run
    ckpt = result["result"]["best_checkpoint"]
    # clone the run dir and flip the flag in inference_config.json
    adj_dir = tmp_path / "adjrun"
    shutil.copytree(out, adj_dir)
    cfg_path = adj_dir / "inference_config.json"
    cfg = json.loads(cfg_path.read_text())
    cfg["use_logit_adjustment"] = True
    cfg_path.write_text(json.dumps(cfg))

    plain = MultiModalClassifier(ckpt)
    # the copied run dir carries the same checkpoint; config discovery walks
    # up from the checkpoint dir to the flipped inference_config.json
    adjusted = MultiModalClassifier(str(adj_dir / os.path.basename(ckpt)))
    img = os.path.join(data_dir, "images", "im0.png")
    a = plain.predict("hate hate hate", img, return_probs=True)
    b = adjusted.predict("hate hate hate", img, return_probs=True)

    priors = np.clip(np.asarray(cfg["priors"], np.float32), 1e-6, 1 - 1e-6)
    la = np.log(priors / (1 - priors))
    logits_a = np.log(np.asarray(a["probabilities"]) / (1 - np.asarray(a["probabilities"])))
    expected = 1 / (1 + np.exp(-(logits_a - la)))
    np.testing.assert_allclose(np.asarray(b["probabilities"]), expected, atol=1e-4)
