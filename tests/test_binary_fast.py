"""Fast (non-slow) coverage for the binary Hateful-Memes-style task
(num_labels=1): single-column metrics, calibration, and the dataset binary
schema driven through the fusion head forward.

The reference's binary branch is src/data/dataset.py:57-83 (single 'label'
column -> ["harmful"], (N,1) float matrix) and src/training/metrics.py:46-48
(roc_auc_score on the single probability column). The e2e train->infer path
stays in tests/test_binary_task.py (@slow); these tests pin the unit
semantics on the fast suite.
"""

import numpy as np
import pytest
from PIL import Image
from sklearn.metrics import f1_score, roc_auc_score

from multimodal_content_moderation_tpu.data.dataset import CSVDataset
from multimodal_content_moderation_tpu.data.images import ImagePreprocessor
from multimodal_content_moderation_tpu.training.metrics import (
    calibrate_thresholds,
    compute_detailed_metrics,
    make_compute_metrics_multi,
)


def _binary_eval_pred(n=40, seed=0):
    g = np.random.default_rng(seed)
    logits = g.normal(size=(n, 1)).astype(np.float32)
    labels = (g.random(size=(n, 1)) < 0.4).astype(np.float32)
    labels[0, 0] = 1.0  # ensure both classes present
    labels[1, 0] = 0.0
    return logits, labels


def test_metrics_multi_num_labels_1_matches_sklearn():
    """num_labels=1 takes the single-column roc branch (no average kwarg);
    f1_macro == f1_micro == binary F1 when there is one class."""
    logits, labels = _binary_eval_pred()
    probs = 1.0 / (1.0 + np.exp(-logits))
    m = make_compute_metrics_multi(num_labels=1)((logits, labels))
    assert m["roc_macro"] == pytest.approx(
        float(roc_auc_score(labels, probs)), abs=1e-12
    )
    want_f1 = float(
        f1_score(labels, (probs >= 0.5).astype(int), average="macro", zero_division=0)
    )
    assert m["f1_macro"] == pytest.approx(want_f1, abs=1e-12)
    assert m["f1_micro"] == pytest.approx(
        float(
            f1_score(
                labels, (probs >= 0.5).astype(int), average="micro", zero_division=0
            )
        ),
        abs=1e-12,
    )


def test_metrics_multi_num_labels_1_degenerate_single_class():
    """All-one-class labels: sklearn raises (or NaNs) on ROC; the reference's
    except-path yields 0.0 and f1 stays defined."""
    logits = np.linspace(-1, 1, 8).reshape(-1, 1).astype(np.float32)
    labels = np.ones((8, 1), np.float32)
    m = make_compute_metrics_multi(num_labels=1)((logits, labels))
    assert m["roc_macro"] == 0.0
    assert 0.0 <= m["f1_macro"] <= 1.0


def test_calibrate_thresholds_single_column():
    """Grid search on a (N,1) probs matrix returns one threshold equal to the
    brute-force F1 argmax over the same linspace(0.05,0.95,19) grid; a column
    with zero positives falls back to 0.5."""
    g = np.random.default_rng(3)
    probs = g.random(size=(60, 1))
    y = (probs + g.normal(scale=0.35, size=probs.shape) > 0.55).astype(np.float32)
    y[:2, 0] = [1.0, 0.0]
    (t,) = calibrate_thresholds(probs, y)
    grid = np.linspace(0.05, 0.95, 19)
    f1s = [
        f1_score(y[:, 0], (probs[:, 0] >= g_).astype(int), zero_division=0)
        for g_ in grid
    ]
    assert t == pytest.approx(float(grid[int(np.argmax(f1s))]))
    assert calibrate_thresholds(probs, np.zeros_like(y)) == [0.5]


def test_detailed_metrics_single_column_binary():
    """compute_detailed_metrics on a binary task: one per_class entry under
    the given name with support / roc_auc matching direct sklearn calls."""
    logits, labels = _binary_eval_pred(seed=5)
    probs = 1.0 / (1.0 + np.exp(-logits))
    rep = compute_detailed_metrics(probs, labels, class_names=["harmful"])
    assert list(rep["per_class"].keys()) == ["harmful"]
    pc = rep["per_class"]["harmful"]
    assert pc["support"] == int(labels.sum())
    assert pc["roc_auc"] == pytest.approx(
        float(roc_auc_score(labels[:, 0], probs[:, 0])), abs=1e-12
    )
    assert rep["roc_auc_macro"] == pytest.approx(pc["roc_auc"], abs=1e-12)


class _StubTokenizer:
    """Minimal encode_batch contract: deterministic ids + full masks."""

    def encode_batch(self, texts, max_len):
        ids = np.zeros((len(texts), max_len), np.int32)
        for r, t in enumerate(texts):
            for c, ch in enumerate(t.encode()[: max_len - 1]):
                ids[r, c] = 1 + (ch % 900)
            ids[r, min(len(t.encode()), max_len - 1)] = 999  # EOS
        return ids, (ids != 0).astype(np.int32)


@pytest.fixture()
def binary_csv(tmp_path):
    import pandas as pd

    g = np.random.default_rng(0)
    (tmp_path / "images").mkdir()
    rows = []
    for i in range(8):
        path = ""
        if i % 4:  # row 0 and 4 keep the missing-image degradation path hot
            path = f"images/b{i}.png"
            Image.fromarray(
                g.integers(0, 256, size=(36, 36, 3), dtype=np.uint8)
            ).save(tmp_path / path)
        rows.append(
            {"text": f"meme text {i}", "image_path": path, "label": int(i % 2)}
        )
    csv = tmp_path / "bin.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    return str(csv), str(tmp_path)


def test_binary_schema_through_fusion_forward(binary_csv):
    """Single 'label' column -> class_names ['harmful'], (N,1) labels, and a
    num_labels=1 FusionModel forward yields (B,1) finite logits + a scalar
    BCE loss (reference dataset.py:66-77 binary branch into fusion.py head)."""
    import jax
    import jax.numpy as jnp

    from multimodal_content_moderation_tpu.models import CLIPConfig, FusionModel

    csv, root = binary_csv
    ds = CSVDataset(
        csv, root, _StubTokenizer(), ImagePreprocessor(32, 32), max_text_length=16
    )
    assert ds.class_names == ["harmful"]
    assert ds.num_labels == 1
    assert ds.labels.shape == (8, 1)
    np.testing.assert_array_equal(ds.labels[:, 0], [0, 1, 0, 1, 0, 1, 0, 1])

    import transformers

    cfg = CLIPConfig.from_hf(
        transformers.CLIPConfig(
            text_config=dict(
                hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
                intermediate_size=128, max_position_embeddings=77,
                vocab_size=1000, eos_token_id=999, bos_token_id=998,
                pad_token_id=0,
            ),
            vision_config=dict(
                hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
                intermediate_size=128, image_size=32, patch_size=16,
            ),
            projection_dim=32,
        )
    )
    model = FusionModel.create("clip", num_labels=1, fusion_dim=16, clip_config=cfg)
    params = model.init(jax.random.key(0))

    (batch,) = ds.batches(8)
    jb = {k: jnp.asarray(v) for k, v in batch.items() if not k.startswith("_")}
    out = model.apply(params, jb)
    assert out["logits"].shape == (8, 1)
    assert bool(jnp.all(jnp.isfinite(out["logits"])))
    assert np.isfinite(float(out["loss"]))
    # presence degradation flows through: rows 0 and 4 have no image
    assert batch["image_present"][0] == 0.0 and batch["image_present"][4] == 0.0
