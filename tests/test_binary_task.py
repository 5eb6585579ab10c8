"""Binary (Hateful-Memes-style) task end-to-end: single 'label' column,
num_labels=1, through train CLI -> inference."""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def binary_data(tmp_path_factory, encoder_dir):
    import pandas as pd
    from PIL import Image

    d = tmp_path_factory.mktemp("bindata")
    img_dir = d / "images"
    img_dir.mkdir()
    g = np.random.default_rng(0)
    rows = []
    for i in range(32):
        img = f"b{i}.png"
        Image.fromarray(g.integers(0, 256, size=(36, 36, 3), dtype=np.uint8)).save(
            img_dir / img
        )
        rows.append(
            {
                "text": "hate hate" if i % 2 == 0 else "love love",
                "image_path": img,
                "label": int(i % 2 == 0),
            }
        )
    pd.DataFrame(rows).to_csv(d / "train.csv", index=False)
    pd.DataFrame(rows[:16]).to_csv(d / "val.csv", index=False)
    return str(d)


@pytest.mark.slow
def test_binary_train_and_infer(binary_data, encoder_dir, tmp_path):
    from multimodal_content_moderation_tpu.cli import train as train_cli
    from multimodal_content_moderation_tpu.cli.inference import MultiModalClassifier

    cfg = f"""
model:
  backend: clip
  head: fusion
  encoder_dir: {encoder_dir}
  fusion_dim: 16
  max_text_length: 16
data:
  train_csv: {binary_data}/train.csv
  val_csv: {binary_data}/val.csv
  image_root: {binary_data}/images
  class_names: []
training:
  per_device_train_batch_size: 8
  per_device_eval_batch_size: 8
  num_train_epochs: 1
  num_workers: 2
early_stopping:
  enabled: false
seed: 0
"""
    cfg_path = tmp_path / "bin.yaml"
    cfg_path.write_text(cfg)
    out = str(tmp_path / "binrun")
    result = train_cli.main(["--config", str(cfg_path), "--saving.output_dir", out])

    with open(os.path.join(out, "inference_config.json")) as f:
        icfg = json.load(f)
    assert icfg["class_names"] == ["harmful"]
    assert len(icfg["thresholds"]) == 1

    clf = MultiModalClassifier(result["result"]["best_checkpoint"], batch_size=4)
    r = clf.predict("hate hate", None)
    assert list(r["predictions"].keys()) == ["harmful"]
    assert isinstance(r["any_harmful"], bool)
