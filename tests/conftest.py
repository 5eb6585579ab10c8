"""Test configuration: force a virtual 8-device CPU mesh.

Must run before the first ``import jax`` anywhere in the test process — the
standard JAX trick for exercising pjit/shard_map/collectives without TPU
hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

import jax  # noqa: E402

# The axon TPU plugin overrides JAX_PLATFORMS from the environment; the
# config update below is authoritative.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)

from PIL import Image  # noqa: E402

try:
    import torch  # noqa: E402
    import transformers  # noqa: E402
except ImportError:  # pragma: no cover
    torch = transformers = None

from multimodal_content_moderation_tpu.data.tokenizer import bytes_to_unicode  # noqa: E402


import json  # noqa: E402

# ---------------------------------------------------------------------------
# Shared end-to-end fixtures: a tiny complete encoder checkpoint, synthetic
# data, and a trained run (reused by CLI + serving tests; training is slow).
# ---------------------------------------------------------------------------


@pytest.fixture(scope="session")
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


@pytest.fixture(scope="session")
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


@pytest.fixture(scope="session")
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


@pytest.fixture(scope="session")
def trained_run(config_file, tmp_path_factory):
    from multimodal_content_moderation_tpu.cli import train as train_cli

    out = str(tmp_path_factory.mktemp("run") / "exp")
    result = train_cli.main(
        ["--config", config_file, "--saving.output_dir", out]
    )
    return out, result


