"""Robustness tests: tokenizer fuzzing vs the HF oracle, real reference
artifacts, profiling utilities."""

import json
import os
import random

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

from multimodal_content_moderation_tpu.data.tokenizer import (
    ClipBPETokenizer,
    bytes_to_unicode,
)


@pytest.fixture(scope="module")
def fuzz_vocab_dir(tmp_path_factory):
    """Byte-complete vocab with a random merge table — exercises arbitrary
    merge orders, not just hand-picked ones."""
    d = tmp_path_factory.mktemp("fuzzvocab")
    rng = random.Random(0)
    b2u = bytes_to_unicode()
    symbols = list(b2u.values())
    vocab = {}
    for ch in symbols:
        vocab[ch] = len(vocab)
    for ch in symbols:
        vocab[ch + "</w>"] = len(vocab)
    merges = []
    existing = list(symbols) + [s + "</w>" for s in symbols]
    for _ in range(200):
        a = rng.choice(existing)
        b = rng.choice(existing)
        if a.endswith("</w>") or (a, b) in merges:
            continue  # end-of-word symbol can't be a left operand
        merged = a + b
        if merged in vocab:
            continue
        merges.append((a, b))
        vocab[merged] = len(vocab)
        existing.append(merged)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    with open(d / "vocab.json", "w") as f:
        json.dump(vocab, f)
    with open(d / "merges.txt", "w") as f:
        f.write("#version: 0.2\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    return str(d)


def _random_texts(n=150, seed=1):
    rng = random.Random(seed)
    pools = [
        "abcdefghijklmnopqrstuvwxyz",
        "ABCDEFGHIJ",
        "0123456789",
        " .,!?':;()[]#@&-_/",
        "éüñçøß",
        "日本語中文한국어",
        "🙂🔥💀",
        "\t\n ",
    ]
    texts = []
    for _ in range(n):
        length = rng.randint(0, 60)
        t = "".join(rng.choice(rng.choice(pools)) for _ in range(length))
        texts.append(t)
    return texts


def test_tokenizer_fuzz_vs_hf(fuzz_vocab_dir):
    hf = transformers.CLIPTokenizerFast(
        vocab_file=os.path.join(fuzz_vocab_dir, "vocab.json"),
        merges_file=os.path.join(fuzz_vocab_dir, "merges.txt"),
    )
    ours = ClipBPETokenizer(
        os.path.join(fuzz_vocab_dir, "vocab.json"),
        os.path.join(fuzz_vocab_dir, "merges.txt"),
    )
    for text in _random_texts():
        ref = hf(text, padding="max_length", truncation=True, max_length=24)
        ids, mask = ours.encode(text, max_length=24)
        assert ids == ref["input_ids"], f"mismatch for {text!r}"
        assert mask == ref["attention_mask"], f"mask mismatch for {text!r}"


REFERENCE_RUN = "/root/reference/runs/clip_fusion_mmhshateful"


@pytest.mark.skipif(
    not os.path.isdir(REFERENCE_RUN), reason="reference artifacts not mounted"
)
def test_real_reference_artifacts_parse():
    """The actual shipped reference run artifacts drive our loaders."""
    from multimodal_content_moderation_tpu.models import model_io

    cfg, path = model_io.find_inference_config(
        os.path.join(REFERENCE_RUN, "checkpoint-anything")
    )
    assert cfg["class_names"] == [
        "racist", "sexist", "homophobe", "religion", "otherhate",
    ]
    assert len(cfg["thresholds"]) == 5
    model = model_io.build_model(
        cfg.get("head", "fusion"),
        cfg["backend"],
        cfg["class_names"],
        cfg["fusion_dim"],
    )
    # full-size flagship dims resolved from the config
    assert model.num_labels == 5
    assert model.clip_config.projection_dim == 512
    assert model.feature_dim == 512


class TestProfilingUtils:
    def test_step_timer(self):
        import time

        from multimodal_content_moderation_tpu.utils.profiling import StepTimer

        t = StepTimer(warmup=1)
        for _ in range(4):
            t.tick()
            time.sleep(0.01)
        assert 0.005 < t.mean_step_seconds < 0.1
        assert t.samples_per_second(10) > 0

    def test_assert_finite(self):
        import jax.numpy as jnp

        from multimodal_content_moderation_tpu.utils.profiling import assert_finite

        assert_finite({"a": jnp.ones(3), "b": [jnp.zeros(2)]})
        with pytest.raises(FloatingPointError, match="bad"):
            assert_finite({"bad": jnp.asarray([1.0, np.nan])}, name="t")

    def test_trace_writes_files(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from multimodal_content_moderation_tpu.utils.profiling import annotate, trace

        with trace(str(tmp_path)):
            with annotate("smoke"):
                jnp.ones(8).sum().block_until_ready()
        files = [
            os.path.join(r, f)
            for r, _, fs in os.walk(tmp_path)
            for f in fs
        ]
        assert files, "no trace output written"
