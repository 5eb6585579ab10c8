"""Data-layer tests: tokenizer parity, image-pipeline parity, dataset semantics."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from multimodal_content_moderation_tpu.data.dataset import CSVDataset, collate
from multimodal_content_moderation_tpu.data.images import (
    CLIP_MEAN,
    CLIP_STD,
    ImagePreprocessor,
)
from multimodal_content_moderation_tpu.data.tokenizer import (
    ClipBPETokenizer,
    bytes_to_unicode,
    load_tokenizer,
)

transformers = pytest.importorskip("transformers")


# ---------------------------------------------------------------------------
# Fixtures: a tiny but real byte-level BPE vocab
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_vocab_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tinyvocab")
    b2u = bytes_to_unicode()
    vocab = {}
    for ch in b2u.values():
        vocab[ch] = len(vocab)
    for ch in b2u.values():
        vocab[ch + "</w>"] = len(vocab)
    merges = [
        "h e", "he l", "hel l", "hell o</w>", "l o</w>",
        "w o", "wo r", "wor l", "worl d</w>",
        "t h", "th e</w>", "i n", "in g</w>",
        "1 2", "' s</w>",
    ]
    for m in merges:
        vocab["".join(m.split())] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    with open(d / "vocab.json", "w") as f:
        json.dump(vocab, f)
    with open(d / "merges.txt", "w") as f:
        f.write("#version: 0.2\n")
        for m in merges:
            f.write(m + "\n")
    return str(d)


TEXTS = [
    "hello world",
    "Hello   WORLD hello",
    "the world's thing",
    "punctuation, here! (and) [brackets]?",
    "numbers 123 and 12",
    "unicode café ü 世界",
    "",
    "   spaces   everywhere   ",
    "a" * 300,  # forces truncation
    "word\nnewline\ttab",
]


class TestClipBPE:
    def test_matches_hf_fast(self, tiny_vocab_dir):
        hf = transformers.CLIPTokenizerFast(
            vocab_file=os.path.join(tiny_vocab_dir, "vocab.json"),
            merges_file=os.path.join(tiny_vocab_dir, "merges.txt"),
        )
        ours = ClipBPETokenizer(
            os.path.join(tiny_vocab_dir, "vocab.json"),
            os.path.join(tiny_vocab_dir, "merges.txt"),
        )
        for text in TEXTS:
            ref = hf(text, padding="max_length", truncation=True, max_length=16)
            ids, mask = ours.encode(text, max_length=16)
            assert ids == ref["input_ids"], f"ids mismatch for {text!r}"
            assert mask == ref["attention_mask"], f"mask mismatch for {text!r}"

    def test_batch_shapes(self, tiny_vocab_dir):
        tok = load_tokenizer(tiny_vocab_dir)
        assert isinstance(tok, ClipBPETokenizer)
        ids, mask = tok.encode_batch(TEXTS, max_length=16)
        assert ids.shape == (len(TEXTS), 16) and ids.dtype == np.int32
        assert mask.shape == (len(TEXTS), 16)
        # every row ends with eos before padding & starts with bos
        assert (ids[:, 0] == tok.bos_token_id).all()

    def test_decode_roundtrip(self, tiny_vocab_dir):
        tok = ClipBPETokenizer(
            os.path.join(tiny_vocab_dir, "vocab.json"),
            os.path.join(tiny_vocab_dir, "merges.txt"),
        )
        ids, _ = tok.encode("hello world", max_length=16)
        assert tok.decode(ids) == "hello world"

    def test_missing_assets_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError, match="offline"):
            load_tokenizer(str(tmp_path))


# ---------------------------------------------------------------------------
# Image pipeline
# ---------------------------------------------------------------------------


@pytest.fixture()
def random_image(tmp_path):
    g = np.random.default_rng(0)
    arr = g.integers(0, 256, size=(300, 470, 3), dtype=np.uint8)
    path = tmp_path / "img.png"
    Image.fromarray(arr).save(path)
    return str(path)


class TestImagePipeline:
    def test_eval_matches_hf_clip_processor(self, random_image):
        """Oracle: HF CLIPImageProcessor with BILINEAR resample implements the
        same shortest-edge-resize + center-crop + normalize recipe as the
        reference's torchvision eval transform."""
        proc = transformers.CLIPImageProcessor(
            do_resize=True,
            size={"shortest_edge": 224},
            resample=2,  # PIL BILINEAR
            do_center_crop=True,
            crop_size={"height": 224, "width": 224},
            do_rescale=True,
            do_normalize=True,
            image_mean=list(CLIP_MEAN),
            image_std=list(CLIP_STD),
            do_convert_rgb=True,
        )
        im = Image.open(random_image)
        ref = proc(images=im, return_tensors="np")["pixel_values"][0]

        pp = ImagePreprocessor(224, 224, CLIP_MEAN, CLIP_STD)
        got, present = pp.load(random_image)
        assert present == 1.0
        assert got.shape == (3, 224, 224)
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_missing_image_zero(self):
        pp = ImagePreprocessor(32, 32)
        arr, present = pp.load("/nonexistent/path.jpg")
        assert present == 0.0
        assert arr.shape == (3, 32, 32) and not arr.any()

    def test_corrupt_image_zero(self, tmp_path):
        bad = tmp_path / "bad.jpg"
        bad.write_bytes(b"not an image at all")
        pp = ImagePreprocessor(32, 32)
        arr, present = pp.load(str(bad))
        assert present == 0.0 and not arr.any()

    def test_uint8_output_mode(self, random_image):
        pp = ImagePreprocessor(64, 64, output="uint8_hwc")
        arr, present = pp.load(random_image)
        assert arr.shape == (64, 64, 3) and arr.dtype == np.uint8 and present == 1.0

    def test_train_augment_shapes_and_determinism(self, random_image):
        pp1 = ImagePreprocessor(64, 64, is_train=True, augment=True, seed=7)
        pp2 = ImagePreprocessor(64, 64, is_train=True, augment=True, seed=7)
        a1, _ = pp1.load(random_image)
        a2, _ = pp2.load(random_image)
        assert a1.shape == (3, 64, 64)
        np.testing.assert_array_equal(a1, a2)
        pp3 = ImagePreprocessor(64, 64, is_train=True, augment=True, seed=8)
        a3, _ = pp3.load(random_image)
        assert not np.array_equal(a1, a3)

    def test_small_image_padded_by_center_crop(self, tmp_path):
        arr = np.full((20, 30, 3), 200, np.uint8)
        p = tmp_path / "small.png"
        Image.fromarray(arr).save(p)
        pp = ImagePreprocessor(64, 64, output="uint8_hwc")
        # shortest edge 20 -> resized to 64 (longest becomes 96) -> crop ok
        out, present = pp.load(str(p))
        assert out.shape == (64, 64, 3) and present == 1.0


# ---------------------------------------------------------------------------
# Dataset
# ---------------------------------------------------------------------------


@pytest.fixture()
def synthetic_csv(tmp_path, tiny_vocab_dir):
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    g = np.random.default_rng(1)
    rows = []
    for i in range(10):
        if i % 3 == 0:
            path = ""  # missing image
        else:
            p = img_dir / f"im{i}.png"
            Image.fromarray(
                g.integers(0, 256, size=(40, 50, 3), dtype=np.uint8)
            ).save(p)
            path = f"images/im{i}.png"
        labels = ["racist", "sexist", "homophobe", "religion", "otherhate"]
        lab = ",".join(labels[j] for j in range(5) if (i + j) % 4 == 0)
        text = f"hello world {i}" if i % 5 else ""
        rows.append({"text": text, "image_path": path, "labels": lab})
    import pandas as pd

    csv = tmp_path / "data.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    return str(csv), str(tmp_path)


def test_dataset_multilabel(synthetic_csv, tiny_vocab_dir):
    csv, root = synthetic_csv
    tok = load_tokenizer(tiny_vocab_dir)
    pp = ImagePreprocessor(32, 32)
    ds = CSVDataset(
        csv, root, tok, pp, max_text_length=16,
        class_names=["racist", "sexist", "homophobe", "religion", "otherhate"],
    )
    assert len(ds) == 10 and ds.num_labels == 5
    ex = ds.get_example(0)
    assert ex["pixel_values"].shape == (3, 32, 32)
    assert ex["image_present"] == 0.0  # row 0 has no image
    assert ex["labels"][0] == 1.0  # (0+0)%4==0 -> racist
    ex5 = ds.get_example(5)
    assert ex5["text_present"] == 0.0  # row 5 empty text

    batches = list(ds.batches(4, pad_to_batch=True))
    assert len(batches) == 3
    for b in batches:
        assert b["input_ids"].shape == (4, 16)
        assert b["pixel_values"].shape == (4, 3, 32, 32)
    assert batches[-1]["_valid"] == 2

    stacked = collate([ds.get_example(i) for i in range(3)])
    assert stacked["labels"].shape == (3, 5)


class TestPixelCache:
    """Decode-once cache (data/cache.py): fills on first pass, serves
    identical arrays afterwards without touching the image files."""

    CLASSES = ["racist", "sexist", "homophobe", "religion", "otherhate"]

    def _ds(self, csv, root, tok, cache_dir, output="float_nchw"):
        return CSVDataset(
            csv, root, tok, ImagePreprocessor(32, 32, output=output),
            max_text_length=16, class_names=self.CLASSES,
            cache_dir=cache_dir,
        )

    def test_fill_then_serve_without_files(self, synthetic_csv, tiny_vocab_dir, tmp_path):
        import shutil

        csv, root = synthetic_csv
        tok = load_tokenizer(tiny_vocab_dir)
        cache = str(tmp_path / "cache")
        ds = self._ds(csv, root, tok, cache)
        cold = [ds.load_image(i) for i in range(len(ds))]
        assert ds.cache.hit_count == len(ds)

        # same signature -> same cache; delete the images, answers unchanged
        ds2 = self._ds(csv, root, tok, cache)
        assert ds2.cache.hit_count == len(ds2)
        shutil.rmtree(os.path.join(root, "images"))
        for i, (arr, present) in enumerate(cold):
            arr2, present2 = ds2.load_image(i)
            np.testing.assert_array_equal(arr, arr2)
            assert present == present2
        # missing-image rows cached too (zeros + present 0)
        assert ds2.load_image(0)[1] == 0.0

    def test_preproc_change_invalidates(self, synthetic_csv, tiny_vocab_dir, tmp_path):
        csv, root = synthetic_csv
        tok = load_tokenizer(tiny_vocab_dir)
        cache = str(tmp_path / "cache")
        ds = self._ds(csv, root, tok, cache)
        for i in range(len(ds)):
            ds.load_image(i)
        # different output layout -> fresh (cold) cache subdir, u8 shapes
        ds_u8 = self._ds(csv, root, tok, cache, output="uint8_hwc")
        assert ds_u8.cache.hit_count == 0
        arr, _ = ds_u8.load_image(1)
        assert arr.dtype == np.uint8 and arr.shape == (32, 32, 3)
        assert ds_u8.cache.dir != ds.cache.dir

    def test_image_file_change_invalidates(self, synthetic_csv, tiny_vocab_dir, tmp_path):
        csv, root = synthetic_csv
        tok = load_tokenizer(tiny_vocab_dir)
        cache = str(tmp_path / "cache")
        ds = self._ds(csv, root, tok, cache)
        for i in range(len(ds)):
            ds.load_image(i)
        old_dir = ds.cache.dir
        # rewrite one image (different content AND mtime) -> fresh cache
        p = os.path.join(root, "images", "im1.png")
        os.utime(p, (0, 0))
        ds2 = self._ds(csv, root, tok, cache)
        assert ds2.cache.dir != old_dir
        assert ds2.cache.hit_count == 0

    def test_augmenting_preprocessor_bypasses_cache(
        self, synthetic_csv, tiny_vocab_dir, tmp_path
    ):
        csv, root = synthetic_csv
        tok = load_tokenizer(tiny_vocab_dir)
        pp = ImagePreprocessor(32, 32, is_train=True, augment=True)
        ds = CSVDataset(
            csv, root, tok, pp, 16, class_names=self.CLASSES,
            cache_dir=str(tmp_path / "cache"),
        )
        assert ds.cache is None  # random outputs are never cached

    def test_batches_read_from_cache(self, synthetic_csv, tiny_vocab_dir, tmp_path):
        csv, root = synthetic_csv
        tok = load_tokenizer(tiny_vocab_dir)
        cache = str(tmp_path / "cache")
        ds = self._ds(csv, root, tok, cache)
        warm = list(ds.batches(4, pad_to_batch=True))
        again = list(self._ds(csv, root, tok, cache).batches(4, pad_to_batch=True))
        for a, b in zip(warm, again):
            for k in a:
                np.testing.assert_array_equal(a[k], b[k])


def test_dataset_binary(tmp_path, tiny_vocab_dir):
    import pandas as pd

    csv = tmp_path / "bin.csv"
    pd.DataFrame(
        {"text": ["a", "b"], "image_path": ["", ""], "label": [0, 1]}
    ).to_csv(csv, index=False)
    tok = load_tokenizer(tiny_vocab_dir)
    ds = CSVDataset(str(csv), "", tok, ImagePreprocessor(32, 32), 16)
    assert ds.class_names == ["harmful"]
    np.testing.assert_array_equal(ds.labels, [[0.0], [1.0]])


def test_dataset_requires_label_column(tmp_path, tiny_vocab_dir):
    import pandas as pd

    csv = tmp_path / "nolabel.csv"
    pd.DataFrame({"text": ["a"], "image_path": [""]}).to_csv(csv, index=False)
    tok = load_tokenizer(tiny_vocab_dir)
    with pytest.raises(ValueError, match="label"):
        CSVDataset(str(csv), "", tok, ImagePreprocessor(32, 32), 16)
