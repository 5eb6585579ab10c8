"""Token-for-token parity of the from-scratch tokenizer.json engine
(data/tokenizer_json.py) against the HF Rust `tokenizers` implementation.

Each fixture builds a tokenizer.json WITH the Rust library (the format's
reference implementation), then both engines encode the same corpus and the
ids + attention masks must match exactly. Covers the model families the
framework loads: Unigram+Metaspace (SigLIP/T5), BPE+byte_fallback (Gemma/
SigLIP2), WordLevel+Whitespace (test fixtures), WordPiece.

Reference context: the upstream repo delegates tokenization entirely to HF
(scripts/train.py:127-141); here it is owned, with the wheel only as a
fallback for exotic components.
"""

import json

import numpy as np
import pytest

tokenizers = pytest.importorskip("tokenizers")

from multimodal_content_moderation_tpu.data.tokenizer_json import (
    JSONTokenizer,
    UnsupportedTokenizerJSON,
)
from multimodal_content_moderation_tpu.data.tokenizer import load_tokenizer


CORPUS = [
    "hate speech online",
    "  leading and trailing  ",
    "punctuation, works! right?",
    "unicode café naïve 日本語",
    "",
    "a",
    "the thing THE THING",
    "word-with-dashes and under_scores",
    "exclamation!!! multiple   spaces",
    "racist sexist content warning",
]


def _rust(path):
    from tokenizers import Tokenizer

    return Tokenizer.from_file(path)


def _assert_parity(tmp_path, tk_rust, corpus=CORPUS, max_length=16):
    path = str(tmp_path / "tokenizer.json")
    tk_rust.save(path)
    mine = JSONTokenizer(path)
    ref = _rust(path)
    ref.enable_truncation(max_length)
    ref.enable_padding(length=max_length, pad_id=mine.pad_token_id)
    encs = ref.encode_batch(list(corpus))
    ref_ids = np.asarray([e.ids for e in encs], np.int32)
    ref_mask = np.asarray([e.attention_mask for e in encs], np.int32)
    ids, mask = mine.encode_batch(corpus, max_length=max_length)
    for r, text in enumerate(corpus):
        assert ids[r].tolist() == ref_ids[r].tolist(), (
            f"ids mismatch on {text!r}: {ids[r].tolist()} vs "
            f"{ref_ids[r].tolist()}"
        )
    np.testing.assert_array_equal(mask, ref_mask)
    return mine


class TestWordLevel:
    def test_whitespace_pretokenizer(self, tmp_path):
        from tokenizers import Tokenizer, models, pre_tokenizers

        words = ["<pad>", "<unk>", "hate", "speech", "the", "a", "thing",
                 ",", "!", "?", "online", "works", "right"]
        vocab = {w: i for i, w in enumerate(words)}
        tk = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
        tk.pre_tokenizer = pre_tokenizers.Whitespace()
        _assert_parity(tmp_path, tk)

    def test_lowercase_normalizer(self, tmp_path):
        from tokenizers import Tokenizer, models, normalizers, pre_tokenizers

        vocab = {"<unk>": 0, "the": 1, "thing": 2, "hate": 3}
        tk = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
        tk.normalizer = normalizers.Lowercase()
        tk.pre_tokenizer = pre_tokenizers.WhitespaceSplit()
        _assert_parity(tmp_path, tk)


class TestUnigram:
    def _unigram(self, byte_fallback=False):
        from tokenizers import Tokenizer, models, pre_tokenizers

        vocab = [
            ("<unk>", 0.0),
            ("▁", -2.0),
            ("▁hate", -4.0),
            ("▁speech", -5.0),
            ("▁the", -3.0),
            ("▁a", -2.5),
            ("▁th", -6.0),
            ("ing", -3.5),
            ("▁thing", -5.5),
            ("s", -2.8),
            ("h", -3.0),
            ("a", -2.9),
            ("t", -2.7),
            ("e", -2.6),
            ("▁on", -4.2),
            ("line", -4.4),
            ("!", -3.1),
            (",", -3.2),
        ] + ([(f"<0x{b:02X}>", -8.0) for b in range(256)] if byte_fallback else [])
        tk = Tokenizer(
            models.Unigram(vocab, unk_id=0, byte_fallback=byte_fallback)
        )
        tk.pre_tokenizer = pre_tokenizers.Metaspace()
        return tk

    def test_metaspace_viterbi(self, tmp_path):
        _assert_parity(tmp_path, self._unigram())

    def test_byte_fallback(self, tmp_path):
        _assert_parity(tmp_path, self._unigram(byte_fallback=True))

    def test_template_postprocessor(self, tmp_path):
        from tokenizers import processors

        tk = self._unigram()
        vocab_size = tk.get_vocab_size()
        # add bos/eos as added special tokens + template
        from tokenizers import AddedToken

        tk.add_special_tokens(
            [AddedToken("<bos>", special=True), AddedToken("<eos>", special=True)]
        )
        bos, eos = tk.token_to_id("<bos>"), tk.token_to_id("<eos>")
        assert bos == vocab_size and eos == vocab_size + 1
        tk.post_processor = processors.TemplateProcessing(
            single="<bos> $A <eos>",
            special_tokens=[("<bos>", bos), ("<eos>", eos)],
        )
        mine = _assert_parity(tmp_path, tk)
        # template reserves room: a long text still ends with eos
        ids, mask = mine.encode_batch(["hate speech " * 20], max_length=8)
        assert ids[0, 0] == bos and ids[0, 7] == eos and mask[0].sum() == 8

    def test_special_token_splitting(self, tmp_path):
        from tokenizers import AddedToken, processors

        tk = self._unigram()
        tk.add_special_tokens([AddedToken("<image>", special=True)])
        _assert_parity(
            tmp_path, tk,
            corpus=["<image> hate speech", "hate <image> speech", "<image>"],
        )


class TestBPE:
    def _gemma_style(self):
        """BPE over ▁-marked words with byte fallback — the Gemma/SigLIP2
        tokenizer.json shape (Replace normalizer, no pre-tokenizer)."""
        from tokenizers import Tokenizer, models, normalizers

        toks = ["<pad>", "<unk>", "▁", "h", "a", "t", "e", "s", "p", "c",
                "i", "n", "g", "▁h", "▁ha", "▁hat", "▁hate", "at", "ate",
                "sp", "spe", "ee", "ch", "speech", "▁speech", "in", "ing",
                "th", "▁th", "▁the", "▁thing"] + [f"<0x{b:02X}>" for b in range(256)]
        vocab = {t: i for i, t in enumerate(toks)}
        merges = [
            ("▁", "h"), ("▁h", "a"), ("▁ha", "t"), ("▁hat", "e"),
            ("a", "t"), ("at", "e"),
            ("s", "p"), ("sp", "e"), ("e", "e"), ("c", "h"),
            ("i", "n"), ("in", "g"),
            ("t", "h"), ("▁", "th"), ("▁th", "e"),
        ]
        tk = Tokenizer(
            models.BPE(
                vocab=vocab,
                merges=merges,
                unk_token="<unk>",
                byte_fallback=True,
                fuse_unk=True,
            )
        )
        tk.normalizer = normalizers.Replace(" ", "▁")
        return tk

    def test_gemma_style_bpe(self, tmp_path):
        _assert_parity(tmp_path, self._gemma_style())

    def test_plain_bpe_whitespace(self, tmp_path):
        from tokenizers import Tokenizer, models, pre_tokenizers

        toks = ["<unk>", "h", "a", "t", "e", "ha", "hat", "hate", "t", "he",
                "the", "i", "n", "g", "in", "ing", "th", "thing", "s"]
        vocab = {t: i for i, t in enumerate(dict.fromkeys(toks))}
        merges = [("h", "a"), ("ha", "t"), ("hat", "e"), ("t", "h"),
                  ("i", "n"), ("in", "g"), ("th", "ing")]
        tk = Tokenizer(
            models.BPE(vocab=vocab, merges=merges, unk_token="<unk>")
        )
        tk.pre_tokenizer = pre_tokenizers.WhitespaceSplit()
        _assert_parity(tmp_path, tk)


class TestWordPiece:
    def test_wordpiece(self, tmp_path):
        from tokenizers import Tokenizer, models, pre_tokenizers

        toks = ["[PAD]", "[UNK]", "hate", "speech", "th", "##ing", "##e",
                "the", "a", "on", "##line"]
        vocab = {t: i for i, t in enumerate(toks)}
        tk = Tokenizer(models.WordPiece(vocab, unk_token="[UNK]"))
        tk.pre_tokenizer = pre_tokenizers.WhitespaceSplit()
        _assert_parity(tmp_path, tk)


class TestLoaderIntegration:
    def test_load_tokenizer_prefers_native(self, tmp_path):
        """load_tokenizer returns the native engine for supported files."""
        from tokenizers import Tokenizer, models, pre_tokenizers

        vocab = {"<pad>": 0, "<unk>": 1, "hate": 2, "speech": 3}
        tk = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
        tk.pre_tokenizer = pre_tokenizers.Whitespace()
        tk.save(str(tmp_path / "tokenizer.json"))
        with open(tmp_path / "tokenizer_config.json", "w") as f:
            json.dump({"pad_token": "<pad>"}, f)
        loaded = load_tokenizer(str(tmp_path))
        assert isinstance(loaded, JSONTokenizer)
        assert loaded.pad_token_id == 0
        ids, mask = loaded.encode_batch(["hate speech"], max_length=4)
        assert ids[0].tolist()[:2] == [2, 3]

    def test_unsupported_component_raises(self, tmp_path):
        spec = {
            "model": {"type": "WordLevel", "vocab": {"<unk>": 0},
                      "unk_token": "<unk>"},
            "normalizer": {"type": "Precompiled", "precompiled_charsmap": ""},
            "pre_tokenizer": None,
        }
        p = tmp_path / "tokenizer.json"
        with open(p, "w") as f:
            json.dump(spec, f)
        with pytest.raises(UnsupportedTokenizerJSON):
            JSONTokenizer(str(p))

    def test_loader_falls_back_to_rust_on_unsupported(self, tmp_path):
        """An exotic tokenizer.json still loads (via the wheel)."""
        from tokenizers import Tokenizer, models, normalizers, pre_tokenizers

        vocab = {"<unk>": 0, "hate": 1}
        tk = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
        tk.normalizer = normalizers.BertNormalizer()  # not in the subset
        tk.pre_tokenizer = pre_tokenizers.WhitespaceSplit()
        tk.save(str(tmp_path / "tokenizer.json"))
        loaded = load_tokenizer(str(tmp_path))
        from multimodal_content_moderation_tpu.data.tokenizer import (
            RustTokenizer,
        )

        assert isinstance(loaded, RustTokenizer)
        ids, _ = loaded.encode_batch(["hate"], max_length=4)
        assert ids[0, 0] == 1
