"""CSV-driven multimodal dataset with fixed-shape batch production.

Schema contract (same as reference src/data/dataset.py:16-90):
- binary:      columns [text, image_path, label]  (0/1)
- multi-label: columns [text, image_path, labels] (comma-separated subset of
  ``class_names``)

TPU-first design differences from the reference's per-item torch Dataset:
- All texts are tokenized ONCE up front into a dense [N, T] int32 array
  (static shapes; tokenization never appears in the steady-state loop).
- Batches are produced as dict-of-numpy with a ThreadPool doing JPEG decode
  + resize in parallel, and the final partial batch can be zero-padded to
  the fixed batch size (``_valid`` carries the true count) so XLA never
  recompiles.
- Missing/corrupt images degrade to zeros + ``image_present=0`` and empty
  text to ``text_present=0`` (reference dataset.py:126-141, 169).
"""

from __future__ import annotations

import concurrent.futures as cf
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np
import pandas as pd

from multimodal_content_moderation_tpu.data.images import ImagePreprocessor
from multimodal_content_moderation_tpu.utils.config import parse_label_list


class CSVDataset:
    def __init__(
        self,
        csv_path: str,
        image_root: str,
        tokenizer,
        preprocessor: ImagePreprocessor,
        max_text_length: int = 77,
        class_names: Optional[List[str]] = None,
        is_train: bool = False,
        cache_dir: Optional[str] = None,
    ):
        self.df = pd.read_csv(csv_path)
        self.image_root = image_root
        self.preproc = preprocessor
        self.max_len = max_text_length
        self.is_train = is_train

        has_binary = "label" in self.df.columns
        has_multilabel = "labels" in self.df.columns
        if not has_binary and not has_multilabel:
            raise ValueError(
                "CSV must have column 'label' (0/1) or 'labels' (comma-separated)."
            )

        if has_multilabel:
            if not class_names:
                raise ValueError("Provide class_names for multi-label classification.")
            self.class_names = [c.strip() for c in class_names]
            class2id = {c: i for i, c in enumerate(self.class_names)}
            Y = np.zeros((len(self.df), len(self.class_names)), np.float32)
            for r, v in enumerate(self.df["labels"].fillna("")):
                for name in parse_label_list(v):
                    j = class2id.get(name)
                    if j is not None:
                        Y[r, j] = 1.0
            self.labels = Y
        else:
            self.class_names = ["harmful"]
            self.labels = (
                self.df["label"].astype(int).to_numpy().reshape(-1, 1).astype(np.float32)
            )

        self.texts: List[str] = self.df["text"].fillna("").astype(str).tolist()
        self.paths: List[str] = self.df["image_path"].fillna("").astype(str).tolist()
        self.text_present = np.asarray(
            [1.0 if t.strip() else 0.0 for t in self.texts], np.float32
        )

        # One-shot tokenization into dense host arrays.
        self.input_ids, self.attention_mask = tokenizer.encode_batch(
            self.texts, max_text_length
        )

        # Decode-once pixel cache (data/cache.py): lazily filled on the first
        # pass, then every later epoch / eval rerun reads a memmap instead of
        # re-decoding JPEGs. Augmenting preprocessors are never cached.
        self.cache = None
        if cache_dir and not preprocessor.augment:
            from multimodal_content_moderation_tpu.data.cache import PixelCache

            self.cache = PixelCache(
                cache_dir, self.paths, image_root, preprocessor
            )

    def truncate_text(self, width: int) -> None:
        """Shrink the static text width to ``width`` tokens (in place).

        Used by ``training.text_fit``: when every row's EOS sits before
        ``width``, a causal text tower with EOS pooling (CLIP) produces
        bit-identical features and gradients at the smaller static shape —
        the dropped columns are dead compute the reference always pays by
        padding to 77 (src/data/dataset.py tokenizer call). Refuses to drop
        real tokens."""
        if width >= self.input_ids.shape[1]:
            return
        if int(self.attention_mask[:, width:].sum()) != 0:
            raise ValueError(
                f"truncate_text({width}) would drop real tokens (longest row "
                f"is {int(self.attention_mask.sum(axis=1).max())} tokens)"
            )
        self.input_ids = np.ascontiguousarray(self.input_ids[:, :width])
        self.attention_mask = np.ascontiguousarray(self.attention_mask[:, :width])
        self.max_len = width

    def __len__(self) -> int:
        return len(self.texts)

    @property
    def num_labels(self) -> int:
        return self.labels.shape[1]

    def load_image(self, i: int):
        if self.cache is not None:
            hit = self.cache.get(i)
            if hit is not None:
                return hit
        arr, present = self.preproc.load_relative(self.paths[i], self.image_root)
        if self.cache is not None:
            self.cache.put(i, arr, present)
        return arr, present

    def get_example(self, i: int) -> Dict[str, np.ndarray]:
        pixel, present = self.load_image(i)
        return {
            "input_ids": self.input_ids[i],
            "attention_mask": self.attention_mask[i],
            "pixel_values": pixel,
            "labels": self.labels[i],
            "text_present": np.float32(self.text_present[i]),
            "image_present": np.float32(present),
        }

    def batches(
        self,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = False,
        pad_to_batch: bool = False,
        num_workers: int = 8,
        indices: Optional[Sequence[int]] = None,
        include_labels: bool = True,
    ) -> Iterator[Dict[str, np.ndarray]]:
        """Yield fixed-shape dict-of-numpy batches with threaded image decode.

        ``indices`` overrides the natural order (used by the weighted
        sampler). With ``pad_to_batch`` the last batch is zero-padded to
        ``batch_size`` and carries ``_valid`` (int32 scalar count) so jitted
        eval never sees a new shape.
        """
        if indices is None:
            order = np.arange(len(self))
            if shuffle:
                np.random.default_rng(seed).shuffle(order)
        else:
            order = np.asarray(indices)

        n = len(order)
        pool = cf.ThreadPoolExecutor(max_workers=num_workers)
        try:
            starts = range(0, n - batch_size + 1, batch_size) if drop_last else range(0, n, batch_size)
            for s in starts:
                idx = order[s : s + batch_size]
                valid = len(idx)
                results = list(pool.map(self.load_image, idx))
                pixels = np.stack([r[0] for r in results])
                present = np.asarray([r[1] for r in results], np.float32)
                batch = {
                    "input_ids": self.input_ids[idx],
                    "attention_mask": self.attention_mask[idx],
                    "pixel_values": pixels,
                    "text_present": self.text_present[idx],
                    "image_present": present,
                }
                if include_labels:
                    batch["labels"] = self.labels[idx]
                if pad_to_batch and valid < batch_size:
                    pad = batch_size - valid
                    batch = {
                        k: np.concatenate(
                            [v, np.zeros((pad,) + v.shape[1:], v.dtype)], axis=0
                        )
                        for k, v in batch.items()
                    }
                if pad_to_batch:
                    batch["_valid"] = np.int32(valid)
                yield batch
        finally:
            pool.shutdown(wait=False)


def collate(examples: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    """Stack a list of example dicts into a batch (reference collate_fn,
    src/data/dataset.py:181-193)."""
    return {k: np.stack([e[k] for e in examples], axis=0) for k in examples[0]}
