"""Decoded-image cache: persistent memmap of preprocessed pixel arrays.

Host JPEG decode is the steady-state bottleneck of the end-to-end pipeline:
one CPU core decodes ~150-570 img/s (tools/bench_input.py) while the chip
classifies ~9,000 samples/s. The decode work is *identical* on every pass
over the same dataset — multi-epoch fine-tuning without augmentation,
threshold calibration, repeated evaluation runs — so ``PixelCache`` stores
each image's preprocessed output (uint8 HWC crop or normalized float32 CHW,
whatever the ``ImagePreprocessor`` emits) in a disk memmap, lazily filled on
first decode. Subsequent reads are a memcpy out of the OS page cache and the
pipeline becomes device-bound.

The reference has no equivalent (its DataLoader re-decodes every epoch,
reference src/data/dataset.py:116-141); this is a TPU-first addition in the
spirit of tf.data's ``.cache(filename)``.

Correctness properties:
- Keyed by a signature of the dataset identity (image paths + root + each
  file's (mtime, size)) and the preprocessor's geometry / normalization /
  output layout / decode backend — any change starts a fresh cache subdir.
- Augmenting preprocessors are never cached (outputs are random draws);
  ``CSVDataset`` simply skips cache construction for them.
- An entry's ``filled`` flag is written only after its pixels + presence
  flag, so a crash mid-fill can only lose entries, never corrupt them.
- Concurrent fillers (threads or processes) write identical bytes to
  disjoint-or-identical regions; last-writer-wins is benign.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import List, Optional, Tuple

import numpy as np

from multimodal_content_moderation_tpu.data.images import ImagePreprocessor


def _dataset_signature(
    paths: List[str], image_root: str, preproc: ImagePreprocessor
) -> str:
    """Stable hash of everything that determines the cached bytes."""
    files = []
    for rel in paths:
        if not rel:
            files.append((rel, 0, 0))
            continue
        p = rel if os.path.isabs(rel) or not image_root else os.path.join(image_root, rel)
        try:
            st = os.stat(p)
            files.append((rel, int(st.st_mtime_ns), st.st_size))
        except OSError:
            files.append((rel, -1, -1))
    key = {
        "files": files,
        "image_root": os.path.abspath(image_root) if image_root else "",
        "H": preproc.H,
        "W": preproc.W,
        "output": preproc.output,
        # native_scaled is near-exact (not bit-exact) vs pil/native, so the
        # effective backend is part of the key
        "backend": preproc.backend,
        "mean": preproc.mean.tolist(),
        "std": preproc.std.tolist(),
        "version": 1,
    }
    return hashlib.sha1(
        json.dumps(key, sort_keys=True).encode("utf-8")
    ).hexdigest()[:16]


class PixelCache:
    """Lazily-filled memmap cache of per-image preprocessor outputs.

    ``get(i)`` returns ``(array, present)`` or ``None`` on a cold entry;
    ``put(i, array, present)`` fills it. Arrays returned by ``get`` are
    copies (safe to mutate / ship to device)."""

    def __init__(
        self,
        cache_dir: str,
        paths: List[str],
        image_root: str,
        preproc: ImagePreprocessor,
    ):
        if preproc.augment:
            raise ValueError(
                "PixelCache cannot cache an augmenting preprocessor "
                "(outputs are random); construct the dataset without a cache."
            )
        n = len(paths)
        if preproc.output == "uint8_hwc":
            shape, dtype = (n, preproc.H, preproc.W, 3), np.uint8
        else:
            shape, dtype = (n, 3, preproc.H, preproc.W), np.float32
        sig = _dataset_signature(paths, image_root, preproc)
        self.dir = os.path.join(cache_dir, sig)
        os.makedirs(self.dir, exist_ok=True)
        meta_path = os.path.join(self.dir, "meta.json")
        meta = {"n": n, "shape": list(shape), "dtype": np.dtype(dtype).name}
        if not os.path.exists(meta_path):
            with open(meta_path, "w") as f:
                json.dump(meta, f)
        self.pixels = np.lib.format.open_memmap(
            os.path.join(self.dir, "pixels.npy"),
            mode="r+" if os.path.exists(os.path.join(self.dir, "pixels.npy")) else "w+",
            dtype=dtype,
            shape=shape,
        )
        self.present = np.lib.format.open_memmap(
            os.path.join(self.dir, "present.npy"),
            mode="r+" if os.path.exists(os.path.join(self.dir, "present.npy")) else "w+",
            dtype=np.float32,
            shape=(n,),
        )
        self.filled = np.lib.format.open_memmap(
            os.path.join(self.dir, "filled.npy"),
            mode="r+" if os.path.exists(os.path.join(self.dir, "filled.npy")) else "w+",
            dtype=np.uint8,
            shape=(n,),
        )

    def get(self, i: int) -> Optional[Tuple[np.ndarray, float]]:
        if not self.filled[i]:
            return None
        return np.array(self.pixels[i]), float(self.present[i])

    def put(self, i: int, arr: np.ndarray, present: float) -> None:
        self.pixels[i] = arr
        self.present[i] = present
        # The flag is written last so a *process* crash mid-fill loses the
        # entry rather than serving garbage (the OS still flushes both dirty
        # pages). The guarantee does NOT extend to power loss / kernel
        # panics: memmap writeback order is unspecified, so the filled page
        # could reach disk before the pixel page. Good enough for a decode
        # cache — a torn entry costs one stale crop, and wiping the cache
        # dir rebuilds it; callers needing power-loss durability should
        # msync the pixel range before the flag.
        self.filled[i] = 1

    @property
    def hit_count(self) -> int:
        return int(np.count_nonzero(self.filled))
