#!/usr/bin/env python
"""Host input-pipeline benchmark: JPEG decode + resize + crop throughput.

The chip sustains ~5.2k samples/s (bench.py); the host must decode and
resize at least that fast. This measures images/sec for the PIL and native
C++ backends across a thread pool, on synthetic JPEGs of typical
social-media size.
"""

from __future__ import annotations

import argparse
import concurrent.futures as cf
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image


def make_jpegs(n: int, h: int = 600, w: int = 800, quality: int = 80):
    g = np.random.default_rng(0)
    blobs = []
    for i in range(n):
        # smooth-ish content compresses like a real photo
        base = g.integers(0, 256, size=(h // 8, w // 8, 3), dtype=np.uint8)
        img = Image.fromarray(base).resize((w, h), Image.BILINEAR)
        buf = io.BytesIO()
        img.save(buf, format="JPEG", quality=quality)
        blobs.append(buf.getvalue())
    return blobs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--workers", type=int, default=16)
    args = ap.parse_args()

    from multimodal_content_moderation_tpu.data import native
    from multimodal_content_moderation_tpu.data.images import (
        center_crop,
        resize_shortest_edge,
    )

    blobs = make_jpegs(args.n)

    def work_pil(blob):
        im = Image.open(io.BytesIO(blob)).convert("RGB")
        im = resize_shortest_edge(im, args.size)
        return center_crop(np.asarray(im, np.uint8), args.size, args.size)

    def work_native(blob):
        im = Image.open(io.BytesIO(blob)).convert("RGB")
        return native.resize_center_crop(np.asarray(im, np.uint8), args.size)

    def work_native_jpeg(blob):
        # fully fused: libjpeg decode (full-res) + resize + crop, GIL-free
        return native.decode_jpeg_resize_crop(blob, args.size, scaled=False)

    def work_native_scaled(blob):
        # DCT-domain M/8 downscale during decode — the fastest path
        return native.decode_jpeg_resize_crop(blob, args.size, scaled=True)

    results = {}
    for name, fn in [("pil", work_pil)] + (
        [("native", work_native)] if native.available() else []
    ) + (
        [("native_jpeg", work_native_jpeg),
         ("native_scaled", work_native_scaled)]
        if native.jpeg_available() else []
    ):
        for w in (1, args.workers):
            with cf.ThreadPoolExecutor(max_workers=w) as pool:
                list(pool.map(fn, blobs[:32]))  # warmup
                t0 = time.perf_counter()
                list(pool.map(fn, blobs))
                dt = time.perf_counter() - t0
            results[f"{name}_w{w}"] = round(args.n / dt, 1)

    print(json.dumps({"metric": "host_decode_resize_images_per_sec", **results}))


if __name__ == "__main__":
    main()
