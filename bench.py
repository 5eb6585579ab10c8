#!/usr/bin/env python
"""Headline benchmark: MMHS150K-shaped streaming evaluation throughput on one
TPU chip with the flagship CLIP ViT-B/32 fusion classifier.

Counterpart of the reference's published metric (``test_samples_per_second``
in runs/*/test_metrics.json — 381.5 samples/s for clip_fusion on its single
GPU). Runs the production serving path (models/fast_infer.py): uint8
wire-format patch rows -> Pallas fused normalize+patchify+embed kernel ->
bf16 encoders + fusion head (fp32 accumulation), async dispatch with bounded
in-flight batches, over 10,000 MMHS150K-shaped samples (77 BPE tokens,
224x224 RGB).

Environment notes: the chip is reached through a network tunnel (~230 MB/s,
measured) that exhibits sporadic multi-second stalls unrelated to device
execution; batches are therefore staged in HBM before timing. Every number
is the MEDIAN of its passes with min/max dispersion reported alongside
(steady-state passes agree within ~2%; a tunnel stall shows up as a one-off
outlier in the min). Host-side input-pipeline throughput is benchmarked
separately (tools/bench_input.py).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus
dispersion fields ("passes_samples_per_s", "*_min"/"*_max").
"""

from __future__ import annotations

import dataclasses
import json
import os
import time

import numpy as np

BASELINE_SAMPLES_PER_SEC = 381.5  # reference clip_fusion test throughput
N_SAMPLES = 10_080  # 70 batches of 144 (sweet-spot batch for the pallas
# attention path, measured sweep: 144 -> 9170 samples/s (bb16/4-head-pack
# fwd grid) vs
# 128 -> 8762, 160 -> 7922-8418, 192 -> 8073)
BATCH = int(os.environ.get("BENCH_BATCH", "144"))  # sweep knob
SEQ = 77
N_STAGED = 4  # distinct staged batches rotated through the run
PASSES = 5  # median-of-5 (each pass ~1.1 s device time; stalls -> outliers)

# end-to-end slice: CSV -> JPEG decode -> resize/crop -> u8 wire -> device,
# the reference's measurement boundary (its 400.9/s includes the DataLoader,
# scripts/evaluate.py:163-183). Kept smaller than the device-path run because
# this host has ONE CPU core for decode (real TPU hosts have dozens).
E2E_IMAGES = 192  # distinct JPEGs on disk
E2E_ROWS = 1536


def bench_e2e(engine) -> dict:
    """Full-pipeline throughput on MMHS-shaped data: every row is read from
    a CSV, its JPEG decoded + shortest-edge-resized + center-cropped on the
    host, shipped as u8 patch rows, and classified on the chip."""
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="bench_e2e_")
    try:
        return _bench_e2e_in(engine, tmp)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _bench_e2e_in(engine, tmp: str) -> dict:
    from PIL import Image

    from multimodal_content_moderation_tpu.data.dataset import CSVDataset
    from multimodal_content_moderation_tpu.data.images import (
        CLIP_MEAN,
        CLIP_STD,
        ImagePreprocessor,
    )
    from multimodal_content_moderation_tpu.data.tokenizer import (
        bytes_to_unicode,
        load_tokenizer,
    )
    from multimodal_content_moderation_tpu.models.fast_infer import (
        evaluate_logits_u8,
    )

    # byte-level BPE assets (real tokenizer machinery; merges don't change
    # the per-row cost profile for tweet-length text)
    b2u = bytes_to_unicode()
    vocab = {}
    for ch in b2u.values():
        vocab[ch] = len(vocab)
    for ch in b2u.values():
        vocab[ch + "</w>"] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    with open(os.path.join(tmp, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(tmp, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
    tokenizer = load_tokenizer(tmp)

    # MMHS-shaped JPEGs: smooth structure + noise (natural-image-ish entropy)
    g = np.random.default_rng(0)
    img_dir = os.path.join(tmp, "img")
    os.mkdir(img_dir)
    yy, xx = np.mgrid[0:400, 0:500].astype(np.float32)
    for i in range(E2E_IMAGES):
        base = (
            127
            + 80 * np.sin(xx / (20 + i % 13))[..., None]
            + 40 * np.cos(yy / (15 + i % 7))[..., None]
        )
        arr = np.clip(
            base + g.normal(0, 18, size=(400, 500, 3)), 0, 255
        ).astype(np.uint8)
        Image.fromarray(arr).save(
            os.path.join(img_dir, f"{i}.jpg"), quality=85
        )

    rows = ["text,image_path,labels"]
    for r in range(E2E_ROWS):
        rows.append(
            f"offensive tweet number {r} with several words,"
            f"{r % E2E_IMAGES}.jpg,racist"
        )
    csv_path = os.path.join(tmp, "test.csv")
    with open(csv_path, "w") as f:
        f.write("\n".join(rows) + "\n")

    def make_ds(cache: bool):
        return CSVDataset(
            csv_path,
            img_dir,
            tokenizer,
            # fused native decode (C++ libjpeg, DCT-scaled) — the fastest
            # supported production path (--image_backend native_scaled on the
            # CLIs); transparently falls back to PIL if the toolchain absent
            ImagePreprocessor(
                224, 224, CLIP_MEAN, CLIP_STD,
                output="uint8_hwc", backend="native_scaled",
            ),
            SEQ,
            class_names=[
                "racist", "sexist", "homophobe", "religion", "otherhate"
            ],
            cache_dir=os.path.join(tmp, "cache") if cache else None,
        )

    def timed_pass(ds) -> float:
        t0 = time.perf_counter()
        logits, _ = evaluate_logits_u8(engine, ds, BATCH)
        _ = float(logits[-1, 0])  # value fetch = true barrier
        return E2E_ROWS / (time.perf_counter() - t0)

    # cold passes (every row: CSV read + JPEG decode + resize + u8 wire +
    # device), median of 3 with min/max (single passes are exposed to tunnel
    # stalls). The final pass fills the decode-once cache for the warm
    # measurement.
    cold = [timed_pass(make_ds(False)) for _ in range(2)]
    ds = make_ds(True)
    cold.append(timed_pass(ds))

    # warm passes: the decode-once pixel cache (data/cache.py) is filled, so
    # this measures the repeat-evaluation path (multi-epoch fine-tune /
    # threshold calibration / rerun) — decode drops out entirely
    warm = [timed_pass(ds) for _ in range(3)]
    med = lambda xs: float(np.median(xs))
    return {
        "e2e_samples_per_s": round(med(cold), 1),
        "e2e_samples_per_s_min": round(min(cold), 1),
        "e2e_samples_per_s_max": round(max(cold), 1),
        "e2e_cached_samples_per_s": round(med(warm), 1),
        "e2e_cached_samples_per_s_min": round(min(warm), 1),
        "e2e_cached_samples_per_s_max": round(max(warm), 1),
        "e2e_rows": E2E_ROWS,
        "e2e_host_cpus": os.cpu_count(),
        "e2e_vs_baseline": round(med(cold) / 400.9, 2),
        # On this bench host both passes cap at the tunnel's ~280 samples/s
        # u8-batch upload rate (fresh per-batch transfers, measured — see
        # docs/PERFORMANCE.md); the chip itself sustains the headline rate.
        # Real TPU hosts have ~100+ decode cores and PCIe.
        "e2e_note": "host-limited: 1 decode core + ~280/s tunnel transfer ceiling; cached pass = decode-once cache",
    }


def main() -> None:
    import jax

    from multimodal_content_moderation_tpu.data.images import CLIP_MEAN, CLIP_STD
    from multimodal_content_moderation_tpu.models import FusionModel
    from multimodal_content_moderation_tpu.models.convert import to_dtype
    from multimodal_content_moderation_tpu.models.fast_infer import (
        FastInferenceEngine,
    )

    import jax.numpy as jnp

    model = FusionModel.create("clip", num_labels=5)
    cfg = model.clip_config
    # pallas = the [B,T,D]-layout attention_nhd kernel (no head-transpose
    # copies in the HLO): 7866 vs 7524 samples/s same-session A/B at B=192
    attn = os.environ.get("BENCH_ATTENTION", "pallas")
    model = dataclasses.replace(
        model,
        clip_config=dataclasses.replace(
            cfg,
            text=dataclasses.replace(
                cfg.text, compute_dtype="bfloat16", scores_dtype="bfloat16",
                attention_impl=attn,
            ),
            vision=dataclasses.replace(
                cfg.vision, compute_dtype="bfloat16", scores_dtype="bfloat16",
                attention_impl=attn,
            ),
        ),
    )
    params = to_dtype(model.init(jax.random.key(0)), jnp.bfloat16)
    engine = FastInferenceEngine(model, params, CLIP_MEAN, CLIP_STD)

    vocab = model.clip_config.text.vocab_size
    eos = model.clip_config.text.eos_token_id
    img = model.image_size

    n_batches = -(-N_SAMPLES // BATCH)

    def make_ids(seed):
        gg = np.random.default_rng(seed)
        ids = gg.integers(1, vocab - 2, size=(BATCH, SEQ)).astype(np.int32)
        ids[:, 30] = eos
        return ids

    g = np.random.default_rng(0)
    mask = jax.device_put(np.ones((BATCH, SEQ), np.int32))
    ones = jax.device_put(np.ones((BATCH,), np.float32))
    patch_stage = [
        jax.device_put(
            engine.patches_from_hwc(
                g.integers(0, 256, size=(BATCH, img, img, 3), dtype=np.uint8)
            )
        )
        for _ in range(N_STAGED)
    ]
    # distinct ids per dispatch across the whole run: the remote platform
    # caches repeated identical dispatches, which would fake the timing
    id_stage = [
        jax.device_put(make_ids(1000 + k)) for k in range(PASSES * n_batches)
    ]
    # compile + warmup with dedicated args (seed 999 is outside the timed
    # id_stage range): an argument-identical warmup can be served from the
    # axon dispatch cache and inflate pass 1 (scalar fetch = true barrier)
    _ = float(engine(jax.device_put(make_ids(999)), mask, patch_stage[0], ones, ones)[0, 0])

    # NB: on the tunneled platform only a value fetch truly synchronizes
    # (block_until_ready returns early); device execution is in-order, so
    # fetching a scalar from the LAST output is the pass barrier.
    rates = []
    k = 0
    for _ in range(PASSES):
        t0 = time.perf_counter()
        out = None
        for i in range(n_batches):
            out = engine(id_stage[k], mask, patch_stage[i % N_STAGED], ones, ones)
            k += 1
        _ = float(out[0, 0])
        dt = time.perf_counter() - t0
        rates.append(N_SAMPLES / dt)

    value = float(np.median(rates))
    result = {
        "metric": "mmhs150k_eval_samples_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "samples/s",
        "vs_baseline": round(value / BASELINE_SAMPLES_PER_SEC, 2),
        "passes_samples_per_s": [round(r, 1) for r in rates],
        "value_min": round(min(rates), 1),
        "value_max": round(max(rates), 1),
    }

    # Length-bucketed device path (the evaluate CLI's production default,
    # --seq_buckets auto): tweet-length rows (EOS at 30) run the text tower
    # at the 32-token bucket instead of padded 77 — EXACT for CLIP (causal +
    # EOS pooling, see models/fast_infer.evaluate_logits_u8). The unbucketed
    # "value" above is kept as the primary metric for cross-round
    # comparability with BENCH_r01/r02.
    BUCKET = 32
    idb_stage = [
        jax.device_put(make_ids(5000 + k)[:, :BUCKET])
        for k in range(PASSES * n_batches)
    ]
    mask_b = jax.device_put(np.ones((BATCH, BUCKET), np.int32))
    # dedicated warmup args: axon can serve a repeated identical dispatch
    # from cache, so the warmup must not be argument-identical to any timed
    # dispatch (idb_stage seeds start at 5000; 4999 is reserved for warmup)
    idb_warm = jax.device_put(make_ids(4999)[:, :BUCKET])
    _ = float(engine(idb_warm, mask_b, patch_stage[0], ones, ones)[0, 0])
    rates_b = []
    k = 0
    for _ in range(PASSES):
        t0 = time.perf_counter()
        out = None
        for i in range(n_batches):
            out = engine(idb_stage[k], mask_b, patch_stage[i % N_STAGED], ones, ones)
            k += 1
        _ = float(out[0, 0])
        rates_b.append(N_SAMPLES / (time.perf_counter() - t0))
    result.update(
        value_bucketed=round(float(np.median(rates_b)), 1),
        value_bucketed_min=round(min(rates_b), 1),
        value_bucketed_max=round(max(rates_b), 1),
        bucketed_note="seq-32 text bucket (tweet-length rows), exact for CLIP",
    )
    if os.environ.get("BENCH_E2E", "1") != "0":
        # honest full-pipeline number (decode included, like the reference's)
        result.update(bench_e2e(engine))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
