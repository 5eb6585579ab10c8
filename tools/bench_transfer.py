#!/usr/bin/env python
"""Host->device transfer microbenchmark: does the ~280 samples/s e2e upload
ceiling come from link bandwidth or per-transfer overhead?

The e2e loop ships one u8 patch-row batch per dispatch (~22 MB at B=144).
If per-`device_put` overhead (RTT, protocol framing, layout) dominates,
shipping K batches in ONE put and slicing on device would amortize it; if
the link is genuinely saturated, size won't matter. This tool measures
delivered MB/s for single puts of 1/2/4/8 batch-equivalents, plus the
per-batch dispatch pattern the e2e loop actually uses.

Run alone on the bench host. Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=144)
    ap.add_argument("--sample_bytes", type=int, default=49 * 3072,
                    help="u8 wire bytes/sample (CLIP patch32: 49 rows x 3072)")
    ap.add_argument("--multiples", default="1,2,4,8")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    per_batch = args.batch * args.sample_bytes

    @jax.jit
    def consume(x):  # touch every byte on device; scalar out = fetch barrier
        return jnp.sum(x.astype(jnp.uint32) & jnp.uint32(0xFF)) % 1000

    g = np.random.default_rng(0)
    result = {"batch": args.batch, "per_batch_mb": round(per_batch / 1e6, 1)}
    # warmup: compile consume + first-dispatch tunnel stall
    w = g.integers(0, 256, size=(1024,), dtype=np.uint8)
    _ = int(consume(jax.device_put(w, dev)))

    rows = []
    for mult in [int(m) for m in args.multiples.split(",")]:
        nbytes = per_batch * mult
        rates = []
        for r in range(args.reps):
            # fresh contents every rep: the platform caches identical uploads
            host = g.integers(0, 256, size=(nbytes,), dtype=np.uint8)
            t0 = time.perf_counter()
            x = jax.device_put(host, dev)
            _ = int(consume(x))  # value fetch = true barrier
            dt = time.perf_counter() - t0
            rates.append(nbytes / dt / 1e6)
        med = float(np.median(rates))
        rows.append({
            "mult": mult,
            "mb": round(nbytes / 1e6, 1),
            "mb_per_s": round(med, 1),
            "mb_per_s_min": round(min(rates), 1),
            "mb_per_s_max": round(max(rates), 1),
            "samples_per_s_equiv": round(med * 1e6 / args.sample_bytes, 1),
        })
    result["single_put"] = rows

    # the e2e pattern: K sequential per-batch puts (as the dispatch loop
    # does implicitly when np arrays hit the jitted forward)
    seq_rates = []
    for r in range(args.reps):
        hosts = [
            g.integers(0, 256, size=(per_batch,), dtype=np.uint8)
            for _ in range(4)
        ]
        t0 = time.perf_counter()
        out = None
        for h in hosts:
            out = consume(jax.device_put(h, dev))
        _ = int(out)
        dt = time.perf_counter() - t0
        seq_rates.append(4 * per_batch / dt / 1e6)
    med = float(np.median(seq_rates))
    result["sequential_4x_per_batch_mb_per_s"] = round(med, 1)
    result["sequential_samples_per_s_equiv"] = round(
        med * 1e6 / args.sample_bytes, 1
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
