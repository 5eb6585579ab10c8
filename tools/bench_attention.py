#!/usr/bin/env python
"""Attention-core crossover bench: XLA einsum chain vs the Pallas blockwise
flash kernel (ops/pallas_attention.py), across sequence lengths.

The flagship encoders (seq 77/50/196) measured faster on XLA; the Pallas
kernel is the long-context headroom path (SURVEY §5). This tool measures
where the crossover actually is on the chip.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--seqs", default="128,256,512,1024,2048,4096")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from multimodal_content_moderation_tpu.ops.layers import mha

    B, D, H = args.batch, args.dim, args.heads
    g = np.random.default_rng(0)
    p = {
        k: {
            "w": jnp.asarray(g.normal(size=(D, D)) * D**-0.5, jnp.bfloat16),
            "b": jnp.zeros((D,), jnp.bfloat16),
        }
        for k in ("q", "k", "v", "o")
    }

    results = []
    for T in [int(s) for s in args.seqs.split(",") if s]:
        xs = [
            jax.device_put(jnp.asarray(g.normal(size=(B, T, D)), jnp.bfloat16))
            for _ in range(4)
        ]
        row = {"seq": T}
        for impl in ("xla", "pallas"):
            f = jax.jit(lambda x, impl=impl: mha(x, x, p, H, impl=impl))
            try:
                _ = float(f(xs[0])[0, 0, 0])  # compile + barrier
                out = None
                t0 = time.perf_counter()
                for i in range(args.iters):
                    out = f(xs[i % 4])
                _ = float(out[0, 0, 0])
                row[impl + "_us"] = round(
                    (time.perf_counter() - t0) / args.iters * 1e6
                )
            except Exception as e:  # pragma: no cover - kernel limits
                row[impl + "_us"] = f"error: {type(e).__name__}"
        if isinstance(row.get("xla_us"), int) and isinstance(
            row.get("pallas_us"), int
        ):
            row["pallas_speedup"] = round(row["xla_us"] / row["pallas_us"], 2)
        results.append(row)
        print(json.dumps(row), flush=True)

    winners = [
        r["seq"] for r in results if isinstance(r.get("pallas_speedup"), float)
        and r["pallas_speedup"] > 1.0
    ]
    print(
        json.dumps(
            {
                "metric": "attention_crossover_seq",
                "value": min(winners) if winners else None,
                "unit": "tokens",
            }
        )
    )


if __name__ == "__main__":
    main()
