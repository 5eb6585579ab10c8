#!/usr/bin/env python
"""Logit-parity checker: this framework vs the PyTorch/HF reference.

For users holding real checkpoint assets (a local clone of the encoder and/or
a reference run checkpoint), verifies end-to-end logits agree to the 1e-3
target (BASELINE.md). Requires torch + transformers (the ``dev`` extra).

Usage:
    python tools/parity_check.py --checkpoint runs/exp/checkpoint-N \
        [--encoder_dir /path/to/clip] [--n 8] [--tol 1e-3]

Builds the torch model from the same assets, feeds identical random-ish
inputs through both stacks, and reports max |diff|.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--encoder_dir", default=None)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--tol", type=float, default=1e-3)
    args = ap.parse_args()

    import torch

    from multimodal_content_moderation_tpu.models import model_io

    model, params, cfg = model_io.load_checkpoint(args.checkpoint, args.encoder_dir)
    enc_dir = args.encoder_dir or cfg.get("encoder_dir") or args.checkpoint

    # --- torch reference stack from the same assets
    import transformers

    backend = cfg.get("backend", "clip")
    head = cfg.get("head", "fusion")
    if backend != "clip" or head != "fusion":
        raise SystemExit(
            "parity_check currently drives the clip+fusion flagship; other "
            "combos are covered by the unit suite (tests/test_head_parity.py)"
        )

    hf = transformers.CLIPModel.from_pretrained(enc_dir)
    hf.eval()

    tcfg = model.clip_config.text
    g = np.random.default_rng(0)
    B = args.n
    T = tcfg.max_positions
    ids = g.integers(1, tcfg.vocab_size - 2, size=(B, T)).astype(np.int64)
    ids[:, T // 2] = tcfg.eos_token_id
    mask = np.ones((B, T), np.int64)
    img = model.image_size
    px = g.normal(size=(B, 3, img, img)).astype(np.float32)

    with torch.no_grad():
        t_ref = hf.get_text_features(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).numpy()
        v_ref = hf.get_image_features(pixel_values=torch.tensor(px)).numpy()

    from multimodal_content_moderation_tpu.models.clip import (
        clip_image_features,
        clip_text_features,
    )

    t_got = np.asarray(
        clip_text_features(params["backbone"], ids, mask, model.clip_config)
    )
    v_got = np.asarray(clip_image_features(params["backbone"], px, model.clip_config))

    t_err = float(np.abs(t_got - t_ref).max())
    v_err = float(np.abs(v_got - v_ref).max())
    print(f"text feature max |diff|:  {t_err:.2e}")
    print(f"image feature max |diff|: {v_err:.2e}")
    ok = t_err < args.tol and v_err < args.tol
    print("PARITY OK" if ok else "PARITY FAILED")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
