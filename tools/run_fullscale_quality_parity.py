#!/usr/bin/env python
"""Full-scale quality-parity run (VERDICT r2 #3).

Builds a flagship-shaped fixture — a ViT-B/32 CLIP checkpoint at the real
architecture (12+12 layers, text d=512/8 heads, vision d=768/12 heads,
vocab 49408, image 224, fusion_dim 512) with synthetic MMHS-shaped data —
and runs tools/quality_parity.py in locked mode (identical init, identical
data order, dropout off) for ~100 optimizer steps on both the torch
reference-shaped model and the JAX model.

Real MMHS150K assets cannot be used here (no network egress, no dataset
mount), so this does NOT reproduce the published 0.569/0.783 numbers; what
it proves is that the TPU training stack (converted init + AdamW + BCE +
metrics) tracks the torch reference step-for-step AT FULL MODEL SCALE, which
is the transferable half of the +-0.005 band claim (BASELINE.md). Results
land in docs/quality_parity_fullscale.json and PARITY.md.

Runtime: ~15-30 min on a 1-CPU host (torch side dominates). Run alone.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_fullscale_encoder(d: str) -> None:
    """ViT-B/32-shaped CLIP checkpoint dir (random weights, real arch)."""
    import torch
    import transformers
    from safetensors.torch import save_file

    from multimodal_content_moderation_tpu.data.tokenizer import bytes_to_unicode

    b2u = bytes_to_unicode()
    vocab = {}
    for ch in b2u.values():
        vocab[ch] = len(vocab)
    for ch in b2u.values():
        vocab[ch + "</w>"] = len(vocab)
    merges = ["h a", "ha t", "hat e</w>", "l o", "lo v", "lov e</w>"]
    for m in merges:
        vocab["".join(m.split())] = len(vocab)
    # pad to the real CLIP vocab size so the embedding table (and every
    # other matmul) is at flagship shape; filler tokens are never produced
    # by the BPE so they are inert
    i = 0
    while len(vocab) < 49406:
        tok = f"fill{i}</w>"
        if tok not in vocab:
            vocab[tok] = len(vocab)
        i += 1
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    assert len(vocab) == 49408
    with open(os.path.join(d, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(d, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
        for m in merges:
            f.write(m + "\n")

    hf_cfg = transformers.CLIPConfig()  # openai/clip-vit-base-patch32 shape
    torch.manual_seed(0)
    model = transformers.CLIPModel(hf_cfg).eval()
    save_file(model.state_dict(), os.path.join(d, "model.safetensors"))
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(hf_cfg.to_dict(), f)
    with open(os.path.join(d, "preprocessor_config.json"), "w") as f:
        json.dump(
            {
                "size": {"shortest_edge": 224},
                "crop_size": {"height": 224, "width": 224},
                "image_mean": [0.48145466, 0.4578275, 0.40821073],
                "image_std": [0.26862954, 0.26130258, 0.27577711],
            },
            f,
        )


def build_fullscale_siglip_encoder(d: str) -> None:
    """SigLIP-B/16-224-shaped checkpoint dir (random weights, real arch:
    12+12 layers, d=768 both towers, 196 patch tokens, vocab 32000)."""
    import torch
    import transformers
    from safetensors.torch import save_file

    # full-size WordLevel tokenizer.json (32k vocab) served by the native
    # tokenizer.json engine; the sample words make synthetic text non-trivial
    words = ["<unk>", "<pad>", "hate", "love", "people", "you", "stop", "go",
             "bad", "good"]
    vocab = {w: i for i, w in enumerate(words)}
    i = 0
    while len(vocab) < 32000:
        tok = f"fill{i}"
        if tok not in vocab:
            vocab[tok] = len(vocab)
        i += 1
    tok_json = {
        "version": "1.0",
        "normalizer": {"type": "Lowercase"},
        "pre_tokenizer": {"type": "Whitespace"},
        "model": {"type": "WordLevel", "vocab": vocab, "unk_token": "<unk>"},
        "added_tokens": [],
        "post_processor": None,
        "decoder": None,
    }
    with open(os.path.join(d, "tokenizer.json"), "w") as f:
        json.dump(tok_json, f)
    with open(os.path.join(d, "tokenizer_config.json"), "w") as f:
        json.dump({"pad_token": "<pad>"}, f)

    hf_cfg = transformers.SiglipConfig()  # == google/siglip-base-patch16-224
    torch.manual_seed(0)
    model = transformers.SiglipModel(hf_cfg).eval()
    save_file(model.state_dict(), os.path.join(d, "model.safetensors"))
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(hf_cfg.to_dict(), f)
    with open(os.path.join(d, "preprocessor_config.json"), "w") as f:
        json.dump(
            {
                "size": {"height": 224, "width": 224},
                "image_mean": [0.5, 0.5, 0.5],
                "image_std": [0.5, 0.5, 0.5],
            },
            f,
        )


def build_synthetic_mmhs(d: str, n_train: int, n_val: int) -> None:
    """MMHS-shaped CSVs + JPEGs: 5 classes, multi-label, skewed priors."""
    import pandas as pd
    from PIL import Image

    img_dir = os.path.join(d, "images")
    os.makedirs(img_dir, exist_ok=True)
    names = ["racist", "sexist", "homophobe", "religion", "otherhate"]
    # rough MMHS prior skew (racist/otherhate common, religion rare)
    priors = np.array([0.35, 0.18, 0.12, 0.04, 0.30])
    words = ["hate", "love", "people", "you", "stop", "go", "bad", "good"]
    g = np.random.default_rng(0)

    def rows(n, offset):
        out = []
        for i in range(n):
            k = i + offset
            active = [nm for nm, p in zip(names, priors) if g.random() < p]
            img = f"im{k}.jpg"
            # content correlated with labels so training actually learns
            base = 40 + 30 * len(active)
            arr = g.integers(base, base + 120, size=(224, 224, 3)).astype(np.uint8)
            Image.fromarray(arr).save(os.path.join(img_dir, img), quality=85)
            text = " ".join(
                g.choice(words, size=6).tolist()
                + (["hate"] * min(len(active), 3))
            )
            out.append({"text": text, "image_path": img, "labels": ",".join(active)})
        return out

    pd.DataFrame(rows(n_train, 0)).to_csv(os.path.join(d, "train.csv"), index=False)
    pd.DataFrame(rows(n_val, 10_000)).to_csv(os.path.join(d, "val.csv"), index=False)


def main():
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--n_train", type=int, default=400)
    ap.add_argument("--n_val", type=int, default=96)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--head", choices=["fusion", "mtl"], default="fusion")
    ap.add_argument("--backend", choices=["clip", "siglip"], default="clip")
    ap.add_argument(
        "--jax_fast", action="store_true",
        help="JAX side trains with the PRODUCTION fast config (u8 wire + "
        "bf16 compute/scores + bf16 Adam accumulators + text_fit); torch "
        "stays fp32 — proves the recommended 3,436 samples/s recipe holds "
        "the +-0.005 band at full scale (VERDICT r3 #2)",
    )
    ap.add_argument(
        "--int8_eval", action="store_true",
        help="also evaluate the trained JAX model with the opt-in int8_mlp "
        "tier and record its deltas in the artifact (VERDICT r4 #7)",
    )
    ap.add_argument(
        "--platform", choices=["cpu", "tpu"], default="cpu",
        help="tpu runs the JAX side on the real chip (Pallas kernels, the "
        "true production config); cpu uses the XLA reference paths",
    )
    ap.add_argument("--output", default="")
    args = ap.parse_args()
    if not args.output:
        suffix = "" if args.backend == "clip" else f"_{args.backend}"
        if args.jax_fast:
            suffix += "_fast"
        if args.int8_eval:
            suffix += "_int8"
        args.output = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "docs", f"quality_parity_fullscale{suffix}.json",
        )

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")  # axon overrides JAX_PLATFORMS

    from tools.quality_parity import run

    t0 = time.time()
    with tempfile.TemporaryDirectory() as tmp:
        enc = os.path.join(tmp, "encoder")
        data = os.path.join(tmp, "data")
        os.makedirs(enc)
        os.makedirs(data)
        if args.backend == "siglip":
            print("[fullscale-parity] building SigLIP-B/16 fixture ...", flush=True)
            build_fullscale_siglip_encoder(enc)
        else:
            print("[fullscale-parity] building ViT-B/32 fixture ...", flush=True)
            build_fullscale_encoder(enc)
        build_synthetic_mmhs(data, args.n_train, args.n_val)
        print("[fullscale-parity] training both sides (locked mode) ...", flush=True)
        report = run(
            enc,
            os.path.join(data, "train.csv"),
            os.path.join(data, "val.csv"),
            image_root=os.path.join(data, "images"),
            mode="locked",
            epochs=args.epochs,
            batch_size=args.batch_size,
            lr=1e-4,
            weight_decay=0.01,
            fusion_dim=512,
            max_text_length=64 if args.backend == "siglip" else 77,
            head=args.head,
            head_hidden_dim=256 if args.head == "mtl" else 0,
            backend=args.backend,
            jax_fast=args.jax_fast,
            int8_eval=args.int8_eval,
        )
    report["scale"] = {
        "text": "12L/8H/d512" if args.backend == "clip" else "12L/12H/d768",
        "vision": (
            "12L/12H/d768 ViT-B/32" if args.backend == "clip"
            else "12L/12H/d768 SigLIP-B/16 (196 patches, MAP head)"
        ),
        "vocab": 49408 if args.backend == "clip" else 32000,
        "image": 224, "fusion_dim": 512,
        "n_train": args.n_train, "epochs": args.epochs,
        "batch_size": args.batch_size,
    }
    report["wallclock_s"] = round(time.time() - t0, 1)
    print(json.dumps(report, indent=2))
    with open(args.output, "w") as f:
        json.dump(report, f, indent=2)
    ok = (
        report["delta"].get("f1_macro", 1.0) <= 0.005
        and report["delta"].get("roc_macro", 1.0) <= 0.005
    )
    print(f"[fullscale-parity] band check (+-0.005): {'PASS' if ok else 'FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
