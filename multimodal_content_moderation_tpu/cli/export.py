#!/usr/bin/env python
"""Export a trained run to a reference-format checkpoint.

Converts an Orbax run checkpoint (this framework's training output) into a
``model.safetensors`` + ``inference_config.json`` bundle with the PyTorch
reference's exact state-dict layout, so reference users can consume
TPU-trained models directly.

Usage:
    python -m multimodal_content_moderation_tpu.cli.export \
        --checkpoint runs/exp/checkpoint-N --output_dir exported/
"""

from __future__ import annotations

import argparse
import os
import shutil


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Export run to reference format")
    p.add_argument("--checkpoint", required=True, help="Orbax checkpoint dir")
    p.add_argument("--encoder_dir", default=None)
    p.add_argument("--output_dir", required=True)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    from multimodal_content_moderation_tpu.models import model_io
    from multimodal_content_moderation_tpu.models.export import export_safetensors
    from multimodal_content_moderation_tpu.models.model_io import find_inference_config
    from multimodal_content_moderation_tpu.utils.config import save_json

    model, params, cfg = model_io.load_checkpoint(args.checkpoint, args.encoder_dir)
    os.makedirs(args.output_dir, exist_ok=True)
    ckpt_dir = os.path.join(args.output_dir, "checkpoint-exported")
    os.makedirs(ckpt_dir, exist_ok=True)
    path = export_safetensors(params, model, os.path.join(ckpt_dir, "model.safetensors"))

    out_cfg = dict(cfg)
    out_cfg.pop("format", None)  # reference format, not orbax
    out_cfg["best_checkpoint_dir"] = ckpt_dir
    save_json(out_cfg, os.path.join(args.output_dir, "inference_config.json"))

    # carry tokenizer/preprocessor assets when available so the bundle is
    # self-contained
    enc = args.encoder_dir or cfg.get("encoder_dir")
    if enc and os.path.isdir(enc):
        for name in (
            "vocab.json",
            "merges.txt",
            "vocab.txt",  # BERT-family WordPiece (generic backend)
            "special_tokens_map.json",
            "tokenizer.json",
            "tokenizer_config.json",
            "preprocessor_config.json",
            "config.json",
        ):
            src = os.path.join(enc, name)
            if os.path.exists(src):
                shutil.copy2(src, os.path.join(ckpt_dir, name))

    print(f"Exported reference-format checkpoint to: {path}")
    return path


if __name__ == "__main__":
    main()
