#!/usr/bin/env python
"""Evaluation CLI — mirrors the reference ``scripts/evaluate.py`` surface:
loads a checkpoint (+ its inference_config.json), streams the test CSV
through the jitted batched forward, and writes ``eval_results.json`` with the
detailed metric schema (mean-threshold overall metrics + per-class calibrated
F1 — reference scripts/evaluate.py:227-239)."""

from __future__ import annotations

import argparse
import os

import numpy as np

from multimodal_content_moderation_tpu.cli.common import image_stats_from_dir
from multimodal_content_moderation_tpu.data.dataset import CSVDataset
from multimodal_content_moderation_tpu.data.images import ImagePreprocessor
from multimodal_content_moderation_tpu.data.tokenizer import load_tokenizer
from multimodal_content_moderation_tpu.utils.config import save_json


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description="Evaluate a multi-modal classifier",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--encoder_dir", type=str, default=None)
    parser.add_argument("--test_csv", type=str, required=True)
    parser.add_argument("--image_root", type=str, default="")
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--output", type=str, default=None)
    parser.add_argument(
        "--precision",
        choices=["fp32", "bf16", "bf16_fast", "int8_mlp"],
        default="fp32",
        help="fp32 = strict parity; bf16 = mixed precision; bf16_fast adds "
        "bf16 attention scores (fastest at parity-grade numerics, small "
        "logit rounding); int8_mlp = bf16_fast + int8 fc1 GEMMs at the "
        "measured-winning (768, 3072) shape — OPT-IN, accuracy-impacting "
        "(quality delta recorded in docs/quality_parity_int8_mlp.json)",
    )
    parser.add_argument(
        "--engine",
        choices=["standard", "fast"],
        default="standard",
        help="fast = uint8 wire format + Pallas fused patch embed (the "
        "production serving path; combine with --precision bf16_fast)",
    )
    parser.add_argument(
        "--attention",
        choices=["xla", "pallas"],
        default="xla",
        help="attention core: pallas = fused TPU kernels (the [B,T,D]-layout "
        "short-seq kernel / flash at long seq; fastest on TPU, fp32 softmax "
        "inside the kernel). xla = plain einsum chain",
    )
    parser.add_argument(
        "--seq_buckets",
        type=str,
        default="auto",
        help="length-sorted bucketed evaluation (fast engine): comma-"
        "separated ladder of static text lengths, e.g. '32,48,64'; each "
        "batch runs at the smallest bucket covering its longest row. EXACT "
        "for both backends (CLIP: causal + EOS pooling makes truncation "
        "inert; SigLIP: a carry column holds the pooled last position). "
        "'auto' = 32,48,64 when applicable; 'off' disables",
    )
    parser.add_argument(
        "--image_backend",
        choices=["pil", "native", "native_scaled"],
        default="pil",
        help="JPEG decode path: pil = reference-exact; native = C++ libjpeg "
        "(bit-parity, GIL-free); native_scaled adds DCT-domain downscaling "
        "during decode (fastest host pipeline)",
    )
    parser.add_argument(
        "--image_cache",
        type=str,
        default=None,
        help="directory for the decode-once pixel cache (data/cache.py): "
        "the first pass decodes and fills a memmap, repeat evaluations "
        "of the same CSV become device-bound",
    )
    parser.add_argument(
        "--device",
        type=str,
        default=None,
        help="drop-in compat with the reference CLI (scripts/evaluate.py "
        "--device cuda|mps|cpu): 'cpu' forces the CPU backend, anything "
        "else uses the default accelerator (TPU here)",
    )
    return parser.parse_args(argv)


def _apply_device_flag(device):
    """Map the reference's --device flag onto JAX platform selection. Must
    run before first device use; non-cpu values (cuda/mps) mean "use the
    accelerator", which here is the default backend."""
    if device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")


def main(argv=None):
    args = parse_args(argv)
    _apply_device_flag(args.device)

    from multimodal_content_moderation_tpu.utils.compile_cache import (
        maybe_enable_from_env,
    )

    maybe_enable_from_env()

    from multimodal_content_moderation_tpu.models import model_io
    from multimodal_content_moderation_tpu.parallel.mesh import build_mesh, replicate
    from multimodal_content_moderation_tpu.training.loop import (
        evaluate_logits,
        make_eval_step,
    )
    from multimodal_content_moderation_tpu.training.metrics import (
        compute_detailed_metrics,
    )
    from sklearn.metrics import f1_score

    print(f"Loading model from: {args.checkpoint}")
    model, params, config = model_io.load_checkpoint(args.checkpoint, args.encoder_dir)
    if args.precision in ("bf16", "bf16_fast", "int8_mlp"):
        import jax.numpy as jnp

        from multimodal_content_moderation_tpu.models.convert import to_dtype

        model = model_io.with_performance_options(
            model,
            compute_dtype="bfloat16",
            scores_dtype="bfloat16" if args.precision != "bf16" else None,
        )
        params = to_dtype(params, jnp.bfloat16)
    if args.precision == "int8_mlp":
        from multimodal_content_moderation_tpu.ops.quant import (
            quantize_fc1_layers,
        )

        params, nq = quantize_fc1_layers(params)
        print(f"int8 MLP: quantized {nq} fc1 layers (opt-in, eval-only)")
    if args.attention != "xla":
        model = model_io.with_performance_options(
            model, attention_impl=args.attention
        )
    class_names = config.get("class_names", ["harmful"])
    thresholds = config.get("thresholds", [0.5] * len(class_names))
    print(f"Classes: {class_names}")
    print(f"Thresholds: {thresholds}")

    enc_dir = args.encoder_dir or config.get("encoder_dir") or args.checkpoint
    tokenizer = load_tokenizer(enc_dir)
    (H, W), mean, std = image_stats_from_dir(enc_dir, config.get("backend", "clip"))
    preproc = ImagePreprocessor(
        H, W, mean, std,
        output="uint8_hwc" if args.engine == "fast" else "float_nchw",
        backend=args.image_backend,
    )
    test_ds = CSVDataset(
        args.test_csv,
        args.image_root,
        tokenizer,
        preproc,
        min(int(config.get("max_text_length", 77)), model.text_max_positions),
        class_names=class_names if len(class_names) > 1 else None,
        cache_dir=args.image_cache,
    )
    print(f"Test samples: {len(test_ds)}")

    import time

    if args.engine == "fast":
        from multimodal_content_moderation_tpu.models.fast_infer import (
            FastInferenceEngine,
            evaluate_logits_u8,
            parse_seq_buckets,
        )

        # north-star path: the fast engine runs SPMD over the data axis of
        # the device mesh (single-chip hosts collapse to plain jit)
        engine = FastInferenceEngine(model, params, mean, std, mesh=build_mesh())
        # exact for both backends: CLIP truncates (causal + EOS pooling),
        # SigLIP carries the pooled last position (fast_infer.bucket_batch_text)
        buckets = parse_seq_buckets(args.seq_buckets)
        t0 = time.time()
        logits, labels = evaluate_logits_u8(
            engine, test_ds, args.batch_size, seq_buckets=buckets
        )
        dt = time.time() - t0
    else:
        if (args.seq_buckets or "off").strip().lower() not in ("auto", "off", "none", ""):
            # mirror cli/inference.py: an explicit ladder silently doing
            # nothing would be a trap, so say so (auto stays quiet — it is
            # the default spec, simply inapplicable here)
            print(
                f"WARNING: seq_buckets={args.seq_buckets} ignored: requires "
                "--engine fast (standard engine evaluates at full text width)"
            )
        mesh = build_mesh()
        params = replicate(params, mesh)
        t0 = time.time()
        logits, labels = evaluate_logits(
            make_eval_step(model), params, test_ds, args.batch_size, mesh
        )
        dt = time.time() - t0
    if config.get("use_logit_adjustment") and config.get("priors"):
        from multimodal_content_moderation_tpu.ops.losses import logit_adjust

        logits = logit_adjust(logits, config["priors"])
    probs = 1 / (1 + np.exp(-logits))

    mean_threshold = float(np.mean(thresholds))
    metrics = compute_detailed_metrics(probs, labels, mean_threshold, class_names)
    for i, (name, thresh) in enumerate(zip(class_names, thresholds)):
        bin_pred = (probs[:, i] >= thresh).astype(int)
        metrics["per_class"][name]["f1_calibrated"] = float(
            f1_score(labels[:, i], bin_pred, zero_division=0)
        )
        metrics["per_class"][name]["threshold"] = thresh
    metrics["runtime"] = dt
    metrics["samples_per_second"] = len(test_ds) / dt if dt > 0 else 0.0

    print("=" * 60)
    print("EVALUATION RESULTS")
    print("=" * 60)
    print(f"F1 Macro: {metrics['f1_macro']:.4f}")
    print(f"F1 Micro: {metrics['f1_micro']:.4f}")
    print(f"ROC-AUC Macro: {metrics['roc_auc_macro']:.4f}")
    print(f"Throughput: {metrics['samples_per_second']:.1f} samples/s")
    for name, cm in metrics["per_class"].items():
        print(
            f"  {name}: f1={cm['f1']:.4f} cal={cm.get('f1_calibrated', 0):.4f} "
            f"roc={cm['roc_auc']:.4f} support={cm['support']}"
        )

    output_path = args.output or os.path.join(args.checkpoint, "eval_results.json")
    save_json(metrics, output_path)
    print(f"Results saved to: {output_path}")
    return metrics


if __name__ == "__main__":
    main()
