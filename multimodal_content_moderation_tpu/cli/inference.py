#!/usr/bin/env python
"""Inference CLI + high-level classifier API.

Same CLI surface and JSON result schema as the reference
``scripts/inference.py`` (single ``--text``/``--image`` prediction or
``--input_csv`` batch mode appending ``pred_*``/``prob_*`` columns), but the
implementation batches properly: the reference's ``predict_batch`` loops
B=1 forwards (scripts/inference.py:239-270, an acknowledged inefficiency);
here every path funnels into one jitted fixed-shape batched forward, with the
last partial batch padded rather than recompiled.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
from typing import Any, Dict, List, Optional

import numpy as np

from multimodal_content_moderation_tpu.cli.common import image_stats_from_dir
from multimodal_content_moderation_tpu.data.images import ImagePreprocessor
from multimodal_content_moderation_tpu.data.tokenizer import load_tokenizer

logger = logging.getLogger("mmcm.inference")


class MultiModalClassifier:
    """Checkpoint-backed classifier with single + batched prediction.

    API mirror of the reference ``MultiModalClassifier``
    (scripts/inference.py:39-270): ``predict`` returns per-class
    ``{label, probability, threshold}`` plus ``any_harmful``.
    """

    def __init__(
        self,
        checkpoint_dir: str,
        encoder_dir: Optional[str] = None,
        batch_size: int = 32,
        dtype=None,
        precision: str = "fp32",  # fp32 | bf16 | bf16_fast | int8_mlp
        engine: str = "standard",  # "standard" | "fast" (u8 wire + Pallas embed)
        image_backend: str = "pil",  # "pil" | "native" | "native_scaled"
        attention: str = "xla",  # "xla" | "pallas" (fused TPU attention kernels)
        seq_buckets: str = "auto",  # fast engine only; "off" disables
    ):
        import jax

        from multimodal_content_moderation_tpu.models import model_io

        self.model, self.params, self.config = model_io.load_checkpoint(
            checkpoint_dir, encoder_dir, dtype=dtype
        )
        if precision in ("bf16", "bf16_fast", "int8_mlp"):
            import jax.numpy as jnp

            from multimodal_content_moderation_tpu.models.convert import to_dtype

            self.model = model_io.with_performance_options(
                self.model,
                compute_dtype="bfloat16",
                scores_dtype="bfloat16" if precision != "bf16" else None,
            )
            self.params = to_dtype(self.params, jnp.bfloat16)
        if precision == "int8_mlp":
            # opt-in accuracy-impacting tier: bf16_fast + int8 fc1 GEMMs at
            # the measured-winning (768, 3072) shape (ops/quant.py; quality
            # delta recorded in docs/quality_parity_int8_mlp.json)
            from multimodal_content_moderation_tpu.ops.quant import (
                quantize_fc1_layers,
            )

            self.params, _ = quantize_fc1_layers(self.params)
        if attention != "xla":
            self.model = model_io.with_performance_options(
                self.model, attention_impl=attention
            )
        self.class_names: List[str] = self.config.get("class_names", ["harmful"])
        self.thresholds: List[float] = self.config.get(
            "thresholds", [0.5] * len(self.class_names)
        )
        # opt-in post-hoc logit adjustment (ops/losses.logit_adjust); the
        # reference wrote this flag + priors but never consumed them
        self.logit_adjustment = bool(self.config.get("use_logit_adjustment", False))
        self.priors = self.config.get("priors")
        # reference-written inference_config.json has no max_text_length
        # (scripts/train.py:357-366); clamp to the encoder's context window
        self.max_len = min(
            int(self.config.get("max_text_length", 77)),
            self.model.text_max_positions,
        )
        self.batch_size = batch_size

        enc_dir = (
            encoder_dir or self.config.get("encoder_dir") or checkpoint_dir
        )
        self.tokenizer = load_tokenizer(enc_dir)
        backend = self.config.get("backend", "clip")
        (H, W), mean, std = image_stats_from_dir(enc_dir, backend)

        self.engine = None
        if engine == "fast":
            # u8 wire-format path: raw crops ship to the device, the Pallas
            # folded-norm kernel embeds them (models/fast_infer.py; supports
            # every backend x head combination)
            from multimodal_content_moderation_tpu.models.fast_infer import (
                FastInferenceEngine,
            )

            self.preproc = ImagePreprocessor(
                H, W, mean, std, output="uint8_hwc", backend=image_backend
            )
            self.engine = FastInferenceEngine(self.model, self.params, mean, std)
        else:
            self.preproc = ImagePreprocessor(H, W, mean, std, backend=image_backend)

        # Length-bucket ladder for the fast engine: each batch's text runs at
        # the smallest static width covering its rows — EXACT for both
        # backends (CLIP: causal + first-EOS pooling makes truncation inert;
        # SigLIP: b-1 real columns + a carry column for the pooled LAST
        # position, see fast_infer.bucket_batch_text). models/fast_infer.py
        # owns the spec grammar and ladder/bucket selection. Applied per
        # batch inside forward_batch, so every consumer (predict,
        # predict_batch, the serving handler, the MicroBatcher) benefits.
        from multimodal_content_moderation_tpu.models.fast_infer import (
            bucket_ladder,
            parse_seq_buckets,
        )

        self._bucket_ladder: Optional[List[int]] = None
        buckets = parse_seq_buckets(seq_buckets)
        if buckets is not None:
            if self.engine is None:
                # 'auto' is the default and silently inapplicable; an
                # explicit ladder deserves a signal (evaluate warns too)
                if (seq_buckets or "").strip().lower() != "auto":
                    logger.warning(
                        "seq_buckets=%s ignored: requires --engine fast "
                        "(the standard engine evaluates at full text width)",
                        seq_buckets,
                    )
            else:
                self._bucket_ladder = bucket_ladder(buckets, self.max_len)

        model = self.model
        self._forward = jax.jit(lambda p, b: model.apply(p, b)["logits"])

    # -- core batched path ----------------------------------------------------

    def _logits(
        self, texts: List[str], image_paths: List[str], image_root: str = ""
    ) -> np.ndarray:
        import concurrent.futures as cf

        from multimodal_content_moderation_tpu.data.pipeline import (
            bounded_producer,
        )

        n = len(texts)
        bs = self.batch_size
        out = np.empty((n, len(self.class_names)), np.float32)

        # Length-sorted visiting order (multi-batch fast-engine jobs only):
        # tokenizing once up front and walking rows in token-length order
        # makes each batch length-homogeneous, so forward_batch's per-batch
        # bucket is the SMALL one for short rows instead of the batch max —
        # the same trick as evaluate's sorted buckets (+30% on tweet-length
        # data). Results scatter back to input positions, so callers see
        # natural order; per-row logits are batch-composition-independent
        # (every op is row-independent), so this is exact.
        order = np.arange(n)
        ids_all = mask_all = None
        if self._bucket_ladder and n > bs:
            ids_all, mask_all = self.tokenizer.encode_batch(
                list(texts), self.max_len
            )
            order = np.argsort(mask_all.sum(axis=1), kind="stable")

        # Images decode on a thread pool (GIL-free in the native backends)
        # and whole batches are prepared one ahead on a producer thread, so
        # host prep overlaps the device dispatch of the previous batch —
        # the same pipelining the evaluate path uses.
        pool = cf.ThreadPoolExecutor(max_workers=8)

        def build(s: int):
            idx = order[s : s + bs]
            ts = [texts[i] for i in idx]
            ps = [image_paths[i] for i in idx]
            valid = len(ts)
            if ids_all is not None:
                ids, mask = ids_all[idx], mask_all[idx]
            else:
                ids, mask = self.tokenizer.encode_batch(ts, self.max_len)
            results = list(
                pool.map(lambda p: self.preproc.load_relative(p, image_root), ps)
            )
            batch = {
                "input_ids": ids,
                "attention_mask": mask,
                "pixel_values": np.stack([r[0] for r in results]),
                "text_present": np.asarray(
                    [1.0 if (t or "").strip() else 0.0 for t in ts], np.float32
                ),
                "image_present": np.asarray([r[1] for r in results], np.float32),
            }
            if valid < bs:  # pad to the fixed batch shape (no recompiles)
                pad = bs - valid
                batch = {
                    k: np.concatenate(
                        [v, np.zeros((pad,) + v.shape[1:], v.dtype)], axis=0
                    )
                    for k, v in batch.items()
                }
            return idx, valid, batch

        q, _END, err, cancel = bounded_producer(
            lambda: (build(s) for s in range(0, n, bs)), size=2
        )
        try:
            while True:
                item = q.get()
                if item is _END:
                    if err:
                        raise err[0]
                    break
                idx, valid, batch = item
                out[idx[:valid]] = self.forward_batch(batch, valid)
        finally:
            # On consumer error the producer could be blocked on the full
            # queue — cancel() unblocks + reaps it so the thread, the decode
            # pool, and its prepared batches never leak in a long-lived
            # process.
            cancel()
            pool.shutdown(wait=False)
        return out

    def forward_batch(self, batch: Dict[str, np.ndarray], valid: int) -> np.ndarray:
        """One fixed-shape batch -> logits[:valid], with post-hoc logit
        adjustment applied when the config enables it. ``batch['pixel_values']``
        carries whatever ``self.preproc`` produces (u8 HWC crops on the fast
        engine, normalized fp32 NCHW otherwise); this picks the right device
        path. Shared by the API and the serving handler."""
        if self.engine is not None:
            patches = self.engine.patches_from_hwc(batch["pixel_values"])
            ids, mask = batch["input_ids"], batch["attention_mask"]
            carry = None
            if self._bucket_ladder:
                from multimodal_content_moderation_tpu.models.fast_infer import (
                    bucket_batch_text,
                    bucket_for,
                )

                backend = self.config.get("backend", "clip")
                b = bucket_for(
                    mask, self._bucket_ladder,
                    extra=0 if backend == "clip" else 1,
                )
                ids, mask, carry = bucket_batch_text(ids, mask, b, backend)
            logits = np.asarray(
                self.engine(
                    ids,
                    mask,
                    patches,
                    batch["text_present"],
                    batch["image_present"],
                    carry_pos=carry,
                )
            )
        else:
            logits = np.asarray(self._forward(self.params, batch))
        logits = logits[:valid]
        if self.logit_adjustment and self.priors:
            from multimodal_content_moderation_tpu.ops.losses import logit_adjust

            logits = logit_adjust(logits, self.priors)
        return logits

    def warmup(self) -> int:
        """Compile (or load from the persistent compile cache) every static
        shape the serving path can hit — one dummy fixed-shape batch per text
        width: each seq-bucket ladder rung on the fast+CLIP path, else the
        single full width. Returns the number of shapes warmed.

        Without this, a fresh container compiles each width lazily on first
        encounter — multi-second p99 spikes early in its life (the ladder has
        up to 4 rungs). The serving ``model_fn`` calls this at load time so
        the cost lands in container startup, where the compile cache
        (MMHARM_COMPILE_CACHE) amortizes it to a disk read."""
        widths = list(self._bucket_ladder) if self._bucket_ladder else [self.max_len]
        # SigLIP rungs reserve one carry column (bucket_for extra=1): a row
        # of w-1 real tokens lands exactly on rung w
        extra = 0 if self.config.get("backend", "clip") == "clip" else 1
        zero_pix = self.preproc.zero_output()
        for w in widths:
            mask = np.zeros((self.batch_size, self.max_len), np.int32)
            mask[:, : max(1, min(w, self.max_len) - extra)] = 1
            batch = {
                "input_ids": np.zeros((self.batch_size, self.max_len), np.int32),
                "attention_mask": mask,
                "pixel_values": np.stack([zero_pix] * self.batch_size),
                "text_present": np.ones((self.batch_size,), np.float32),
                "image_present": np.ones((self.batch_size,), np.float32),
            }
            self.forward_batch(batch, 1)
        return len(widths)

    # -- public API -------------------------------------------------------

    def predict(
        self,
        text: Optional[str] = None,
        image_path: Optional[str] = None,
        return_probs: bool = False,
    ) -> Dict[str, Any]:
        logits = self._logits([text or ""], [image_path or ""])[0]
        probs = 1.0 / (1.0 + np.exp(-logits))
        predictions = {
            name: {
                "label": bool(prob >= thresh),
                "probability": float(prob),
                "threshold": float(thresh),
            }
            for name, prob, thresh in zip(self.class_names, probs, self.thresholds)
        }
        result = {
            "predictions": predictions,
            "any_harmful": any(p["label"] for p in predictions.values()),
        }
        if return_probs:
            result["probabilities"] = probs.tolist()
        return result

    def predict_batch(
        self,
        texts: List[str],
        image_paths: List[str],
        batch_size: Optional[int] = None,
        image_root: str = "",
    ) -> List[Dict[str, Any]]:
        if batch_size:
            self.batch_size = batch_size
        logits = self._logits(list(texts), list(image_paths), image_root)
        probs = 1.0 / (1.0 + np.exp(-logits))
        results = []
        for row in probs:
            predictions = {
                name: {
                    "label": bool(p >= t),
                    "probability": float(p),
                    "threshold": float(t),
                }
                for name, p, t in zip(self.class_names, row, self.thresholds)
            }
            results.append(
                {
                    "predictions": predictions,
                    "any_harmful": any(v["label"] for v in predictions.values()),
                }
            )
        return results


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description="Run inference with a multi-modal classifier",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--encoder_dir", type=str, default=None)
    parser.add_argument("--text", type=str, default=None)
    parser.add_argument("--image", type=str, default=None)
    parser.add_argument("--input_csv", type=str, default=None)
    parser.add_argument("--output_csv", type=str, default=None)
    parser.add_argument("--image_root", type=str, default="")
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument(
        "--precision", choices=["fp32", "bf16", "bf16_fast", "int8_mlp"],
        default="fp32"
    )
    parser.add_argument(
        "--engine",
        choices=["standard", "fast"],
        default="standard",
        help="fast = uint8 wire format + Pallas fused patch embed",
    )
    parser.add_argument(
        "--image_backend",
        choices=["pil", "native", "native_scaled"],
        default="pil",
        help="JPEG decode path: pil = reference-exact; native = C++ libjpeg "
        "(bit-parity); native_scaled = DCT-scaled decode (fastest)",
    )
    parser.add_argument(
        "--attention",
        choices=["xla", "pallas"],
        default="xla",
        help="attention core: pallas = fused TPU kernels (fastest on TPU)",
    )
    parser.add_argument(
        "--seq_buckets",
        type=str,
        default="auto",
        help="length-bucketed text (fast engine): each batch's input_ids/"
        "attention_mask are shrunk to the smallest bucket covering its "
        "longest row — EXACT for both backends (CLIP: causal + EOS pooling; "
        "SigLIP: carry column for the pooled last position). 'auto' = "
        "32,48,64; 'off' disables; or a comma-separated ladder",
    )
    parser.add_argument(
        "--device",
        type=str,
        default=None,
        help="drop-in compat with the reference CLI (scripts/inference.py "
        "--device cuda|mps|cpu): 'cpu' forces the CPU backend, anything "
        "else uses the default accelerator (TPU here)",
    )
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    from multimodal_content_moderation_tpu.utils.compile_cache import (
        maybe_enable_from_env,
    )

    maybe_enable_from_env()
    print(f"Loading model from: {args.checkpoint}")
    classifier = MultiModalClassifier(
        args.checkpoint, args.encoder_dir, batch_size=args.batch_size,
        precision=args.precision, engine=args.engine,
        image_backend=args.image_backend, attention=args.attention,
        seq_buckets=args.seq_buckets,
    )
    print(f"Classes: {classifier.class_names}")

    if args.input_csv:
        import pandas as pd

        df = pd.read_csv(args.input_csv)
        texts = df["text"].fillna("").tolist()
        image_paths = df["image_path"].fillna("").tolist()
        results = classifier.predict_batch(
            texts, image_paths, args.batch_size, image_root=args.image_root
        )
        for class_name in classifier.class_names:
            df[f"pred_{class_name}"] = [
                r["predictions"][class_name]["label"] for r in results
            ]
            df[f"prob_{class_name}"] = [
                r["predictions"][class_name]["probability"] for r in results
            ]
        df["any_harmful"] = [r["any_harmful"] for r in results]
        output_path = args.output_csv or "predictions.csv"
        df.to_csv(output_path, index=False)
        print(f"Predictions saved to: {output_path}")
    elif args.text or args.image:
        result = classifier.predict(args.text, args.image, return_probs=True)
        print("=" * 40)
        print("PREDICTION RESULT")
        print("=" * 40)
        for name, pred in result["predictions"].items():
            status = "DETECTED" if pred["label"] else "not detected"
            print(
                f"  {name}: {status} (prob: {pred['probability']:.3f}, "
                f"threshold: {pred['threshold']:.2f})"
            )
        print(f"Any harmful content: {'YES' if result['any_harmful'] else 'NO'}")
    else:
        print("Error: specify --text/--image or --input_csv")
        sys.exit(1)


if __name__ == "__main__":
    main()
