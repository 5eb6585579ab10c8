"""JSON serving handler with the SageMaker-style contract.

Mirrors the reference ``sagemaker/inference.py`` request path
(model_fn -> input_fn -> predict_fn -> output_fn, :55-348) and JSONL batch
transform (:355-388), with the same payload schema:

  request:  {"text": ..., "image": <base64>|"image_url": ...}
            or {"instances": [...]}
  response: {"predictions": [{"class_predictions": {...},
             "probabilities": {...}, "any_harmful": bool}]}

Implementation differences (TPU-first): instances are batched through one
jitted fixed-shape forward instead of B=1 loops, and image decode failures
degrade to zero pixels + presence 0 exactly like the reference (:315-331).
"""

from __future__ import annotations

import base64
import json
import logging
from typing import Any, Dict, List, Optional

import numpy as np

logger = logging.getLogger(__name__)


def model_fn(model_dir: str, encoder_dir: Optional[str] = None):
    """Load the classifier bundle once at endpoint start
    (reference sagemaker/inference.py:55-153).

    Serving knobs come from the environment (the SageMaker way to configure a
    container): MMHARM_ENGINE=fast selects the u8 wire + Pallas embed path,
    MMHARM_PRECISION in {fp32, bf16, bf16_fast, int8_mlp} sets compute
    precision (int8_mlp = bf16_fast + opt-in int8 fc1 GEMMs, ops/quant.py),
    MMHARM_IMAGE_BACKEND in {pil, native, native_scaled} picks the JPEG
    decode path (native_* = fused C++ libjpeg, GIL-free), and
    MMHARM_ATTENTION in {xla, pallas} picks the attention core (pallas =
    fused TPU kernels), MMHARM_SEQ_BUCKETS (fast engine; default 'auto' =
    32,48,64, 'off' disables) runs each batch's text at the smallest static
    bucket covering its longest row — exact for both backends (CLIP: causal
    + EOS pooling; SigLIP: carry column for the pooled last position), and
    MMHARM_COMPILE_CACHE=<dir|1> persists XLA
    executables across container restarts (utils/compile_cache — turns the
    ~20-40 s first-jit cold start into a disk read)."""
    import os

    from multimodal_content_moderation_tpu.cli.inference import MultiModalClassifier
    from multimodal_content_moderation_tpu.utils.compile_cache import (
        maybe_enable_from_env,
    )

    maybe_enable_from_env()

    classifier = MultiModalClassifier(
        model_dir,
        encoder_dir,
        precision=os.environ.get("MMHARM_PRECISION", "fp32"),
        engine=os.environ.get("MMHARM_ENGINE", "standard"),
        image_backend=os.environ.get("MMHARM_IMAGE_BACKEND", "pil"),
        attention=os.environ.get("MMHARM_ATTENTION", "xla"),
        seq_buckets=os.environ.get("MMHARM_SEQ_BUCKETS", "auto"),
    )
    if os.environ.get("MMHARM_PREWARM", "1") != "0":
        # compile every text-width the request path can hit NOW, at load
        # time, instead of lazily under the device lock on first encounter
        # (with seq buckets the ladder has up to 4 rungs -> multi-second p99
        # spikes early in a cold container's life). MMHARM_PREWARM=0 skips.
        n = classifier.warmup()
        logger.info("model_fn: pre-warmed %d batch shape(s)", n)
    return classifier


def input_fn(request_body: str, content_type: str = "application/json") -> List[Dict]:
    """Parse a JSON request; single objects are wrapped into ``instances``
    (reference sagemaker/inference.py:169-201)."""
    if content_type != "application/json":
        raise ValueError(f"Unsupported content type: {content_type}")
    data = json.loads(request_body)
    if isinstance(data, dict) and "instances" in data:
        return list(data["instances"])
    if isinstance(data, list):
        return data
    return [data]


def _image_bytes(instance: Dict[str, Any]) -> Optional[bytes]:
    """base64 ``image`` or ``image_url`` -> raw encoded bytes; failures ->
    None (degraded modality, reference sagemaker/inference.py:301-331).
    Decoding itself happens in ImagePreprocessor.process_bytes so JPEGs hit
    the fused native libjpeg path."""
    try:
        b64 = instance.get("image") or instance.get("image_base64")
        if b64:  # both keys accepted (reference uses "image_base64")
            return base64.b64decode(b64)
        if instance.get("image_url"):
            import urllib.request

            with urllib.request.urlopen(instance["image_url"], timeout=10) as r:
                return r.read()
    except Exception as e:
        logger.warning("image fetch failed: %s", e)
    return None


def predict_fn(
    instances: List[Dict[str, Any]], classifier, device_lock=None
) -> List[Dict[str, Any]]:
    """Batched prediction over parsed instances.

    ``device_lock`` (optional) serializes ONLY the device forward: the host
    stages — base64 decode, JPEG decode (GIL-free in the native backends),
    tokenize, batch assembly — run outside it, so a threaded server overlaps
    one request's host prep with another's device dispatch + fetch instead
    of serializing whole requests (the forward's wait is IO on remote-device
    hosts, so this pipelines even on a single core)."""
    texts: List[str] = []
    pixel_arrays: List[np.ndarray] = []
    presences: List[float] = []
    for inst in instances:
        texts.append(inst.get("text") or "")
        raw = _image_bytes(inst)
        if raw is None:
            pixel_arrays.append(classifier.preproc.zero_output())
            presences.append(0.0)
        else:
            arr, present = classifier.preproc.process_bytes(raw)
            pixel_arrays.append(arr)
            presences.append(present)

    n = len(instances)
    bs = classifier.batch_size
    results = []
    for s in range(0, n, bs):
        ts = texts[s : s + bs]
        valid = len(ts)
        ids, mask = classifier.tokenizer.encode_batch(ts, classifier.max_len)
        batch = {
            "input_ids": ids,
            "attention_mask": mask,
            "pixel_values": np.stack(pixel_arrays[s : s + valid]),
            "text_present": np.asarray(
                [1.0 if t.strip() else 0.0 for t in ts], np.float32
            ),
            "image_present": np.asarray(presences[s : s + valid], np.float32),
        }
        if valid < bs:
            pad = bs - valid
            batch = {
                k: np.concatenate([v, np.zeros((pad,) + v.shape[1:], v.dtype)])
                for k, v in batch.items()
            }
        if device_lock is not None:
            with device_lock:
                logits = classifier.forward_batch(batch, valid)
        else:
            logits = classifier.forward_batch(batch, valid)
        probs = 1.0 / (1.0 + np.exp(-logits))
        for row in probs:
            class_predictions = {
                name: bool(p >= t)
                for name, p, t in zip(
                    classifier.class_names, row, classifier.thresholds
                )
            }
            results.append(
                {
                    "class_predictions": class_predictions,
                    "probabilities": {
                        name: float(p)
                        for name, p in zip(classifier.class_names, row)
                    },
                    "any_harmful": any(class_predictions.values()),
                }
            )
    return results


def output_fn(predictions: List[Dict], accept: str = "application/json") -> str:
    """Serialize the response (reference sagemaker/inference.py:334-348)."""
    if accept != "application/json":
        raise ValueError(f"Unsupported accept type: {accept}")
    return json.dumps({"predictions": predictions})


class BatchTransformHandler:
    """JSONL batch transform: one JSON instance per line; per-line errors are
    captured, not fatal (reference sagemaker/inference.py:355-388)."""

    def __init__(self, classifier):
        self.classifier = classifier

    def process_lines(self, lines: List[str]) -> List[str]:
        out = []
        parsed: List[Optional[Dict]] = []
        for line in lines:
            line = line.strip()
            if not line:
                parsed.append(None)
                continue
            try:
                parsed.append(json.loads(line))
            except Exception as e:
                parsed.append({"__error__": str(e)})

        ok = [p for p in parsed if p is not None and "__error__" not in p]
        preds = predict_fn(ok, self.classifier) if ok else []
        it = iter(preds)
        for p in parsed:
            if p is None:
                continue
            if "__error__" in p:
                out.append(json.dumps({"error": p["__error__"]}))
            else:
                out.append(json.dumps(next(it)))
        return out

    def process_file(self, input_path: str, output_path: str) -> None:
        with open(input_path, "r", encoding="utf-8") as f:
            lines = f.readlines()
        results = self.process_lines(lines)
        with open(output_path, "w", encoding="utf-8") as f:
            for r in results:
                f.write(r + "\n")


def _local_test_main(argv=None):
    """Local smoke of the endpoint contract without a SageMaker runtime
    (reference sagemaker/inference.py:395-424)."""
    import argparse
    import base64
    import os

    parser = argparse.ArgumentParser(description="Test the serving handler locally")
    parser.add_argument("--model-dir", required=True)
    parser.add_argument("--encoder-dir", default=None)
    parser.add_argument("--text", default="Test content")
    parser.add_argument("--image", default=None)
    args = parser.parse_args(argv)

    artifacts = model_fn(args.model_dir, args.encoder_dir)
    instance = {"text": args.text}
    if args.image and os.path.exists(args.image):
        with open(args.image, "rb") as f:
            instance["image_base64"] = base64.b64encode(f.read()).decode("utf-8")
    body = json.dumps({"instances": [instance]})
    result = predict_fn(input_fn(body), artifacts)
    print(output_fn(result))
    return result


if __name__ == "__main__":  # pragma: no cover
    _local_test_main()
