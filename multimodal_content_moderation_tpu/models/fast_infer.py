"""uint8 wire-format inference engine (the production TPU serving path).

The parity path feeds normalized fp32 NCHW pixels (4 bytes/value). This
engine instead ships raw uint8 patch rows to the device (4x fewer wire
bytes — decisive when host->HBM bandwidth is the bottleneck) and runs the
Pallas fused normalize+patchify+embed kernel (ops/pallas_image.py), whose
folded-GEMM math is bit-equivalent to normalize->patchify->dense up to fp32
accumulation order. The rest of the tower is the shared encoder trunk.

Works for every backend x head combination the reference ships (CLIP/SigLIP
x fusion/MTL — reference scripts/evaluate.py rebuilds any of them from
``inference_config.json``): the models natively accept ``patches_u8``
batches (models/u8wire.py), so the engine is one jitted forward with the
wire format and kernel impl baked in.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_content_moderation_tpu.ops.pallas_image import extract_patches_u8


class FastInferenceEngine:
    """Jitted u8-wire-format forward for a FusionModel or MultiTaskModel.

    Multi-chip: pass a ``("data", "model")`` mesh (parallel/mesh.build_mesh)
    and the forward runs as an SPMD program over the data axis — the batch
    is sharded across chips, params replicated, and the whole per-shard
    forward (including the Pallas kernels) executes inside ``jax.shard_map``.
    shard_map is the supported composition of Mosaic kernels with
    multi-device execution: each chip runs the kernel on its local shard, so
    no GSPMD partitioning of the custom call is ever needed. This is the
    scaled-out version of the reference's eval loop
    (scripts/evaluate.py:163-183), which was single-device only.

    Single-device meshes (or ``mesh=None``) collapse to a plain ``jax.jit``:
    mesh-annotated arrays hit a pathologically slow path on some single-chip
    backends (see parallel/mesh.shard_batch) and SPMD adds nothing.
    """

    def __init__(
        self,
        model,
        params: dict,
        mean: Sequence[float],
        std: Sequence[float],
        use_pallas: Optional[bool] = None,
        mesh=None,
    ):
        if use_pallas is None:
            # the Pallas kernel targets TPU; XLA reference path elsewhere
            use_pallas = jax.default_backend() not in ("cpu",)
        self.model = dataclasses.replace(
            model,
            image_mean=tuple(float(m) for m in mean),
            image_std=tuple(float(s) for s in std),
            embed_impl="pallas" if use_pallas else "reference",
        )
        self.params = params
        vcfg = (
            self.model.clip_config.vision
            if self.model.backend == "clip"
            else self.model.siglip_config.vision
        )
        self.patch_size = vcfg.patch_size

        mdl = self.model

        def forward(params, ids, mask, patches_u8, tpres, ipres):
            batch = {
                "input_ids": ids,
                "attention_mask": mask,
                "patches_u8": patches_u8,
                "text_present": tpres,
                "image_present": ipres,
            }
            return mdl.apply(params, batch)["logits"].astype(jnp.float32)

        self.mesh = mesh if mesh is not None and mesh.devices.size > 1 else None
        if self.mesh is None:
            self._forward = jax.jit(forward)
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from multimodal_content_moderation_tpu.parallel.mesh import DATA_AXIS

            self._data_size = self.mesh.shape[DATA_AXIS]
            data = NamedSharding(self.mesh, P(DATA_AXIS))
            repl = NamedSharding(self.mesh, P())
            spmd = jax.shard_map(
                forward,
                mesh=self.mesh,
                in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                          P(DATA_AXIS), P(DATA_AXIS)),
                out_specs=P(DATA_AXIS),
                # no cross-shard collectives in the eval forward; skip the
                # varying-manner analysis (Pallas calls are opaque to it)
                check_vma=False,
            )
            self._forward = jax.jit(
                spmd,
                in_shardings=(repl, data, data, data, data, data),
                out_shardings=data,
            )
            self.params = jax.device_put(params, repl)

    def patches_from_hwc(self, images_hwc: np.ndarray) -> np.ndarray:
        """[B, H, W, C] uint8 crops -> wire-format patch rows."""
        return extract_patches_u8(images_hwc, self.patch_size)

    def __call__(self, ids, mask, patches_u8, text_present, image_present):
        if self.mesh is not None and ids.shape[0] % self._data_size:
            raise ValueError(
                f"batch size {ids.shape[0]} not divisible by the data axis "
                f"({self._data_size}); pick batch_size as a multiple (the "
                "eval loop pads the last batch, so any full batch works)"
            )
        return self._forward(
            self.params, ids, mask, patches_u8, text_present, image_present
        )


def parse_seq_buckets(spec: Optional[str]) -> Optional[Tuple[int, ...]]:
    """Parse a ``--seq_buckets`` / ``MMHARM_SEQ_BUCKETS`` value: ``auto`` ->
    the (32, 48, 64) ladder, ``off``/``none``/empty -> None, otherwise a
    comma-separated list of widths. Shared by the evaluate/inference CLIs and
    the serving handler so the spec grammar cannot drift."""
    sb = (spec or "off").strip().lower()
    if sb == "auto":
        return (32, 48, 64)
    if sb in ("off", "none", ""):
        return None
    try:
        return tuple(int(b) for b in sb.split(","))
    except ValueError:
        raise ValueError(
            f"invalid seq-buckets spec {spec!r}: expected 'auto', 'off', or a "
            "comma-separated list of token widths (e.g. '32,48,64')"
        ) from None


def bucket_ladder(
    buckets: Sequence[int], full_T: int
) -> Optional[List[int]]:
    """Sorted, deduplicated ladder of widths below ``full_T`` with ``full_T``
    appended as the terminal rung — or None when no bucket is below
    ``full_T`` (bucketing cannot help, callers should skip the machinery)."""
    ladder = sorted({int(b) for b in buckets if 0 < int(b) < full_T})
    return ladder + [full_T] if ladder else None


def bucket_for(mask, ladder: Sequence[int]) -> int:
    """Smallest ladder width covering the batch's longest row (the terminal
    rung is the full width, so this always succeeds)."""
    L = int(np.asarray(mask).sum(axis=1).max(initial=1))
    for b in ladder:
        if b >= L:
            return b
    return ladder[-1]


def evaluate_logits_u8(
    engine: FastInferenceEngine,
    dataset,
    batch_size: int,
    num_workers: int = 8,
    seq_buckets: Optional[Sequence[int]] = None,
):
    """Stream a CSVDataset (built with a uint8_hwc preprocessor) through the
    fast engine; returns (logits, labels) host arrays in the dataset's
    natural row order. Mirrors training.loop.evaluate_logits (padded last
    batch, async dispatch with a bounded in-flight window) but on the u8 wire
    format — this is the measurement boundary the reference's 400.9 samples/s
    uses (its evaluate loop includes the DataLoader,
    scripts/evaluate.py:163-183).

    ``seq_buckets`` (CLIP backend only) enables length-sorted bucketed
    evaluation: rows are visited in token-length order and each batch's
    ``input_ids``/``attention_mask`` are truncated to the smallest bucket
    covering its longest row. For CLIP this is EXACT, not approximate — the
    text tower is causal and pools the first-EOS hidden state
    (models/clip.py:clip_text_pooled), so positions past a row's EOS cannot
    influence its pooled feature; dropping padding columns removes dead
    compute the reference always pays (it pads every row to 77,
    scripts/inference.py:168-180). Each bucket is one extra XLA compile
    (static shapes; the persistent compile cache absorbs repeats). SigLIP is
    rejected: its HF text tower is bidirectional and runs WITHOUT a padding
    mask, so padding columns do feed the pooled feature there.
    """
    from multimodal_content_moderation_tpu.data.pipeline import bounded_producer

    indices = None
    full_T = dataset.input_ids.shape[1]
    if seq_buckets:
        if engine.model.backend != "clip":
            raise ValueError(
                "seq_buckets requires the CLIP backend (causal text tower + "
                f"EOS pooling); got backend={engine.model.backend!r} whose "
                "text padding is not inert"
            )
        ladder = bucket_ladder(seq_buckets, full_T)
        if ladder is not None:
            lengths = dataset.attention_mask.sum(axis=1)
            indices = np.argsort(lengths, kind="stable")

    # Host batch prep (decode-or-cache-read + u8 patch extraction) runs on a
    # background thread, two batches ahead, so it overlaps the host->device
    # transfer + dispatch of the current batch — without this the pipeline
    # serializes prep and transfer per batch (measured ~2x on a
    # transfer-bound link).
    def prep():
        for batch in dataset.batches(
            batch_size,
            pad_to_batch=True,
            num_workers=num_workers,
            indices=indices,
        ):
            valid = int(batch.pop("_valid"))
            labels = batch.pop("labels")[:valid]
            patches = engine.patches_from_hwc(batch["pixel_values"])
            if indices is not None:
                b = bucket_for(batch["attention_mask"], ladder)
                batch["input_ids"] = batch["input_ids"][:, :b]
                batch["attention_mask"] = batch["attention_mask"][:, :b]
            yield valid, labels, batch, patches

    q, _END, err, cancel = bounded_producer(prep, size=2)

    all_logits, all_labels, valids, outs = [], [], [], []
    try:
        while True:
            item = q.get()
            if item is _END:
                if err:
                    raise err[0]
                break
            valid, labels, batch, patches = item
            valids.append(valid)
            all_labels.append(labels)
            outs.append(
                engine(
                    batch["input_ids"],
                    batch["attention_mask"],
                    patches,
                    batch["text_present"],
                    batch["image_present"],
                )
            )
            if len(outs) > 2:
                all_logits.append(np.asarray(outs.pop(0)))
    finally:
        # if the device forward raised, unblock + reap the producer thread
        # (a plain q.put on the full queue would leak it in a long-lived
        # serving process — same hazard as cli/inference._logits)
        cancel()
    all_logits.extend(np.asarray(o) for o in outs)
    all_logits = [lg[:v] for lg, v in zip(all_logits, valids)]
    logits = np.concatenate(all_logits)
    labels = np.concatenate(all_labels)
    if indices is not None:  # restore the dataset's natural row order
        inv = np.empty_like(indices)
        inv[indices] = np.arange(len(indices))
        logits, labels = logits[inv], labels[inv]
    return logits, labels
