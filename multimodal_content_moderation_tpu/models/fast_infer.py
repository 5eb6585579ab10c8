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
        if self.model.backend == "clip":
            vcfg = self.model.clip_config.vision
        elif self.model.backend == "generic":
            vcfg = self.model.generic_config.vision
        else:
            vcfg = self.model.siglip_config.vision
        self.patch_size = vcfg.patch_size

        mdl = self.model

        def make_forward(carry_pos: Optional[int]):
            def forward(params, ids, mask, patches_u8, tpres, ipres):
                batch = {
                    "input_ids": ids,
                    "attention_mask": mask,
                    "patches_u8": patches_u8,
                    "text_present": tpres,
                    "image_present": ipres,
                }
                if carry_pos is not None:
                    # bucketed SigLIP text: the last column is the carry slot
                    # (PAD token with mask 0, evaluated at the position the
                    # UNBUCKETED run pools — full_width-1, which callers pass
                    # as carry_pos) — see siglip_text_features' docstring for
                    # the exactness argument. Positions are a static function
                    # of (width, carry_pos), so this stays a compile-time
                    # constant in the HLO.
                    T = ids.shape[1]
                    batch["position_ids"] = jnp.concatenate(
                        [
                            jnp.arange(T - 1, dtype=jnp.int32),
                            jnp.full((1,), carry_pos, jnp.int32),
                        ]
                    )
                return mdl.apply(params, batch)["logits"].astype(jnp.float32)

            return forward

        self.mesh = mesh if mesh is not None and mesh.devices.size > 1 else None
        self._forwards = {}
        if self.mesh is None:
            self._jit_forward = lambda carry: jax.jit(make_forward(carry))
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from multimodal_content_moderation_tpu.parallel.mesh import DATA_AXIS

            self._data_size = self.mesh.shape[DATA_AXIS]
            data = NamedSharding(self.mesh, P(DATA_AXIS))
            repl = NamedSharding(self.mesh, P())

            def jit_spmd(carry: bool):
                spmd = jax.shard_map(
                    make_forward(carry),
                    mesh=self.mesh,
                    in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                              P(DATA_AXIS), P(DATA_AXIS)),
                    out_specs=P(DATA_AXIS),
                    # no cross-shard collectives in the eval forward; skip the
                    # varying-manner analysis (Pallas calls are opaque to it)
                    check_vma=False,
                )
                return jax.jit(
                    spmd,
                    in_shardings=(repl, data, data, data, data, data),
                    out_shardings=data,
                )

            self._jit_forward = jit_spmd
            # multi-host: every process holds the same host params and
            # contributes its addressable shards (parallel.mesh.replicate)
            self._n_proc = jax.process_count()
            if self._n_proc > 1:
                from multimodal_content_moderation_tpu.parallel.mesh import (
                    replicate,
                )

                self.params = replicate(params, self.mesh)
            else:
                self.params = jax.device_put(params, repl)

    def patches_from_hwc(self, images_hwc: np.ndarray) -> np.ndarray:
        """[B, H, W, C] uint8 crops -> wire-format patch rows."""
        return extract_patches_u8(images_hwc, self.patch_size)

    @property
    def _forward(self):
        """The plain (no-carry) jitted forward (kept for tools that time it
        directly, e.g. tools/bench_eval.py --decompose)."""
        return self._get_forward(None)

    def _get_forward(self, carry_pos: Optional[int]):
        fwd = self._forwards.get(carry_pos)
        if fwd is None:
            fwd = self._forwards[carry_pos] = self._jit_forward(carry_pos)
        return fwd

    def __call__(
        self, ids, mask, patches_u8, text_present, image_present,
        carry_pos: Optional[int] = None,
    ):
        """``carry_pos`` (int) marks the last ids/mask column as the SigLIP
        bucket carry slot: a PAD token evaluated at position ``carry_pos`` —
        the position the unbucketed run pools, i.e. full_text_width - 1.
        Only the bucketed eval/serving paths set it (bucket_batch_text
        returns it)."""
        if self.mesh is not None and ids.shape[0] % self._data_size:
            raise ValueError(
                f"batch size {ids.shape[0]} not divisible by the data axis "
                f"({self._data_size}); pick batch_size as a multiple (the "
                "eval loop pads the last batch, so any full batch works)"
            )
        if self.mesh is not None and self._n_proc > 1:
            # Multi-host streaming eval: every process computes the same
            # global host batch (the prep pipeline is deterministic) and
            # transfers only its own rows; shard_batch assembles the global
            # jax.Array from the per-host slices with no cross-host data
            # movement. Logits are allgathered back so every host returns
            # the full [B, C] array (the eval loop slices/reorders on host).
            from jax.experimental import multihost_utils

            from multimodal_content_moderation_tpu.parallel.mesh import (
                shard_batch,
            )

            B = ids.shape[0]
            lb = B // self._n_proc
            p = jax.process_index()
            sl = slice(p * lb, (p + 1) * lb)
            placed = shard_batch(
                {
                    "ids": np.asarray(ids)[sl],
                    "mask": np.asarray(mask)[sl],
                    "patches": np.asarray(patches_u8)[sl],
                    "tp": np.asarray(text_present)[sl],
                    "ip": np.asarray(image_present)[sl],
                },
                self.mesh,
            )
            out = self._get_forward(carry_pos)(
                self.params, placed["ids"], placed["mask"], placed["patches"],
                placed["tp"], placed["ip"],
            )
            return multihost_utils.process_allgather(out, tiled=True)
        return self._get_forward(carry_pos)(
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


def bucket_for(mask, ladder: Sequence[int], extra: int = 0) -> int:
    """Smallest ladder width covering the batch's longest row plus ``extra``
    reserved columns (the terminal rung is the full width, so this always
    succeeds). SigLIP bucketing passes ``extra=1`` for its carry slot."""
    L = int(np.asarray(mask).sum(axis=1).max(initial=1)) + extra
    for b in ladder:
        if b >= L:
            return b
    return ladder[-1]


def bucket_batch_text(
    ids: np.ndarray, mask: np.ndarray, b: int, backend: str
) -> Tuple[np.ndarray, np.ndarray, Optional[int]]:
    """Shrink a right-padded [B, T] ids/mask pair to bucket width ``b``;
    returns (ids_b, mask_b, carry_pos) where carry_pos is None (no carry
    slot) or the position id of the carry column (T-1, the position the
    unbucketed run pools).

    CLIP: plain truncation (causal text tower + first-EOS pooling makes
    columns past every row's EOS dead compute). SigLIP: b-1 real columns
    plus a carry column — the row's LAST column (always PAD, since
    ``bucket_for(extra=1)`` guarantees every row fits in b-1) with mask 0,
    evaluated at position T-1 via ``carry_pos`` (the model pools the last
    column; masked keys are inert at any width, so this is exact — see
    siglip_text_features). Contiguous copies: strided views can hit slow
    host->device transfer paths on some backends."""
    if b >= ids.shape[1]:
        return ids, mask, None
    if backend == "clip":
        return (
            np.ascontiguousarray(ids[:, :b]),
            np.ascontiguousarray(mask[:, :b]),
            None,
        )
    ids_b = np.concatenate([ids[:, : b - 1], ids[:, -1:]], axis=1)
    mask_b = np.concatenate(
        [mask[:, : b - 1], np.zeros((mask.shape[0], 1), mask.dtype)], axis=1
    )
    return ids_b, mask_b, ids.shape[1] - 1


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

    ``seq_buckets`` enables length-sorted bucketed evaluation: rows are
    visited in token-length order and each batch's
    ``input_ids``/``attention_mask`` are shrunk to the smallest bucket
    covering its longest row. EXACT for both backends, not approximate:

    - CLIP: the text tower is causal and pools the first-EOS hidden state
      (models/clip.py:clip_text_pooled), so positions past a row's EOS
      cannot influence its pooled feature — plain truncation.
    - SigLIP: bidirectional but masked — every PAD key carries exactly-zero
      attention weight, and the pooled LAST position (a PAD on right-padded
      input) is itself a masked key, so a bucket keeps b-1 real columns plus
      one carry column holding the PAD token at the encoder's final position
      (``bucket_batch_text`` / ``carry_last``).

    Dropping padding columns removes dead compute the reference always pays
    (it pads every row to the full context, scripts/inference.py:168-180).
    Each bucket is one extra XLA compile (static shapes; the persistent
    compile cache absorbs repeats).
    """
    from multimodal_content_moderation_tpu.data.pipeline import bounded_producer

    indices = None
    backend = engine.model.backend
    full_T = dataset.input_ids.shape[1]
    if seq_buckets and backend == "generic":
        # generic towers may mean-pool over ALL positions (pads included,
        # reference multitask.py:141) — truncating columns would change the
        # mean, so seq bucketing is exact only for clip/siglip pooling
        seq_buckets = None
    if seq_buckets:
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
            carry = None
            if indices is not None:
                b = bucket_for(
                    batch["attention_mask"], ladder,
                    extra=0 if backend == "clip" else 1,
                )
                ids_b, mask_b, carry = bucket_batch_text(
                    batch["input_ids"], batch["attention_mask"], b, backend
                )
                batch["input_ids"], batch["attention_mask"] = ids_b, mask_b
            yield valid, labels, batch, patches, carry

    q, _END, err, cancel = bounded_producer(prep, size=2)

    all_logits, all_labels, valids, outs = [], [], [], []
    try:
        while True:
            item = q.get()
            if item is _END:
                if err:
                    raise err[0]
                break
            valid, labels, batch, patches, carry = item
            valids.append(valid)
            all_labels.append(labels)
            outs.append(
                engine(
                    batch["input_ids"],
                    batch["attention_mask"],
                    patches,
                    batch["text_present"],
                    batch["image_present"],
                    carry_pos=carry,
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
