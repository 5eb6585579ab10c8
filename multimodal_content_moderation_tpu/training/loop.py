"""pjit fine-tuning loop and streaming evaluation.

TPU-native replacement for the reference's delegation to
``transformers.Trainer`` (src/training/trainer.py, scripts/train.py:308-327):

- one jitted ``train_step`` (forward + backward + optax update) compiled over
  a ("data", "model") mesh; batches are sharded over the data axis, params
  replicated, and XLA inserts the gradient all-reduce over ICI
- fixed-shape batches everywhere (final eval batch is padded + masked) so
  nothing ever recompiles
- epoch-driven: per-epoch eval, metric_for_best tracking, early stopping,
  Orbax checkpoints with save_total_limit, load-best-at-end
- weighted sampling via index arrays (training/sampling.py)
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from multimodal_content_moderation_tpu.parallel.mesh import (
    build_mesh,
    place_like,
    replicate,
)
from multimodal_content_moderation_tpu.parallel.sharding import shard_params
from multimodal_content_moderation_tpu.training import checkpoints as ckpt_lib
from multimodal_content_moderation_tpu.training.optim import build_optimizer
from multimodal_content_moderation_tpu.training.sampling import (
    build_multilabel_sample_weights,
    weighted_sample_indices,
)

logger = logging.getLogger(__name__)

BATCH_KEYS = (
    "input_ids",
    "attention_mask",
    "pixel_values",
    "text_present",
    "image_present",
    "labels",
)


@dataclasses.dataclass
class TrainArgs:
    """Training-loop hyperparameters (same knobs/defaults as the reference
    TrainingArguments construction, scripts/train.py:266-292)."""

    output_dir: str = "runs/experiment"
    num_train_epochs: int = 8
    max_steps: int = -1
    per_device_train_batch_size: int = 32
    per_device_eval_batch_size: int = 64
    gradient_accumulation_steps: int = 1
    lr_encoder: float = 1e-5
    lr_head: float = 5e-4
    weight_decay: float = 0.02
    warmup_ratio: float = 0.05
    max_grad_norm: float = 1.0
    lr_scheduler_type: str = "cosine"
    sampler: str = "random"  # "random" | "weighted"
    logging_steps: int = 50
    save_total_limit: int = 2
    load_best_model_at_end: bool = True
    metric_for_best_model: str = "roc_macro"
    greater_is_better: bool = True
    early_stopping: bool = True
    early_stopping_patience: int = 3
    seed: int = 42
    num_workers: int = 8
    freeze_text: bool = False
    freeze_image: bool = False
    report_to: str = "none"  # "none" | "tensorboard"
    logging_dir: str = ""
    debug_nans: bool = False
    resume_from_checkpoint: str = ""  # "" | "auto" | explicit trainstate dir
    prefetch: int = 2
    # "f32": normalized fp32 NCHW pixels (parity path). "u8": raw uint8 patch
    # rows on the wire, normalize folded into the patch embed on device
    # (4x fewer host->HBM bytes; requires a uint8_hwc train preprocessor and
    # a model with image_mean/image_std set — models/u8wire.py).
    wire: str = "f32"
    # "" keeps fp32 Adam m/v (parity); "bfloat16" halves optimizer HBM
    # traffic (training/optim.scale_by_adam_compact) — validate with the
    # quality-parity harness before production use.
    accumulator_dtype: str = ""


def enforce_gspmd_safe_kernels(model, mesh):
    """Swap Mosaic (Pallas) kernels for their XLA impls when the model will
    run under a multi-device GSPMD ``jit``.

    Mosaic kernels carry no GSPMD partitioning rule — ``pallas_call`` rejects
    sharded operands outright ("requires all mesh axes to be Manual"), and
    under auto sharding the partitioner would have to all-gather the operands,
    silently replicating what the mesh was supposed to shard. The supported
    multi-device composition is ``jax.shard_map`` with per-device kernel
    calls, which the fast inference engine uses (models/fast_infer.py); the
    GSPMD train/eval steps instead fall back to the XLA attention/embed
    impls, which the partitioner handles natively. Single-device meshes (the
    benched configuration) keep the Pallas kernels.

    Returns the (possibly replaced) model; logs when a fallback engages.
    """
    if mesh is None or mesh.devices.size == 1:
        return model
    from multimodal_content_moderation_tpu.models import model_io

    if model.backend == "clip":
        cfg = model.clip_config
    elif model.backend == "generic":
        cfg = model.generic_config
    else:
        cfg = model.siglip_config
    if "pallas" in (cfg.text.attention_impl, cfg.vision.attention_impl):
        logger.warning(
            "attention_impl='pallas' is not GSPMD-partitionable; falling "
            "back to the XLA attention for the %d-device mesh (shard_map "
            "keeps Pallas on the fast inference engine)",
            mesh.devices.size,
        )
        model = model_io.with_performance_options(model, attention_impl="xla")
    if getattr(model, "embed_impl", "reference") == "pallas":
        logger.warning(
            "embed_impl='pallas' is not GSPMD-partitionable; falling back "
            "to the reference patch embed for the %d-device mesh",
            mesh.devices.size,
        )
        model = dataclasses.replace(model, embed_impl="reference")
    return model


def make_train_step(model, tx, pos_weight: Optional[np.ndarray] = None) -> Callable:
    """Build the jitted DP train step: (params, opt_state, rng, batch) ->
    (params, opt_state, rng, loss)."""
    pw = None if pos_weight is None else jnp.asarray(pos_weight, jnp.float32)

    def loss_fn(params, batch, rng):
        out = model.apply(params, batch, dropout_rng=rng, pos_weight=pw)
        return out["loss"]

    import functools

    # Donating params/opt_state lets XLA update the 1.8GB of training state
    # in place; without it every queued step allocates fresh buffers and the
    # dispatch queue can exhaust HBM (measured: 8s/step -> fixed by donation).
    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step(params, opt_state, rng, batch):
        rng, step_rng = jax.random.split(rng)
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, step_rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, rng, loss

    return train_step


def make_eval_step(model) -> Callable:
    @jax.jit
    def eval_step(params, batch):
        return model.apply(params, batch)["logits"]

    return eval_step


def evaluate_logits(
    eval_step: Callable,
    params: Any,
    dataset,
    batch_size: int,
    mesh,
    num_workers: int = 8,
) -> Tuple[np.ndarray, np.ndarray]:
    """Stream the dataset through the jitted eval step; returns (logits,
    labels) host arrays. Last batch padded to keep shapes static; pads are
    trimmed on host."""
    from multimodal_content_moderation_tpu.data.pipeline import prefetch_to_device

    all_logits, all_labels, valids = [], [], []
    outs = []

    def host_batches():
        for batch in dataset.batches(
            batch_size, pad_to_batch=True, num_workers=num_workers
        ):
            valids.append(int(batch.pop("_valid")))
            all_labels.append(batch.pop("labels")[: valids[-1]])
            yield batch

    # async dispatch: keep a bounded number of device batches in flight
    for dev in prefetch_to_device(host_batches(), mesh):
        outs.append(eval_step(params, dev))
        if len(outs) > 2:
            all_logits.append(np.asarray(outs.pop(0)))
    all_logits.extend(np.asarray(o) for o in outs)
    all_logits = [lg[:v] for lg, v in zip(all_logits, valids)]
    return np.concatenate(all_logits), np.concatenate(all_labels)


class Trainer:
    """Epoch-driven fine-tuning with eval/checkpoint/early-stop plumbing."""

    def __init__(
        self,
        model,
        params: Any,
        args: TrainArgs,
        train_dataset,
        eval_dataset,
        compute_metrics: Callable,
        mesh=None,
        pos_weight: Optional[np.ndarray] = None,
    ):
        self.args = args
        self.train_ds = train_dataset
        self.eval_ds = eval_dataset
        self.compute_metrics = compute_metrics
        self.mesh = mesh if mesh is not None else build_mesh()
        self.model = enforce_gspmd_safe_kernels(model, self.mesh)
        self.pos_weight = pos_weight

        n_batches = max(len(train_dataset) // args.per_device_train_batch_size, 1)
        self.steps_per_epoch = n_batches
        total = (
            args.max_steps
            if args.max_steps > 0
            else n_batches * args.num_train_epochs
        )
        self.total_steps = total

        accum = max(args.gradient_accumulation_steps, 1)
        self.tx = build_optimizer(
            params,
            lr_encoder=args.lr_encoder,
            lr_head=args.lr_head,
            weight_decay=args.weight_decay,
            max_grad_norm=args.max_grad_norm,
            total_steps=-(-total // accum),  # optimizer steps after accumulation
            warmup_ratio=args.warmup_ratio,
            schedule=args.lr_scheduler_type,
            freeze_text=args.freeze_text,
            freeze_image=args.freeze_image,
            accumulator_dtype=args.accumulator_dtype or None,
        )
        if accum > 1:
            self.tx = optax.MultiSteps(self.tx, every_k_schedule=accum)
        # Tensor parallelism: params placed by the semantic sharding rules
        # (parallel/sharding.py). With a model axis of 1 this is replication.
        self.params = shard_params(params, self.mesh)
        # optax init builds moments via zeros_like, which inherits each
        # param leaf's sharding — the optimizer state is TP-sharded too.
        self.opt_state = self.tx.init(self.params)
        self.rng = jax.random.key(args.seed)

        self.train_step = make_train_step(self.model, self.tx, pos_weight)
        self.eval_step = make_eval_step(self.model)

        self.best_metric: Optional[float] = None
        self.best_checkpoint: Optional[str] = None
        self.state_log: list = []
        self.start_epoch = 0
        self._start_step = 0

        if args.debug_nans:
            from multimodal_content_moderation_tpu.utils.profiling import (
                enable_nan_checks,
            )

            enable_nan_checks()

        self.writer = None
        if args.report_to == "tensorboard":
            from multimodal_content_moderation_tpu.utils.events import EventWriter

            self.writer = EventWriter(
                args.logging_dir or f"{args.output_dir}/logs"
            )

        if args.resume_from_checkpoint:
            self._maybe_resume(args.resume_from_checkpoint)

    def _maybe_resume(self, spec: str) -> None:
        path = (
            ckpt_lib.latest_train_state(self.args.output_dir)
            if spec == "auto"
            else spec
        )
        if not path:
            return
        p_tpl, o_tpl = self.params, self.opt_state
        self.params, self.opt_state, self.rng, meta = ckpt_lib.restore_train_state(
            path, self.params, self.opt_state, self.rng
        )
        # Orbax restores to single-device arrays; re-place on the mesh with
        # the shardings the live state had (replicated or TP-sharded).
        self.params = place_like(self.params, p_tpl, self.mesh)
        self.opt_state = place_like(self.opt_state, o_tpl, self.mesh)
        self.rng = replicate(self.rng, self.mesh)
        self.start_epoch = int(meta.get("epoch", 0))
        self._start_step = int(meta.get("step", 0))
        self.best_metric = meta.get("best_metric")
        self.best_checkpoint = meta.get("best_checkpoint")
        logger.info("resumed from %s (epoch %d, step %d)", path, self.start_epoch, self._start_step)

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        n = len(self.train_ds)
        if self.args.sampler == "weighted":
            w = build_multilabel_sample_weights(self.train_ds.labels)
            return weighted_sample_indices(w, n, seed=self.args.seed + epoch)
        order = np.arange(n)
        np.random.default_rng(self.args.seed + epoch).shuffle(order)
        return order

    def evaluate(self, dataset=None) -> Dict[str, float]:
        dataset = dataset if dataset is not None else self.eval_ds
        t0 = time.time()
        logits, labels = evaluate_logits(
            self.eval_step,
            self.params,
            dataset,
            self.args.per_device_eval_batch_size,
            self.mesh,
            self.args.num_workers,
        )
        metrics = self.compute_metrics((logits, labels))
        dt = time.time() - t0
        # schema parity with the reference's trainer.evaluate output
        # (runs/*/test_metrics.json carries test_loss/test_runtime/... keys)
        from multimodal_content_moderation_tpu.ops.losses import bce_with_logits

        metrics["loss"] = float(bce_with_logits(logits, labels))
        metrics["runtime"] = dt
        metrics["samples_per_second"] = len(dataset) / dt if dt > 0 else 0.0
        return metrics

    def predict(self, dataset) -> Tuple[np.ndarray, np.ndarray]:
        return evaluate_logits(
            self.eval_step,
            self.params,
            dataset,
            self.args.per_device_eval_batch_size,
            self.mesh,
            self.args.num_workers,
        )

    def _is_better(self, value: float) -> bool:
        if self.best_metric is None:
            return True
        if self.args.greater_is_better:
            return value > self.best_metric
        return value < self.best_metric

    def train(self) -> Dict[str, Any]:
        from multimodal_content_moderation_tpu.data.pipeline import prefetch_to_device

        args = self.args
        step = self._start_step
        epochs_without_improvement = 0
        history = []
        t_start = time.time()

        patch_size = None
        if args.wire == "u8":
            vcfg = (
                self.model.clip_config.vision
                if self.model.backend == "clip"
                else self.model.siglip_config.vision
            )
            patch_size = vcfg.patch_size

        from multimodal_content_moderation_tpu.utils.profiling import StepTimer

        timer = StepTimer(warmup=1)

        for epoch in range(self.start_epoch, args.num_train_epochs):
            # the eval/checkpoint pause between epochs is not a train step
            timer.reset_clock()
            indices = self._epoch_indices(epoch)
            losses = []

            def host_batches():
                from multimodal_content_moderation_tpu.ops.pallas_image import (
                    extract_patches_u8,
                )

                for batch in self.train_ds.batches(
                    args.per_device_train_batch_size,
                    drop_last=True,
                    indices=indices,
                    num_workers=args.num_workers,
                ):
                    b = {k: batch[k] for k in BATCH_KEYS if k in batch}
                    if patch_size is not None:
                        # u8 wire: HWC uint8 crops -> patch rows on the host
                        # (pure reshape); the device folds normalize into the
                        # patch-embed GEMM
                        b["patches_u8"] = extract_patches_u8(
                            b.pop("pixel_values"), patch_size
                        )
                    yield b

            for dev in prefetch_to_device(
                host_batches(), self.mesh, size=args.prefetch
            ):
                self.params, self.opt_state, self.rng, loss = self.train_step(
                    self.params, self.opt_state, self.rng, dev
                )
                step += 1
                timer.tick()
                if step % args.logging_steps == 0:
                    loss_val = float(loss)
                    losses.append(loss_val)
                    sps = timer.samples_per_second(
                        args.per_device_train_batch_size
                    )
                    logger.info(
                        "step %d/%d loss %.4f (%.1f samples/s, %.0f ms/step)",
                        step, self.total_steps, loss_val, sps,
                        timer.mean_step_seconds * 1000,
                    )
                    if self.writer:
                        self.writer.scalar("train/loss", loss_val, step)
                        self.writer.scalar("train/samples_per_second", sps, step)
                if 0 < args.max_steps <= step:
                    break

            metrics = self.evaluate()
            metrics["epoch"] = epoch + 1
            metrics["train_loss"] = float(np.mean(losses)) if losses else float(loss)
            history.append(metrics)
            logger.info("epoch %d eval: %s", epoch + 1, metrics)
            if self.writer:
                for k, v in metrics.items():
                    if isinstance(v, (int, float)):
                        self.writer.scalar(f"eval/{k}", v, step)
                self.writer.flush()

            ckpt_path = ckpt_lib.save_checkpoint(
                args.output_dir,
                self.params,
                step,
                save_total_limit=args.save_total_limit,
                keep=self.best_checkpoint,
            )
            key = args.metric_for_best_model
            value = metrics.get(key)
            if value is not None and self._is_better(value):
                self.best_metric = value
                self.best_checkpoint = ckpt_path
                epochs_without_improvement = 0
            else:
                epochs_without_improvement += 1

            ckpt_lib.save_train_state(
                args.output_dir,
                step,
                self.params,
                self.opt_state,
                self.rng,
                meta={
                    "epoch": epoch + 1,
                    "step": step,
                    "best_metric": self.best_metric,
                    "best_checkpoint": self.best_checkpoint,
                },
            )

            if (
                args.early_stopping
                and epochs_without_improvement >= args.early_stopping_patience
            ):
                logger.info("early stopping at epoch %d", epoch + 1)
                break
            if 0 < args.max_steps <= step:
                break

        if args.load_best_model_at_end and self.best_checkpoint:
            p_tpl = self.params
            self.params = place_like(
                ckpt_lib.restore_checkpoint(self.best_checkpoint, self.params),
                p_tpl,
                self.mesh,
            )

        return {
            "history": history,
            "best_metric": self.best_metric,
            "best_checkpoint": self.best_checkpoint,
            "train_runtime": time.time() - t_start,
            # HF-Trainer-style rolling throughput (steady-state, warmup skipped)
            "train_samples_per_second": timer.samples_per_second(
                args.per_device_train_batch_size
            ),
            "global_step": step,
        }
