"""Optimizer construction: two-group AdamW + cosine schedule with warmup.

Improves on the reference, where the two-LR config knobs were cosmetic
(``group_params_for_optimizer`` was imported but never called —
scripts/train.py:49 vs :273, so everything trained at ``lr_head``). Here
``lr_encoder``/``lr_head`` are real: parameters under the ``backbone`` subtree
get the encoder LR, everything else the head LR, via ``optax.multi_transform``.
Set ``lr_encoder == lr_head`` to reproduce the reference's actual behavior.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax


def _label_tree(
    params: Any, freeze_text: bool = False, freeze_image: bool = False
) -> Any:
    """Label leaves 'encoder'/'head'/'frozen'.

    Freezing matches the reference semantics (src/models/fusion.py:104-108,
    multitask.py:63-80): only the text/vision towers freeze; projection
    matrices and heads always train.
    """

    def label_subtree(name, subtree):
        if name == "backbone":
            out = {}
            for sub, tree in subtree.items():
                if (freeze_text and sub == "text_model") or (
                    freeze_image and sub == "vision_model"
                ):
                    lab = "frozen"
                else:
                    lab = "encoder"
                out[sub] = jax.tree_util.tree_map(lambda _: lab, tree)
            return out
        return jax.tree_util.tree_map(lambda _: "head", subtree)

    return {k: label_subtree(k, v) for k, v in params.items()}


def scale_by_adam_compact(
    b1: float, b2: float, eps: float, state_dtype
) -> optax.GradientTransformation:
    """Adam moment tracking with BOTH accumulators stored in ``state_dtype``
    (bf16 halves the optimizer's HBM traffic — the AdamW update is
    bandwidth-bound at ~7 ms of the 99 ms flagship train step; see
    docs/PERFORMANCE.md). All arithmetic runs in fp32; only the carried
    m/v state is rounded. optax's ``mu_dtype`` covers the first moment
    only, hence this transform.

    bf16 rounding on ``nu`` perturbs the effective per-parameter step by
    up to ~2^-9 relative — gate behind the locked-mode quality-parity
    harness (tools/quality_parity.py) before enabling for a production run.
    """
    dt = jnp.dtype(state_dtype)

    def init(params):
        zeros = lambda p: jnp.zeros_like(p, dtype=dt)
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(zeros, params),
            nu=jax.tree_util.tree_map(zeros, params),
        )

    def update(updates, state, params=None):
        del params
        f32 = jnp.float32
        mu = jax.tree_util.tree_map(
            lambda g, m: b1 * m.astype(f32) + (1 - b1) * g.astype(f32),
            updates, state.mu,
        )
        nu = jax.tree_util.tree_map(
            lambda g, v: b2 * v.astype(f32) + (1 - b2) * jnp.square(g.astype(f32)),
            updates, state.nu,
        )
        count = optax.safe_increment(state.count)
        bc1 = 1 - b1 ** count.astype(f32)
        bc2 = 1 - b2 ** count.astype(f32)
        out = jax.tree_util.tree_map(
            lambda m, v: (m / bc1) / (jnp.sqrt(v / bc2) + eps), mu, nu
        )
        to_state = lambda t: jax.tree_util.tree_map(lambda x: x.astype(dt), t)
        return out, optax.ScaleByAdamState(
            count=count, mu=to_state(mu), nu=to_state(nu)
        )

    return optax.GradientTransformation(init, update)


def build_optimizer(
    params: Any,
    lr_encoder: float = 1e-5,
    lr_head: float = 5e-4,
    weight_decay: float = 0.02,
    max_grad_norm: float = 1.0,
    total_steps: int = 1000,
    warmup_ratio: float = 0.05,
    schedule: str = "cosine",
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    freeze_text: bool = False,
    freeze_image: bool = False,
    accumulator_dtype: Optional[str] = None,
) -> optax.GradientTransformation:
    """AdamW with per-group LRs, global-norm clipping, warmup + cosine decay
    (matching the reference TrainingArguments defaults — scripts/train.py:
    266-292 and config/default.yaml:48-57).

    ``accumulator_dtype="bfloat16"`` stores the Adam m/v state in bf16
    (``scale_by_adam_compact``) — halves optimizer HBM traffic at the cost
    of bf16 rounding on the moments; ``None`` keeps fp32 (strict parity)."""
    warmup_steps = max(int(total_steps * warmup_ratio), 0)

    def make_schedule(peak: float) -> optax.Schedule:
        if schedule == "constant":
            return optax.constant_schedule(peak)
        decay_steps = max(total_steps - warmup_steps, 1)
        if schedule == "linear":
            down = optax.linear_schedule(peak, 0.0, decay_steps)
        else:
            down = optax.cosine_decay_schedule(peak, decay_steps)
        if warmup_steps == 0:
            return down
        return optax.join_schedules(
            [optax.linear_schedule(0.0, peak, warmup_steps), down], [warmup_steps]
        )

    def group(peak: float) -> optax.GradientTransformation:
        if accumulator_dtype is None:
            return optax.adamw(
                make_schedule(peak), b1=b1, b2=b2, eps=eps,
                weight_decay=weight_decay,
            )
        return optax.chain(
            scale_by_adam_compact(b1, b2, eps, accumulator_dtype),
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_learning_rate(make_schedule(peak)),
        )

    tx = optax.multi_transform(
        {
            "encoder": group(lr_encoder),
            "head": group(lr_head),
            "frozen": optax.set_to_zero(),
        },
        _label_tree(params, freeze_text, freeze_image),
    )
    if max_grad_norm and max_grad_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
    return tx
