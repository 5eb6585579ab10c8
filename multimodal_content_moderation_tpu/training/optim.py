"""Optimizer construction: two-group AdamW + cosine schedule with warmup.

Improves on the reference, where the two-LR config knobs were cosmetic
(``group_params_for_optimizer`` was imported but never called —
scripts/train.py:49 vs :273, so everything trained at ``lr_head``). Here
``lr_encoder``/``lr_head`` are real: parameters under the ``backbone`` subtree
get the encoder LR, everything else the head LR, via ``optax.multi_transform``.
Set ``lr_encoder == lr_head`` to reproduce the reference's actual behavior.
"""

from __future__ import annotations

from typing import Any

import jax
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
) -> optax.GradientTransformation:
    """AdamW with per-group LRs, global-norm clipping, warmup + cosine decay
    (matching the reference TrainingArguments defaults — scripts/train.py:
    266-292 and config/default.yaml:48-57)."""
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
        return optax.adamw(
            make_schedule(peak), b1=b1, b2=b2, eps=eps, weight_decay=weight_decay
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
