"""Orbax-backed checkpointing with best-metric retention.

Replaces the reference's HF-Trainer checkpoint behavior (save per epoch,
``save_total_limit=2``, ``load_best_model_at_end`` on ``roc_macro`` —
scripts/train.py:283-287) with explicit, async-friendly Orbax saves of the
parameter pytree.
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Any, List, Optional

import orbax.checkpoint as ocp


def _ckpt_dir(output_dir: str, step: int) -> str:
    return os.path.join(os.path.abspath(output_dir), f"checkpoint-{step}")


def list_checkpoints(output_dir: str) -> List[str]:
    if not os.path.isdir(output_dir):
        return []
    out = []
    for name in os.listdir(output_dir):
        if re.fullmatch(r"checkpoint-\d+", name):
            out.append(os.path.join(output_dir, name))
    return sorted(out, key=lambda p: int(p.rsplit("-", 1)[1]))


def save_checkpoint(
    output_dir: str,
    params: Any,
    step: int,
    save_total_limit: Optional[int] = None,
    keep: Optional[str] = None,
) -> str:
    """Save ``params`` at ``checkpoint-<step>``; prune oldest beyond the
    limit, never pruning ``keep`` (the best checkpoint)."""
    path = _ckpt_dir(output_dir, step)
    if os.path.exists(path):
        shutil.rmtree(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, params)
    if save_total_limit and save_total_limit > 0:
        existing = list_checkpoints(output_dir)
        prunable = [p for p in existing if keep is None or os.path.abspath(p) != os.path.abspath(keep)]
        while len(existing) > save_total_limit and prunable:
            victim = prunable.pop(0)
            existing.remove(victim)
            shutil.rmtree(victim, ignore_errors=True)
    return path


def restore_checkpoint(path: str, template: Any) -> Any:
    """Restore a pytree saved by ``save_checkpoint``. ``template`` provides
    structure/shapes/dtypes (e.g. from ``model.init``)."""
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), template)
