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


# --- full train-state (resume) ---------------------------------------------
#
# The reference relied on HF Trainer checkpoints but never wired
# ``resume_from_checkpoint`` (SURVEY.md §5). Here resume is first-class:
# params + optimizer state + PRNG key + loop counters round-trip through one
# Orbax directory (``trainstate-<step>``), so a preempted TPU job continues
# exactly where it stopped.


import json

import jax
import jax.numpy as jnp


def _state_dir(output_dir: str, step: int) -> str:
    return os.path.join(os.path.abspath(output_dir), f"trainstate-{step}")


def save_train_state(
    output_dir: str,
    step: int,
    params: Any,
    opt_state: Any,
    rng: Any,
    meta: dict,
    keep_last: int = 1,
) -> str:
    path = _state_dir(output_dir, step)
    if os.path.exists(path):
        shutil.rmtree(path)
    tree = {
        "params": params,
        "opt_state": opt_state,
        "rng_data": jax.random.key_data(rng),
    }
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)
    # prune older train states
    states = sorted(
        (
            p
            for p in os.listdir(output_dir)
            if re.fullmatch(r"trainstate-\d+", p)
        ),
        key=lambda p: int(p.rsplit("-", 1)[1]),
    )
    for victim in states[:-keep_last]:
        shutil.rmtree(os.path.join(output_dir, victim), ignore_errors=True)
    return path


def latest_train_state(output_dir: str) -> Optional[str]:
    if not os.path.isdir(output_dir):
        return None
    states = sorted(
        (
            p
            for p in os.listdir(output_dir)
            if re.fullmatch(r"trainstate-\d+", p)
        ),
        key=lambda p: int(p.rsplit("-", 1)[1]),
    )
    return os.path.join(output_dir, states[-1]) if states else None


def restore_train_state(path: str, params_tpl: Any, opt_tpl: Any, rng_tpl: Any):
    """-> (params, opt_state, rng, meta)."""
    tree_tpl = {
        "params": params_tpl,
        "opt_state": opt_tpl,
        "rng_data": jax.random.key_data(rng_tpl),
    }
    with ocp.StandardCheckpointer() as ckptr:
        tree = ckptr.restore(os.path.abspath(path), tree_tpl)
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    rng = jax.random.wrap_key_data(jnp.asarray(tree["rng_data"]))
    return tree["params"], tree["opt_state"], rng, meta
