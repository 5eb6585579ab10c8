"""Loss functions as pure jnp functions (jit/vjp-friendly).

Numerics match the torch implementations in the reference exactly:
- ``bce_with_logits``: torch ``F.binary_cross_entropy_with_logits`` incl.
  ``pos_weight`` (used in reference src/models/fusion.py:224-227 and
  multitask.py:215-217).
- ``focal_with_logits``: reference ``FocalWithLogitsLoss``
  (src/training/losses.py:11-77, duplicated in src/models/fusion.py:16-52).
- ``asymmetric_loss``: reference ``AsymmetricLoss``
  (src/training/losses.py:80-146).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _reduce(loss: jnp.ndarray, reduction: str) -> jnp.ndarray:
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


def bce_with_logits(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    pos_weight: Optional[jnp.ndarray] = None,
    reduction: str = "mean",
) -> jnp.ndarray:
    """Numerically-stable sigmoid BCE with optional per-class pos_weight.

    Matches torch: ``-[pw*y*log(sigmoid(x)) + (1-y)*log(sigmoid(-x))]``.
    """
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    pw = jnp.ones_like(targets) if pos_weight is None else jnp.broadcast_to(
        jnp.asarray(pos_weight, jnp.float32), targets.shape
    )
    loss = -(pw * targets * log_p + (1.0 - targets) * log_not_p)
    return _reduce(loss, reduction)


def focal_with_logits(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    gamma: float = 1.5,
    alpha: Optional[jnp.ndarray] = None,
    reduction: str = "mean",
) -> jnp.ndarray:
    """Sigmoid focal loss (Lin et al. 2017), optional per-class alpha."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    prob = jax.nn.sigmoid(logits)
    ce = bce_with_logits(logits, targets, reduction="none")
    p_t = prob * targets + (1.0 - prob) * (1.0 - targets)
    loss = ce * jnp.power(1.0 - p_t, gamma)
    if alpha is not None:
        a = jnp.asarray(alpha, jnp.float32)
        loss = loss * (a * targets + (1.0 - a) * (1.0 - targets))
    return _reduce(loss, reduction)


def asymmetric_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    gamma_neg: float = 4.0,
    gamma_pos: float = 1.0,
    clip: float = 0.05,
    reduction: str = "mean",
) -> jnp.ndarray:
    """Asymmetric multi-label loss (Ridnik et al. 2021)."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    prob = jax.nn.sigmoid(logits)
    prob_neg = jnp.clip(prob + clip, a_max=1.0)

    loss_pos = targets * jnp.log(jnp.clip(prob, a_min=1e-8))
    loss_neg = (1.0 - targets) * jnp.log(jnp.clip(1.0 - prob_neg, a_min=1e-8))

    pt_pos = prob * targets + (1.0 - prob) * (1.0 - targets)
    pt_neg = prob_neg * targets + (1.0 - prob_neg) * (1.0 - targets)
    focal_pos = jnp.power(1.0 - pt_pos, gamma_pos)
    focal_neg = jnp.power(1.0 - pt_neg, gamma_neg)

    loss = -(focal_pos * loss_pos + focal_neg * loss_neg)
    return _reduce(loss, reduction)


def logit_adjust(logits, priors, tau: float = 1.0):
    """Post-hoc logit adjustment for class imbalance (Menon et al. 2021,
    multi-label sigmoid form): subtract ``tau * log(p/(1-p))`` per class.

    The reference declared a ``use_logit_adjustment`` flag and class priors
    in inference_config.json but never consumed them (scripts/train.py:364 —
    dead like its lr_encoder knob); here the flag is real and opt-in, applied
    by the inference/evaluate paths when the config sets it."""
    import numpy as np

    p = np.clip(np.asarray(priors, np.float32), 1e-6, 1.0 - 1e-6)
    return logits - tau * np.log(p / (1.0 - p))
