"""Evaluation metrics, threshold calibration, and detailed reports.

API- and numerics-compatible with the reference (src/training/metrics.py):
same metric names, same sklearn scorers, same calibration grid semantics.
These run on host numpy after device logits are gathered — metrics are not a
TPU bottleneck (a 10k x 5 sigmoid/F1 sweep is microseconds of CPU work).
"""

from __future__ import annotations

from typing import Callable, List, Optional

import numpy as np
from sklearn.metrics import f1_score, precision_score, recall_score, roc_auc_score


def sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def _f(value) -> float:
    """float() with NaN -> 0.0: newer sklearn returns NaN (instead of
    raising) for degenerate classes; the reference's except-path yields 0.0,
    so NaN is normalized to keep the artifact contract identical."""
    v = float(value)
    return 0.0 if np.isnan(v) else v


def make_compute_metrics_multi(num_labels: int, threshold: float = 0.5) -> Callable:
    """Multi-label: f1_macro/f1_micro at threshold + roc_macro
    (reference metrics.py:10-55)."""

    def compute_metrics(eval_pred):
        logits, labels = eval_pred
        logits = np.asarray(logits)
        labels = np.asarray(labels)
        probs = sigmoid(logits)

        try:
            bin_preds = (probs >= threshold).astype(int)
            f1_macro = float(f1_score(labels, bin_preds, average="macro", zero_division=0))
            f1_micro = float(f1_score(labels, bin_preds, average="micro", zero_division=0))
        except Exception:
            f1_macro = f1_micro = 0.0

        try:
            if num_labels == 1:
                roc_macro = _f(roc_auc_score(labels, probs))
            else:
                roc_macro = _f(roc_auc_score(labels, probs, average="macro"))
        except Exception:
            roc_macro = 0.0

        return {"f1_macro": f1_macro, "f1_micro": f1_micro, "roc_macro": roc_macro}

    return compute_metrics


def make_compute_metrics_mtl(task_names: List[str], threshold: float = 0.5) -> Callable:
    """MTL: aggregate + per-task f1_<name>/roc_<name>
    (reference metrics.py:58-113)."""

    def compute_metrics(eval_pred):
        logits, labels = eval_pred
        logits = np.asarray(logits)
        labels = np.asarray(labels)
        probs = sigmoid(logits)
        bin_preds = (probs >= threshold).astype(int)

        try:
            f1_macro = f1_score(labels, bin_preds, average="macro", zero_division=0)
            f1_micro = f1_score(labels, bin_preds, average="micro", zero_division=0)
        except Exception:
            f1_macro = f1_micro = 0.0
        try:
            roc_macro = roc_auc_score(labels, probs, average="macro")
        except Exception:
            roc_macro = 0.0

        out = {
            "f1_macro": float(f1_macro),
            "f1_micro": float(f1_micro),
            "roc_macro": _f(roc_macro),
        }
        for j, name in enumerate(task_names):
            try:
                f1j = f1_score(labels[:, j], bin_preds[:, j], average="binary", zero_division=0)
            except Exception:
                f1j = 0.0
            try:
                rocj = roc_auc_score(labels[:, j], probs[:, j])
            except Exception:
                rocj = 0.0
            out[f"f1_{name}"] = float(f1j)
            out[f"roc_{name}"] = _f(rocj)
        return out

    return compute_metrics


def calibrate_thresholds(
    probs: np.ndarray,
    y_true: np.ndarray,
    t_start: float = 0.05,
    t_end: float = 0.95,
    steps: int = 19,
) -> List[float]:
    """Per-class F1-maximizing threshold grid search
    (reference metrics.py:116-161; classes without positives get 0.5)."""
    grid = np.linspace(t_start, t_end, steps)
    C = probs.shape[1]
    best_thresholds: List[float] = []
    for j in range(C):
        yj = y_true[:, j]
        if yj.sum() == 0:
            best_thresholds.append(0.5)
            continue
        pj = probs[:, j]
        best_t, best_f1 = 0.5, -1.0
        for t in grid:
            f1 = f1_score(yj, (pj >= t).astype(int), zero_division=0)
            if f1 > best_f1:
                best_f1, best_t = f1, t
        best_thresholds.append(float(best_t))
    return best_thresholds


def compute_detailed_metrics(
    probs: np.ndarray,
    y_true: np.ndarray,
    threshold: float = 0.5,
    class_names: Optional[List[str]] = None,
) -> dict:
    """Full report incl. precision/recall/support and per-class ROC
    (reference metrics.py:164-215)."""
    bin_preds = (probs >= threshold).astype(int)
    n_classes = probs.shape[1]
    if class_names is None:
        class_names = [f"class_{i}" for i in range(n_classes)]

    metrics = {
        "f1_macro": float(f1_score(y_true, bin_preds, average="macro", zero_division=0)),
        "f1_micro": float(f1_score(y_true, bin_preds, average="micro", zero_division=0)),
        "precision_macro": float(
            precision_score(y_true, bin_preds, average="macro", zero_division=0)
        ),
        "recall_macro": float(
            recall_score(y_true, bin_preds, average="macro", zero_division=0)
        ),
    }
    try:
        metrics["roc_auc_macro"] = _f(roc_auc_score(y_true, probs, average="macro"))
    except ValueError:
        metrics["roc_auc_macro"] = 0.0

    metrics["per_class"] = {}
    for j, name in enumerate(class_names):
        cm = {
            "f1": float(f1_score(y_true[:, j], bin_preds[:, j], zero_division=0)),
            "precision": float(
                precision_score(y_true[:, j], bin_preds[:, j], zero_division=0)
            ),
            "recall": float(recall_score(y_true[:, j], bin_preds[:, j], zero_division=0)),
            "support": int(y_true[:, j].sum()),
        }
        try:
            cm["roc_auc"] = _f(roc_auc_score(y_true[:, j], probs[:, j]))
        except ValueError:
            cm["roc_auc"] = 0.0
        metrics["per_class"][name] = cm
    return metrics
