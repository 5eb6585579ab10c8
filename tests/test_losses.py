"""Loss parity vs torch reference formulations."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F

from multimodal_content_moderation_tpu.ops.losses import (
    asymmetric_loss,
    bce_with_logits,
    focal_with_logits,
)


@pytest.fixture()
def data():
    g = np.random.default_rng(0)
    logits = (g.normal(size=(16, 5)) * 3).astype(np.float32)
    labels = (g.random(size=(16, 5)) < 0.25).astype(np.float32)
    return logits, labels


def test_bce_plain(data):
    logits, labels = data
    ref = F.binary_cross_entropy_with_logits(torch.tensor(logits), torch.tensor(labels))
    got = float(bce_with_logits(logits, labels))
    assert abs(got - float(ref)) < 1e-6


def test_bce_pos_weight(data):
    logits, labels = data
    pw = np.array([0.5, 1.0, 2.0, 5.0, 10.0], dtype=np.float32)
    ref = F.binary_cross_entropy_with_logits(
        torch.tensor(logits), torch.tensor(labels), pos_weight=torch.tensor(pw)
    )
    got = float(bce_with_logits(logits, labels, pos_weight=pw))
    assert abs(got - float(ref)) < 1e-6


def test_bce_extreme_logits():
    logits = np.array([[-80.0, 80.0, 0.0]], dtype=np.float32)
    labels = np.array([[1.0, 0.0, 1.0]], dtype=np.float32)
    got = float(bce_with_logits(logits, labels))
    ref = F.binary_cross_entropy_with_logits(torch.tensor(logits), torch.tensor(labels))
    assert np.isfinite(got)
    assert abs(got - float(ref)) < 1e-4


def test_focal(data):
    logits, labels = data
    lt, yt = torch.tensor(logits), torch.tensor(labels)
    prob = torch.sigmoid(lt)
    ce = F.binary_cross_entropy_with_logits(lt, yt, reduction="none")
    p_t = prob * yt + (1 - prob) * (1 - yt)
    ref = float((ce * (1 - p_t) ** 1.5).mean())
    got = float(focal_with_logits(logits, labels, gamma=1.5))
    assert abs(got - ref) < 1e-6


def test_focal_alpha(data):
    logits, labels = data
    alpha = np.array([0.25, 0.5, 0.75, 0.9, 0.1], dtype=np.float32)
    lt, yt, at = torch.tensor(logits), torch.tensor(labels), torch.tensor(alpha)
    prob = torch.sigmoid(lt)
    ce = F.binary_cross_entropy_with_logits(lt, yt, reduction="none")
    p_t = prob * yt + (1 - prob) * (1 - yt)
    loss = ce * (1 - p_t) ** 2.0
    loss = loss * (at * yt + (1 - at) * (1 - yt))
    ref = float(loss.mean())
    got = float(focal_with_logits(logits, labels, gamma=2.0, alpha=alpha))
    assert abs(got - ref) < 1e-6


def test_asymmetric(data):
    logits, labels = data
    lt, yt = torch.tensor(logits), torch.tensor(labels)
    prob = torch.sigmoid(lt)
    prob_neg = (prob + 0.05).clamp(max=1)
    loss_pos = yt * torch.log(prob.clamp(min=1e-8))
    loss_neg = (1 - yt) * torch.log((1 - prob_neg).clamp(min=1e-8))
    pt_pos = prob * yt + (1 - prob) * (1 - yt)
    pt_neg = prob_neg * yt + (1 - prob_neg) * (1 - yt)
    ref = float(
        (-((1 - pt_pos) ** 1.0 * loss_pos + (1 - pt_neg) ** 4.0 * loss_neg)).mean()
    )
    got = float(asymmetric_loss(logits, labels))
    assert abs(got - ref) < 1e-5


def test_focal_gradient_finite(data):
    import jax

    logits, labels = data
    grad = jax.grad(lambda x: focal_with_logits(x, labels, gamma=1.5))(logits)
    assert np.all(np.isfinite(np.asarray(grad)))
