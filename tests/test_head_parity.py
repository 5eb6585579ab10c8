"""Parity of the fusion/MTL heads and full-model converters vs torch oracles.

The oracle modules are written here from the published architecture spec
(gated fusion, interaction features, shared trunk + per-task heads) with the
same state-dict key layout as the reference checkpoints, so they also
exercise ``fusion_model_from_torch`` / ``mtl_model_from_torch`` end to end.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import torch.nn as nn
import torch.nn.functional as F

from multimodal_content_moderation_tpu.models import CLIPConfig, FusionModel, MultiTaskModel
from multimodal_content_moderation_tpu.models.convert import (
    fusion_head_from_torch,
    fusion_model_from_torch,
    mtl_head_from_torch,
    mtl_model_from_torch,
)
from multimodal_content_moderation_tpu.models.fusion import fusion_head_apply
from multimodal_content_moderation_tpu.models.multitask import mtl_head_apply, mtl_loss

TINY_TEXT = dict(
    hidden_size=64,
    num_hidden_layers=2,
    num_attention_heads=2,
    intermediate_size=128,
    max_position_embeddings=77,
    vocab_size=1000,
    eos_token_id=999,
    bos_token_id=998,
    pad_token_id=0,
)
TINY_VISION = dict(
    hidden_size=64,
    num_hidden_layers=2,
    num_attention_heads=2,
    intermediate_size=128,
    image_size=32,
    patch_size=16,
)


class TorchFusionHead(nn.Module):
    """Oracle with the reference's parameter names / Sequential indices."""

    def __init__(self, d, fusion_dim, num_labels):
        super().__init__()
        self.proj_t = nn.Linear(d, fusion_dim)
        self.proj_i = nn.Linear(d, fusion_dim)
        self.g_t = nn.Linear(fusion_dim, fusion_dim)
        self.g_i = nn.Linear(fusion_dim, fusion_dim)
        self.gate = nn.Linear(fusion_dim * 2 + 2, fusion_dim)
        self.cls = nn.Sequential(
            nn.LayerNorm(fusion_dim * 5),
            nn.Linear(fusion_dim * 5, fusion_dim),
            nn.GELU(),
            nn.Dropout(0.2),
            nn.Linear(fusion_dim, num_labels),
        )
        self.ln_fused = nn.LayerNorm(fusion_dim)

    def forward(self, tfeat, vfeat, text_present, image_present):
        tfeat = F.normalize(tfeat, dim=-1) * text_present.unsqueeze(1)
        vfeat = F.normalize(vfeat, dim=-1) * image_present.unsqueeze(1)
        tp, vp = self.proj_t(tfeat), self.proj_i(vfeat)
        zt, zi = torch.tanh(self.g_t(tp)), torch.tanh(self.g_i(vp))
        presence = torch.stack([text_present, image_present], dim=1)
        g = torch.sigmoid(self.gate(torch.cat([tp, vp, presence], dim=1)))
        fused = torch.where(
            (image_present < 0.5).unsqueeze(1),
            zt,
            torch.where((text_present < 0.5).unsqueeze(1), zi, g * zt + (1 - g) * zi),
        )
        fused = self.ln_fused(fused)
        feat = torch.cat([fused, tp, vp, torch.abs(tp - vp), tp * vp], dim=1)
        return self.cls(feat)


class TorchMTLHead(nn.Module):
    def __init__(self, tdim, idim, fusion_dim, num_tasks, head_hidden_dim=0):
        super().__init__()
        self.proj_t = nn.Linear(tdim, fusion_dim)
        self.proj_i = nn.Linear(idim, fusion_dim)
        self.g_t = nn.Linear(fusion_dim, fusion_dim)
        self.g_i = nn.Linear(fusion_dim, fusion_dim)
        self.gate = nn.Linear(fusion_dim * 2 + 2, fusion_dim)
        self.shared_head = nn.Sequential(
            nn.Dropout(0.2), nn.Linear(fusion_dim, fusion_dim), nn.GELU(), nn.Dropout(0.2)
        )

        def make_head():
            if head_hidden_dim > 0:
                return nn.Sequential(
                    nn.Linear(fusion_dim, head_hidden_dim),
                    nn.GELU(),
                    nn.Dropout(0.1),
                    nn.Linear(head_hidden_dim, 1),
                )
            return nn.Linear(fusion_dim, 1)

        self.heads = nn.ModuleList([make_head() for _ in range(num_tasks)])

    def forward(self, tfeat, vfeat, text_present, image_present):
        tp, vp = self.proj_t(tfeat), self.proj_i(vfeat)
        presence = torch.stack([text_present, image_present], dim=1)
        zt, zi = torch.tanh(self.g_t(tp)), torch.tanh(self.g_i(vp))
        g = torch.sigmoid(self.gate(torch.cat([tp, vp, presence], dim=1)))
        fused = torch.where(
            (image_present < 0.5).unsqueeze(1),
            zt,
            torch.where((text_present < 0.5).unsqueeze(1), zi, g * zt + (1 - g) * zi),
        )
        shared = self.shared_head(fused)
        return torch.stack([h(shared).squeeze(-1) for h in self.heads], dim=1)


def _features(seed, B=4, d=64):
    g = np.random.default_rng(seed)
    t = g.normal(size=(B, d)).astype(np.float32)
    v = g.normal(size=(B, d)).astype(np.float32)
    # Exercise all 3 presence branches: both, text-only, image-only
    tpres = np.array([1.0, 1.0, 0.0, 1.0], dtype=np.float32)[:B]
    ipres = np.array([1.0, 0.0, 1.0, 1.0], dtype=np.float32)[:B]
    return t, v, tpres, ipres


def test_fusion_head_parity():
    torch.manual_seed(0)
    oracle = TorchFusionHead(64, 32, 5).eval()
    params = fusion_head_from_torch(oracle.state_dict())
    t, v, tp, ip = _features(0)
    with torch.no_grad():
        ref = oracle(
            torch.tensor(t), torch.tensor(v), torch.tensor(tp), torch.tensor(ip)
        ).numpy()
    got = np.asarray(fusion_head_apply(params, t, v, tp, ip))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("hidden", [0, 16])
def test_mtl_head_parity(hidden):
    torch.manual_seed(1)
    oracle = TorchMTLHead(64, 64, 32, 3, head_hidden_dim=hidden).eval()
    params = mtl_head_from_torch(oracle.state_dict(), num_tasks=3)
    t, v, tp, ip = _features(1)
    with torch.no_grad():
        ref = oracle(
            torch.tensor(t), torch.tensor(v), torch.tensor(tp), torch.tensor(ip)
        ).numpy()
    got = np.asarray(mtl_head_apply(params, t, v, tp, ip))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_mtl_train_mode_applies_per_task_dropout():
    """Train mode must apply Dropout(0.1) inside hidden task heads
    (reference src/models/multitask.py:106-117); eval mode must not."""
    import jax
    import jax.numpy as jnp

    from multimodal_content_moderation_tpu.ops.layers import (
        dense,
        dropout,
        gelu_exact,
    )

    torch.manual_seed(3)
    oracle = TorchMTLHead(64, 64, 32, 2, head_hidden_dim=16).eval()
    params = mtl_head_from_torch(oracle.state_dict(), num_tasks=2)
    t, v, tp, ip = _features(3)
    rng = jax.random.key(7)

    got = np.asarray(mtl_head_apply(params, t, v, tp, ip, dropout_rng=rng))

    # Re-derive the exact expected logits with the same rng chain, including
    # the per-task 0.1 dropout after the hidden GELU.
    def manual(with_task_dropout: bool):
        tfeat = jnp.asarray(t)
        vfeat = jnp.asarray(v)
        tpj = dense(tfeat, params["proj_t"])
        vpj = dense(vfeat, params["proj_i"])
        presence = jnp.stack([jnp.asarray(tp), jnp.asarray(ip)], axis=1)
        zt = jnp.tanh(dense(tpj, params["g_t"]))
        zi = jnp.tanh(dense(vpj, params["g_i"]))
        g = jax.nn.sigmoid(
            dense(jnp.concatenate([tpj, vpj, presence], axis=1), params["gate"])
        )
        fused = jnp.where(
            (jnp.asarray(ip) < 0.5)[:, None],
            zt,
            jnp.where((jnp.asarray(tp) < 0.5)[:, None], zi, g * zt + (1 - g) * zi),
        )
        rngs = jax.random.split(rng, 2 + 2)
        y = dropout(fused, 0.2, rngs[0])
        y = gelu_exact(dense(y, params["shared_fc"]))
        shared = dropout(y, 0.2, rngs[1])
        logits = []
        for j, head in enumerate(params["heads"]):
            h = gelu_exact(dense(shared, head["fc1"]))
            if with_task_dropout:
                h = dropout(h, 0.1, rngs[2 + j])
            logits.append(dense(h, head["fc2"])[:, 0])
        return np.asarray(jnp.stack(logits, axis=1))

    np.testing.assert_allclose(got, manual(with_task_dropout=True), atol=1e-6)
    assert not np.allclose(got, manual(with_task_dropout=False))

    # eval (rng=None) still matches the torch eval oracle exactly
    with torch.no_grad():
        ref = oracle(
            torch.tensor(t), torch.tensor(v), torch.tensor(tp), torch.tensor(ip)
        ).numpy()
    got_eval = np.asarray(mtl_head_apply(params, t, v, tp, ip))
    np.testing.assert_allclose(got_eval, ref, atol=2e-5, rtol=1e-4)


def test_mtl_uncertainty_loss():
    g = np.random.default_rng(2)
    logits = g.normal(size=(8, 3)).astype(np.float32)
    labels = (g.random(size=(8, 3)) < 0.3).astype(np.float32)
    pw = np.array([1.5, 2.0, 0.7], dtype=np.float32)
    log_vars = np.array([0.1, -0.2, 0.3], dtype=np.float32)
    per_task = []
    for j in range(3):
        lj = F.binary_cross_entropy_with_logits(
            torch.tensor(logits[:, j]), torch.tensor(labels[:, j]),
            pos_weight=torch.tensor(pw[j]),
        )
        per_task.append(float(np.exp(-log_vars[j]) * lj.item() + 0.5 * log_vars[j]))
    expected = float(np.mean(per_task))
    got = float(mtl_loss(logits, labels, pos_weight=pw, log_vars=log_vars))
    assert abs(got - expected) < 1e-6


class TorchFullFusion(nn.Module):
    """Full reference-shaped fusion checkpoint: backbone.* + head keys."""

    def __init__(self, hf_cfg, num_labels=5, fusion_dim=32):
        super().__init__()
        self.backbone = transformers.CLIPModel(hf_cfg)
        d = hf_cfg.projection_dim
        head = TorchFusionHead(d, fusion_dim, num_labels)
        for name in ("proj_t", "proj_i", "g_t", "g_i", "gate", "cls", "ln_fused"):
            setattr(self, name, getattr(head, name))

    def forward(self, input_ids, attention_mask, pixel_values, text_present, image_present):
        tfeat = self.backbone.get_text_features(
            input_ids=input_ids, attention_mask=attention_mask
        )
        vfeat = self.backbone.get_image_features(pixel_values=pixel_values)
        tfeat = F.normalize(tfeat, dim=-1) * text_present.unsqueeze(1)
        vfeat = F.normalize(vfeat, dim=-1) * image_present.unsqueeze(1)
        tp, vp = self.proj_t(tfeat), self.proj_i(vfeat)
        zt, zi = torch.tanh(self.g_t(tp)), torch.tanh(self.g_i(vp))
        presence = torch.stack([text_present, image_present], dim=1)
        g = torch.sigmoid(self.gate(torch.cat([tp, vp, presence], dim=1)))
        fused = torch.where(
            (image_present < 0.5).unsqueeze(1),
            zt,
            torch.where((text_present < 0.5).unsqueeze(1), zi, g * zt + (1 - g) * zi),
        )
        fused = self.ln_fused(fused)
        feat = torch.cat([fused, tp, vp, torch.abs(tp - vp), tp * vp], dim=1)
        return self.cls(feat)


def test_full_fusion_model_parity():
    torch.manual_seed(3)
    hf_cfg = transformers.CLIPConfig(
        text_config=dict(TINY_TEXT), vision_config=dict(TINY_VISION), projection_dim=32
    )
    oracle = TorchFullFusion(hf_cfg, num_labels=5, fusion_dim=32).eval()
    cfg = CLIPConfig.from_hf(hf_cfg)
    params = fusion_model_from_torch(oracle.state_dict(), "clip", clip_cfg=cfg)
    model = FusionModel.create("clip", num_labels=5, fusion_dim=32, clip_config=cfg)

    g = np.random.default_rng(4)
    B = 3
    ids = g.integers(1, 900, size=(B, 77)).astype(np.int64)
    ids[:, 20] = 999
    mask = np.ones((B, 77), dtype=np.int64)
    px = g.normal(size=(B, 3, 32, 32)).astype(np.float32)
    tp = np.array([1.0, 0.0, 1.0], dtype=np.float32)
    ip = np.array([1.0, 1.0, 0.0], dtype=np.float32)

    with torch.no_grad():
        ref = oracle(
            torch.tensor(ids),
            torch.tensor(mask),
            torch.tensor(px),
            torch.tensor(tp),
            torch.tensor(ip),
        ).numpy()

    batch = {
        "input_ids": ids,
        "attention_mask": mask,
        "pixel_values": px,
        "text_present": tp,
        "image_present": ip,
    }
    got = np.asarray(model.apply(params, batch)["logits"])
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-4)


class TorchFullMTL(nn.Module):
    """Full reference-shaped MTL checkpoint: tower_txt./tower_img. + head."""

    def __init__(self, hf_cfg, num_tasks=3, fusion_dim=32, head_hidden_dim=16):
        super().__init__()
        self.tower_txt = transformers.CLIPTextModel(hf_cfg.text_config)
        self.tower_img = transformers.CLIPVisionModel(hf_cfg.vision_config)
        head = TorchMTLHead(
            hf_cfg.text_config.hidden_size,
            hf_cfg.vision_config.hidden_size,
            fusion_dim,
            num_tasks,
            head_hidden_dim,
        )
        for name in ("proj_t", "proj_i", "g_t", "g_i", "gate", "shared_head", "heads"):
            setattr(self, name, getattr(head, name))
        self._head_fwd = TorchMTLHead.forward

    def forward(self, input_ids, attention_mask, pixel_values, text_present, image_present):
        t_out = self.tower_txt(input_ids=input_ids, attention_mask=attention_mask)
        tfeat = t_out.pooler_output
        v_out = self.tower_img(pixel_values=pixel_values)
        vfeat = v_out.pooler_output
        return self._head_fwd(self, tfeat, vfeat, text_present, image_present)


def test_full_mtl_model_parity():
    torch.manual_seed(5)
    hf_cfg = transformers.CLIPConfig(
        text_config=dict(TINY_TEXT), vision_config=dict(TINY_VISION), projection_dim=32
    )
    oracle = TorchFullMTL(hf_cfg, num_tasks=3, fusion_dim=32, head_hidden_dim=16).eval()
    cfg = CLIPConfig.from_hf(hf_cfg)
    params = mtl_model_from_torch(oracle.state_dict(), "clip", num_tasks=3, clip_cfg=cfg)
    model = MultiTaskModel.create(
        "clip", num_tasks=3, fusion_dim=32, head_hidden_dim=16, clip_config=cfg
    )

    g = np.random.default_rng(6)
    B = 3
    ids = g.integers(1, 900, size=(B, 77)).astype(np.int64)
    ids[:, 30] = 999
    mask = np.ones((B, 77), dtype=np.int64)
    px = g.normal(size=(B, 3, 32, 32)).astype(np.float32)
    tp = np.array([1.0, 0.0, 1.0], dtype=np.float32)
    ip = np.array([1.0, 1.0, 0.0], dtype=np.float32)

    with torch.no_grad():
        ref = oracle(
            torch.tensor(ids),
            torch.tensor(mask),
            torch.tensor(px),
            torch.tensor(tp),
            torch.tensor(ip),
        ).numpy()

    batch = {
        "input_ids": ids,
        "attention_mask": mask,
        "pixel_values": px,
        "text_present": tp,
        "image_present": ip,
    }
    got = np.asarray(model.apply(params, batch)["logits"])
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-4)


def test_mtl_auto_backend_with_siglip_towers():
    """MTL 'auto' backend pools via SigLIP text-head + vision MAP head
    (reference multitask.py:138-154 fallback chain)."""
    import jax

    from multimodal_content_moderation_tpu.models import MultiTaskModel, SigLIPConfig
    from multimodal_content_moderation_tpu.models.convert import (
        mtl_head_from_torch,
        siglip_params_from_torch,
    )

    torch.manual_seed(9)
    hf_cfg = transformers.SiglipConfig(
        text_config=dict(hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
                         intermediate_size=64, max_position_embeddings=8, vocab_size=100),
        vision_config=dict(hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
                           intermediate_size=64, image_size=16, patch_size=8),
    )
    sm = transformers.SiglipModel(hf_cfg).eval()
    head = TorchMTLHead(32, 32, 16, 2).eval()

    cfg = SigLIPConfig.from_hf(hf_cfg)
    model = MultiTaskModel.create("auto", num_tasks=2, fusion_dim=16, siglip_config=cfg)
    params = {
        "backbone": siglip_params_from_torch(sm.state_dict(), cfg),
        "head": mtl_head_from_torch(head.state_dict(), num_tasks=2),
    }

    g = np.random.default_rng(9)
    B = 2
    ids = g.integers(0, 99, size=(B, 8)).astype(np.int64)
    px = g.normal(size=(B, 3, 16, 16)).astype(np.float32)
    tp = np.ones((B,), np.float32)
    ip = np.ones((B,), np.float32)

    with torch.no_grad():
        t_out = sm.text_model(input_ids=torch.tensor(ids)).pooler_output
        v_out = sm.vision_model(pixel_values=torch.tensor(px)).pooler_output
        ref = head(t_out, v_out, torch.tensor(tp), torch.tensor(ip)).numpy()

    got = np.asarray(
        model.apply(
            params,
            {
                "input_ids": ids,
                "attention_mask": None,
                "pixel_values": px,
                "text_present": tp,
                "image_present": ip,
            },
        )["logits"]
    )
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-4)
