"""Export round-trip: JAX params -> reference-format safetensors -> torch.

The exported state dict must (a) convert back into an identical pytree and
(b) load into the torch oracle with matching logits — proving reference users
can consume TPU-trained checkpoints unchanged."""

import numpy as np
import pytest

import jax

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from multimodal_content_moderation_tpu.models import CLIPConfig, FusionModel, MultiTaskModel
from multimodal_content_moderation_tpu.models.convert import (
    fusion_model_from_torch,
    mtl_model_from_torch,
)
from multimodal_content_moderation_tpu.models.export import (
    export_safetensors,
    fusion_model_to_torch,
    mtl_model_to_torch,
)
from tests.test_head_parity import (
    TINY_TEXT,
    TINY_VISION,
    TorchFullFusion,
    TorchFullMTL,
    TorchFusionHead,
)


def _tiny_cfg():
    hf_cfg = transformers.CLIPConfig(
        text_config=dict(TINY_TEXT), vision_config=dict(TINY_VISION), projection_dim=32
    )
    return hf_cfg, CLIPConfig.from_hf(hf_cfg)


def _tree_equal(a, b):
    flat_a = jax.tree_util.tree_leaves_with_path(a)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(b))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_b[path]), atol=1e-7,
            err_msg=jax.tree_util.keystr(path),
        )


def test_fusion_export_roundtrip_and_torch_load(tmp_path):
    hf_cfg, cfg = _tiny_cfg()
    model = FusionModel.create("clip", num_labels=5, fusion_dim=32, clip_config=cfg)
    params = model.init(jax.random.key(0))

    sd = fusion_model_to_torch(params, model)
    back = fusion_model_from_torch(sd, "clip", clip_cfg=cfg)
    _tree_equal(params, back)

    # the torch oracle must accept the exported dict with zero missing keys
    torch.manual_seed(0)
    oracle = TorchFullFusion(hf_cfg, num_labels=5, fusion_dim=32).eval()
    missing, unexpected = oracle.load_state_dict(
        {k: torch.tensor(v) for k, v in sd.items()}, strict=False
    )
    # position_ids buffers may be absent from our export; nothing else
    assert not unexpected
    assert all("position_ids" in m for m in missing)

    # logits parity through torch after the round trip
    g = np.random.default_rng(0)
    B = 2
    ids = g.integers(1, 900, size=(B, 77)).astype(np.int64)
    ids[:, 9] = 999
    mask = np.ones((B, 77), np.int64)
    px = g.normal(size=(B, 3, 32, 32)).astype(np.float32)
    tp = np.ones((B,), np.float32)
    ip = np.ones((B,), np.float32)
    with torch.no_grad():
        ref = oracle(
            torch.tensor(ids), torch.tensor(mask), torch.tensor(px),
            torch.tensor(tp), torch.tensor(ip),
        ).numpy()
    got = np.asarray(
        model.apply(
            params,
            {
                "input_ids": ids,
                "attention_mask": mask,
                "pixel_values": px,
                "text_present": tp,
                "image_present": ip,
            },
        )["logits"]
    )
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-4)

    # file-level API
    from safetensors.numpy import load_file

    path = export_safetensors(params, model, str(tmp_path / "model.safetensors"))
    assert set(load_file(path).keys()) == set(sd.keys())


def test_mtl_export_roundtrip(tmp_path):
    hf_cfg, cfg = _tiny_cfg()
    model = MultiTaskModel.create(
        "clip", num_tasks=3, fusion_dim=32, head_hidden_dim=16,
        learnable_task_weights=True, clip_config=cfg,
    )
    params = model.init(jax.random.key(1))
    sd = mtl_model_to_torch(params, model)
    back = mtl_model_from_torch(sd, "clip", num_tasks=3, clip_cfg=cfg)
    _tree_equal(params, back)

    torch.manual_seed(1)
    oracle = TorchFullMTL(hf_cfg, num_tasks=3, fusion_dim=32, head_hidden_dim=16)
    # add log_vars to the oracle to mirror learnable_task_weights
    oracle.log_vars = torch.nn.Parameter(torch.zeros(3))
    missing, unexpected = oracle.load_state_dict(
        {k: torch.tensor(v) for k, v in sd.items()}, strict=False
    )
    assert not unexpected
    assert all("position_ids" in m for m in missing)


TINY_SIGLIP = dict(
    text_config=dict(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=64,
        max_position_embeddings=16,
        vocab_size=120,
    ),
    vision_config=dict(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=64,
        image_size=32,
        patch_size=16,
    ),
)


class _TorchAutoFusion(torch.nn.Module):
    """Reference-shaped fusion module over an AutoModel backbone (the
    backend='auto' path of src/models/fusion.py:110-120): ``backbone.*`` +
    top-level head keys."""

    def __init__(self, backbone, d, num_labels, fusion_dim):
        super().__init__()
        self.backbone = backbone
        head = TorchFusionHead(d, fusion_dim, num_labels)
        for name in ("proj_t", "proj_i", "g_t", "g_i", "gate", "cls", "ln_fused"):
            setattr(self, name, getattr(head, name))

    def forward(self, input_ids, attention_mask, pixel_values, tp, ip):
        t = self.backbone.get_text_features(
            input_ids=input_ids, attention_mask=attention_mask
        )
        v = self.backbone.get_image_features(pixel_values=pixel_values)
        # self carries every head attribute TorchFusionHead.forward reads
        return TorchFusionHead.forward(self, t, v, tp, ip)


def test_siglip_fusion_export_roundtrip_and_torch_load():
    """TPU-trained SigLIP fusion run -> reference safetensors layout
    (scripts/evaluate.py:139-151 must load it; runs/siglip_fusion_* is the
    reference artifact this answers to)."""
    from multimodal_content_moderation_tpu.models import model_io

    torch.manual_seed(11)
    hf_cfg = transformers.SiglipConfig(**TINY_SIGLIP)
    backbone = transformers.SiglipModel(hf_cfg).eval()
    d = hf_cfg.text_config.hidden_size  # projection_size probe
    oracle = _TorchAutoFusion(backbone, d, num_labels=4, fusion_dim=16).eval()

    cfg = model_io.siglip_config_from_dict(hf_cfg.to_dict())
    model = FusionModel.create("siglip", num_labels=4, fusion_dim=16, siglip_config=cfg)
    params = fusion_model_from_torch(oracle.state_dict(), "siglip", siglip_cfg=cfg)

    sd = fusion_model_to_torch(params, model)
    back = fusion_model_from_torch(sd, "siglip", siglip_cfg=cfg)
    _tree_equal(params, back)

    missing, unexpected = oracle.load_state_dict(
        {k: torch.tensor(v) for k, v in sd.items()}, strict=False
    )
    assert not unexpected
    assert all("position_ids" in m for m in missing)

    g = np.random.default_rng(12)
    B = 2
    ids = g.integers(1, 119, size=(B, 16)).astype(np.int64)
    mask = np.ones((B, 16), np.int64)
    px = g.normal(size=(B, 3, 32, 32)).astype(np.float32)
    tp = np.ones((B,), np.float32)
    ip = np.ones((B,), np.float32)
    with torch.no_grad():
        ref = oracle(
            torch.tensor(ids), torch.tensor(mask), torch.tensor(px),
            torch.tensor(tp), torch.tensor(ip),
        ).numpy()
    got = np.asarray(
        model.apply(
            params,
            {
                "input_ids": ids,
                "attention_mask": mask,
                "pixel_values": px,
                "text_present": tp,
                "image_present": ip,
            },
        )["logits"]
    )
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-4)


def test_siglip_mtl_export_roundtrip_and_torch_keys():
    """MTL auto path shares one ``backbone.*`` AutoModel (multitask.py:74)."""
    from multimodal_content_moderation_tpu.models import model_io

    torch.manual_seed(13)
    hf_cfg = transformers.SiglipConfig(**TINY_SIGLIP)
    cfg = model_io.siglip_config_from_dict(hf_cfg.to_dict())
    model = MultiTaskModel.create(
        "auto", num_tasks=3, fusion_dim=16, siglip_config=cfg
    )
    params = model.init(jax.random.key(2))
    sd = mtl_model_to_torch(params, model)
    back = mtl_model_from_torch(sd, "siglip", num_tasks=3, siglip_cfg=cfg)
    _tree_equal(params, back)

    from tests.test_head_parity import TorchMTLHead

    class _TorchAutoMTL(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = transformers.SiglipModel(hf_cfg)
            head = TorchMTLHead(32, 32, 16, 3)
            for name in ("proj_t", "proj_i", "g_t", "g_i", "gate",
                         "shared_head", "heads"):
                setattr(self, name, getattr(head, name))

    oracle = _TorchAutoMTL()
    missing, unexpected = oracle.load_state_dict(
        {k: torch.tensor(v) for k, v in sd.items()}, strict=False
    )
    assert not unexpected
    assert all("position_ids" in m for m in missing)


def test_generic_fusion_export_roundtrip_and_torch_load():
    """VisionTextDualEncoder (generic backend) export: the reference's
    AutoModel fusion path can strict-load a TPU-trained checkpoint."""
    from multimodal_content_moderation_tpu.models import model_io
    from tests.test_generic_backend import TINY_BERT, TINY_VIT

    torch.manual_seed(14)
    vtde_cfg = transformers.VisionTextDualEncoderConfig.from_vision_text_configs(
        transformers.ViTConfig(**{k: v for k, v in TINY_VIT.items() if k != "model_type"}),
        transformers.BertConfig(**{k: v for k, v in TINY_BERT.items() if k != "model_type"}),
        projection_dim=24,
    )
    backbone = transformers.VisionTextDualEncoderModel(vtde_cfg).eval()
    oracle = _TorchAutoFusion(backbone, 24, num_labels=3, fusion_dim=16).eval()

    from multimodal_content_moderation_tpu.models.generic import GenericDualConfig

    cfg = GenericDualConfig.from_dict(vtde_cfg.to_dict())
    model = FusionModel.create("generic", num_labels=3, fusion_dim=16, generic_config=cfg)
    params = fusion_model_from_torch(oracle.state_dict(), "generic", generic_cfg=cfg)

    sd = fusion_model_to_torch(params, model)
    back = fusion_model_from_torch(sd, "generic", generic_cfg=cfg)
    _tree_equal(params, back)

    missing, unexpected = oracle.load_state_dict(
        {k: torch.tensor(v) for k, v in sd.items()}, strict=False
    )
    assert not unexpected
    assert all("position_ids" in m for m in missing)

    g = np.random.default_rng(15)
    B = 2
    ids = g.integers(5, 59, size=(B, 12)).astype(np.int64)
    mask = np.ones((B, 12), np.int64)
    px = g.normal(size=(B, 3, 32, 32)).astype(np.float32)
    tp = np.ones((B,), np.float32)
    ip = np.ones((B,), np.float32)
    with torch.no_grad():
        ref = oracle(
            torch.tensor(ids), torch.tensor(mask), torch.tensor(px),
            torch.tensor(tp), torch.tensor(ip),
        ).numpy()
    got = np.asarray(
        model.apply(
            params,
            {
                "input_ids": ids,
                "attention_mask": mask,
                "pixel_values": px,
                "text_present": tp,
                "image_present": ip,
            },
        )["logits"]
    )
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-4)


def test_export_cli_roundtrip(trained_run, data_dir, tmp_path):
    """Orbax run -> export CLI -> reference-format bundle -> inference API."""
    from multimodal_content_moderation_tpu.cli import export as export_cli
    from multimodal_content_moderation_tpu.cli.inference import MultiModalClassifier

    _, result = trained_run
    ckpt = result["result"]["best_checkpoint"]
    out = str(tmp_path / "exported")
    export_cli.main(["--checkpoint", ckpt, "--output_dir", out])

    import os

    bundle = os.path.join(out, "checkpoint-exported")
    assert os.path.exists(os.path.join(bundle, "model.safetensors"))
    assert os.path.exists(os.path.join(bundle, "vocab.json"))  # assets carried

    # the exported bundle loads through the same API as a reference checkpoint
    clf_ref = MultiModalClassifier(bundle, batch_size=4)
    clf_orbax = MultiModalClassifier(ckpt, batch_size=4)
    r1 = clf_ref.predict("hate hate hate", None)
    r2 = clf_orbax.predict("hate hate hate", None)
    for name in r1["predictions"]:
        assert r1["predictions"][name]["probability"] == pytest.approx(
            r2["predictions"][name]["probability"], abs=1e-5
        )
