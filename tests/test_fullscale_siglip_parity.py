"""Full-scale SigLIP-B/16 forward parity vs a torch oracle.

test_fullscale_parity.py proves flagship-scale parity for the CLIP ViT-B/32
family; this file does the same for the second encoder family the reference
ships (SigLIP, reference runs/siglip_fusion_mmhshateful): text/image
features and head logits at the REAL siglip-base-patch16-224 architecture
(12+12 layers, d=768 both towers, 196 patch tokens, 64-position text,
MAP-head vision pooling) — not the 1-2 layer toy shapes of
test_encoder_parity.py.

Reference context: the upstream model builds these towers via
``transformers.AutoModel`` with pooler-output pooling
(reference src/models/multitask.py:130-154, fusion.py:100-111).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from multimodal_content_moderation_tpu.models import (
    FusionModel,
    SigLIPConfig,
)
from multimodal_content_moderation_tpu.models.convert import (
    fusion_head_from_torch,
    siglip_params_from_torch,
)
from multimodal_content_moderation_tpu.models.siglip import (
    siglip_image_features,
    siglip_text_features,
)
from test_head_parity import TorchFusionHead


def _full_cfg():
    # transformers.SiglipConfig() defaults == google/siglip-base-patch16-224:
    # text d=768/12L/12H, 64 positions; vision d=768/12L/12H, image 224/p16
    return transformers.SiglipConfig()


@pytest.mark.slow
def test_fullsize_siglip_b16_parity():
    torch.manual_seed(0)
    hf_cfg = _full_cfg()
    assert hf_cfg.text_config.hidden_size == 768
    assert hf_cfg.text_config.num_hidden_layers == 12
    assert hf_cfg.vision_config.image_size // hf_cfg.vision_config.patch_size == 14

    sm = transformers.SiglipModel(hf_cfg).eval()
    cfg = SigLIPConfig.from_hf(hf_cfg)
    bp = siglip_params_from_torch(sm.state_dict(), cfg)

    B = 2
    g = np.random.default_rng(0)
    T = hf_cfg.text_config.max_position_embeddings
    ids = g.integers(
        1, hf_cfg.text_config.vocab_size - 2, size=(B, T)
    ).astype(np.int64)
    px = g.normal(size=(B, 3, 224, 224)).astype(np.float32)

    with torch.no_grad():
        # SigLIP canonical pooling: text pooler head, vision MAP head —
        # exactly what AutoModel pooler_output gives the reference
        ref_t = sm.text_model(input_ids=torch.tensor(ids)).pooler_output.numpy()
        ref_v = sm.vision_model(pixel_values=torch.tensor(px)).pooler_output.numpy()

    got_t = np.asarray(siglip_text_features(bp, ids, None, cfg))
    got_v = np.asarray(siglip_image_features(bp, px, cfg))

    atol_t = float(np.max(np.abs(got_t - ref_t)))
    atol_v = float(np.max(np.abs(got_v - ref_v)))
    print(
        f"\nfull-scale SigLIP-B/16 parity: text atol={atol_t:.2e} "
        f"image atol={atol_v:.2e} (target 1e-3)"
    )
    assert atol_t < 1e-3
    assert atol_v < 1e-3


@pytest.mark.slow
def test_fullsize_siglip_fusion_logits_parity():
    """Fusion head over full-scale SigLIP towers: logits vs the torch head
    applied to the torch towers' pooler outputs."""
    torch.manual_seed(1)
    hf_cfg = _full_cfg()
    sm = transformers.SiglipModel(hf_cfg).eval()
    cfg = SigLIPConfig.from_hf(hf_cfg)

    feat_dim = cfg.text.projection_size
    head = TorchFusionHead(feat_dim, num_labels=5, fusion_dim=512).eval()

    model = FusionModel.create(
        "siglip", num_labels=5, fusion_dim=512, siglip_config=cfg
    )
    params = {
        "backbone": siglip_params_from_torch(sm.state_dict(), cfg),
        "head": fusion_head_from_torch(head.state_dict()),
    }

    B = 2
    g = np.random.default_rng(1)
    T = hf_cfg.text_config.max_position_embeddings
    ids = g.integers(
        1, hf_cfg.text_config.vocab_size - 2, size=(B, T)
    ).astype(np.int64)
    px = g.normal(size=(B, 3, 224, 224)).astype(np.float32)
    tp = np.array([1.0, 1.0], np.float32)
    ip = np.array([1.0, 0.0], np.float32)  # one absent image (gate fallback)

    with torch.no_grad():
        t = sm.text_model(input_ids=torch.tensor(ids)).pooler_output
        v = sm.vision_model(pixel_values=torch.tensor(px)).pooler_output
        ref = head(t, v, torch.tensor(tp), torch.tensor(ip)).numpy()

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
    atol = float(np.max(np.abs(got - ref)))
    print(f"\nfull-scale SigLIP fusion logits atol={atol:.2e} (target 1e-3)")
    assert atol < 1e-3
