"""u8 wire-format fast path must match the fp32 pixel parity path."""

import numpy as np
import pytest

import jax

from multimodal_content_moderation_tpu.models import CLIPConfig, FusionModel
from multimodal_content_moderation_tpu.models.clip import CLIPTextConfig, CLIPVisionConfig
from multimodal_content_moderation_tpu.models.fast_infer import FastInferenceEngine

MEAN = (0.48145466, 0.4578275, 0.40821073)
STD = (0.26862954, 0.26130258, 0.27577711)


def test_fast_engine_matches_pixel_path():
    cfg = CLIPConfig(
        text=CLIPTextConfig(
            vocab_size=128, hidden_size=32, num_layers=2, num_heads=2,
            intermediate_size=64, max_positions=12, eos_token_id=127,
        ),
        vision=CLIPVisionConfig(
            hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64,
            image_size=32, patch_size=16,
        ),
        projection_dim=32,
    )
    model = FusionModel.create("clip", num_labels=3, fusion_dim=16, clip_config=cfg)
    params = model.init(jax.random.key(0))

    g = np.random.default_rng(0)
    B = 4
    ids = g.integers(1, 126, size=(B, 12)).astype(np.int32)
    ids[:, 6] = 127
    mask = np.ones((B, 12), np.int32)
    imgs_u8 = g.integers(0, 256, size=(B, 32, 32, 3), dtype=np.uint8)
    tpres = np.ones((B,), np.float32)
    ipres = np.ones((B,), np.float32)

    # parity path: host-normalized fp32 NCHW
    x = imgs_u8.astype(np.float32) / 255.0
    x = (x - np.asarray(MEAN)) / np.asarray(STD)
    pixel_values = np.ascontiguousarray(x.transpose(0, 3, 1, 2)).astype(np.float32)
    ref = np.asarray(
        model.apply(
            params,
            {
                "input_ids": ids,
                "attention_mask": mask,
                "pixel_values": pixel_values,
                "text_present": tpres,
                "image_present": ipres,
            },
        )["logits"]
    )

    engine = FastInferenceEngine(model, params, MEAN, STD, use_pallas=False)
    patches = engine.patches_from_hwc(imgs_u8)
    got = np.asarray(engine(ids, mask, patches, tpres, ipres))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_fast_engine_pallas_interpret_matches():
    """Same check with the actual Pallas kernel in interpret mode."""
    import multimodal_content_moderation_tpu.models.fast_infer as fi
    from multimodal_content_moderation_tpu.ops import pallas_image

    cfg = CLIPConfig(
        text=CLIPTextConfig(
            vocab_size=64, hidden_size=16, num_layers=1, num_heads=2,
            intermediate_size=32, max_positions=8, eos_token_id=63,
        ),
        vision=CLIPVisionConfig(
            hidden_size=16, num_layers=1, num_heads=2, intermediate_size=32,
            image_size=16, patch_size=8,
        ),
        projection_dim=16,
    )
    model = FusionModel.create("clip", num_labels=2, fusion_dim=8, clip_config=cfg)
    params = model.init(jax.random.key(1))

    import functools

    interp_embed = functools.partial(pallas_image.patch_embed_u8, interpret=True)

    g = np.random.default_rng(1)
    B = 2
    ids = g.integers(1, 62, size=(B, 8)).astype(np.int32)
    ids[:, 4] = 63
    mask = np.ones((B, 8), np.int32)
    imgs_u8 = g.integers(0, 256, size=(B, 16, 16, 3), dtype=np.uint8)
    ones = np.ones((B,), np.float32)

    ref_engine = FastInferenceEngine(model, params, MEAN, STD, use_pallas=False)
    patches = ref_engine.patches_from_hwc(imgs_u8)
    ref = np.asarray(ref_engine(ids, mask, patches, ones, ones))

    # swap in the interpret-mode Pallas kernel (the engine now reaches it
    # through the differentiable wrapper in ops/pallas_image)
    orig = pallas_image.patch_embed_u8
    pallas_image.patch_embed_u8 = interp_embed
    try:
        pl_engine = FastInferenceEngine(model, params, MEAN, STD, use_pallas=True)
        got = np.asarray(pl_engine(ids, mask, patches, ones, ones))
    finally:
        pallas_image.patch_embed_u8 = orig
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


SIGLIP_MEAN = (0.5, 0.5, 0.5)
SIGLIP_STD = (0.5, 0.5, 0.5)


def _u8_and_pixel(imgs_u8, mean, std):
    x = imgs_u8.astype(np.float32) / 255.0
    x = (x - np.asarray(mean)) / np.asarray(std)
    return np.ascontiguousarray(x.transpose(0, 3, 1, 2)).astype(np.float32)


def test_fast_engine_siglip_fusion():
    from multimodal_content_moderation_tpu.models.siglip import (
        SigLIPConfig,
        SigLIPTextConfig,
        SigLIPVisionConfig,
    )

    cfg = SigLIPConfig(
        text=SigLIPTextConfig(
            vocab_size=64, hidden_size=32, num_layers=1, num_heads=2,
            intermediate_size=64, max_positions=8, projection_size=32,
        ),
        vision=SigLIPVisionConfig(
            hidden_size=32, num_layers=1, num_heads=2, intermediate_size=64,
            image_size=32, patch_size=16,
        ),
    )
    model = FusionModel.create("siglip", num_labels=2, fusion_dim=8, siglip_config=cfg)
    params = model.init(jax.random.key(2))

    g = np.random.default_rng(2)
    B = 3
    ids = g.integers(1, 63, size=(B, 8)).astype(np.int32)
    mask = np.ones((B, 8), np.int32)
    imgs_u8 = g.integers(0, 256, size=(B, 32, 32, 3), dtype=np.uint8)
    ones = np.ones((B,), np.float32)

    ref = np.asarray(
        model.apply(
            params,
            {
                "input_ids": ids, "attention_mask": mask,
                "pixel_values": _u8_and_pixel(imgs_u8, SIGLIP_MEAN, SIGLIP_STD),
                "text_present": ones, "image_present": ones,
            },
        )["logits"]
    )
    engine = FastInferenceEngine(model, params, SIGLIP_MEAN, SIGLIP_STD, use_pallas=False)
    got = np.asarray(engine(ids, mask, engine.patches_from_hwc(imgs_u8), ones, ones))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_fast_engine_mtl():
    from multimodal_content_moderation_tpu.models.multitask import MultiTaskModel

    cfg = CLIPConfig(
        text=CLIPTextConfig(
            vocab_size=64, hidden_size=32, num_layers=1, num_heads=2,
            intermediate_size=64, max_positions=8, eos_token_id=63,
        ),
        vision=CLIPVisionConfig(
            hidden_size=32, num_layers=1, num_heads=2, intermediate_size=64,
            image_size=32, patch_size=16,
        ),
        projection_dim=32,
    )
    model = MultiTaskModel.create(
        "clip", num_tasks=3, fusion_dim=8, head_hidden_dim=4, clip_config=cfg
    )
    params = model.init(jax.random.key(3))

    g = np.random.default_rng(3)
    B = 3
    ids = g.integers(1, 62, size=(B, 8)).astype(np.int32)
    ids[:, 5] = 63
    mask = np.ones((B, 8), np.int32)
    imgs_u8 = g.integers(0, 256, size=(B, 32, 32, 3), dtype=np.uint8)
    ones = np.ones((B,), np.float32)

    ref = np.asarray(
        model.apply(
            params,
            {
                "input_ids": ids, "attention_mask": mask,
                "pixel_values": _u8_and_pixel(imgs_u8, MEAN, STD),
                "text_present": ones, "image_present": ones,
            },
        )["logits"]
    )
    engine = FastInferenceEngine(model, params, MEAN, STD, use_pallas=False)
    got = np.asarray(engine(ids, mask, engine.patches_from_hwc(imgs_u8), ones, ones))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_u8_wire_training_step_matches_pixel_step():
    """The u8 wire format is differentiable: one SGD step on a u8 batch must
    match the step on the equivalent fp32-pixel batch (same crops)."""
    import dataclasses

    import jax.numpy as jnp
    import optax

    cfg = CLIPConfig(
        text=CLIPTextConfig(
            vocab_size=64, hidden_size=32, num_layers=1, num_heads=2,
            intermediate_size=64, max_positions=8, eos_token_id=63,
        ),
        vision=CLIPVisionConfig(
            hidden_size=32, num_layers=1, num_heads=2, intermediate_size=64,
            image_size=32, patch_size=16,
        ),
        projection_dim=32,
    )
    model = FusionModel.create("clip", num_labels=2, fusion_dim=8, clip_config=cfg)
    model_u8 = dataclasses.replace(model, image_mean=MEAN, image_std=STD)
    params = model.init(jax.random.key(4))

    g = np.random.default_rng(4)
    B = 4
    ids = g.integers(1, 62, size=(B, 8)).astype(np.int32)
    ids[:, 5] = 63
    mask = np.ones((B, 8), np.int32)
    imgs_u8 = g.integers(0, 256, size=(B, 32, 32, 3), dtype=np.uint8)
    ones = np.ones((B,), np.float32)
    labels = (g.random((B, 2)) < 0.5).astype(np.float32)

    from multimodal_content_moderation_tpu.ops.pallas_image import extract_patches_u8

    common = {
        "input_ids": ids, "attention_mask": mask,
        "text_present": ones, "image_present": ones, "labels": labels,
    }
    b_px = dict(common, pixel_values=_u8_and_pixel(imgs_u8, MEAN, STD))
    b_u8 = dict(common, patches_u8=extract_patches_u8(imgs_u8, 16))

    tx = optax.sgd(1e-2)

    def one_step(mdl, batch):
        loss, grads = jax.value_and_grad(lambda p: mdl.apply(p, batch)["loss"])(params)
        updates, _ = tx.update(grads, tx.init(params), params)
        return float(loss), optax.apply_updates(params, updates)

    loss_px, p_px = one_step(model, b_px)
    loss_u8, p_u8 = one_step(model_u8, b_u8)
    assert abs(loss_px - loss_u8) < 1e-5
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(p_px),
        jax.tree_util.tree_leaves_with_path(p_u8),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4,
            err_msg=jax.tree_util.keystr(path),
        )


# ---------------------------------------------------------------------------
# Multi-chip (SPMD) fast engine — VERDICT r2 #1: the flagship u8/Pallas path
# must run over the data mesh, not leave N-1 chips idle.
# ---------------------------------------------------------------------------


def _tiny_fusion(seed=0):
    cfg = CLIPConfig(
        text=CLIPTextConfig(
            vocab_size=64, hidden_size=32, num_layers=2, num_heads=2,
            intermediate_size=64, max_positions=12, eos_token_id=63,
        ),
        vision=CLIPVisionConfig(
            hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64,
            image_size=32, patch_size=16,
        ),
        projection_dim=32,
    )
    model = FusionModel.create("clip", num_labels=3, fusion_dim=16, clip_config=cfg)
    return model, model.init(jax.random.key(seed))


def _tiny_batch(B=16, seed=0):
    g = np.random.default_rng(seed)
    ids = g.integers(1, 62, size=(B, 12)).astype(np.int32)
    ids[:, 7] = 63
    mask = np.ones((B, 12), np.int32)
    imgs_u8 = g.integers(0, 256, size=(B, 32, 32, 3), dtype=np.uint8)
    ones = np.ones((B,), np.float32)
    return ids, mask, imgs_u8, ones


def test_fast_engine_meshed_matches_single_device():
    """8-device data-mesh fast engine must produce the exact logits of the
    single-device engine (shard_map over the data axis is a pure reshard)."""
    from multimodal_content_moderation_tpu.parallel.mesh import build_mesh

    model, params = _tiny_fusion()
    ids, mask, imgs_u8, ones = _tiny_batch(B=16)

    single = FastInferenceEngine(model, params, MEAN, STD, use_pallas=False)
    patches = single.patches_from_hwc(imgs_u8)
    ref = np.asarray(single(ids, mask, patches, ones, ones))

    mesh = build_mesh()  # 8 x 1 on the virtual CPU mesh
    assert mesh.devices.size == 8
    meshed = FastInferenceEngine(
        model, params, MEAN, STD, use_pallas=False, mesh=mesh
    )
    got = np.asarray(meshed(ids, mask, patches, ones, ones))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)
    # params actually live replicated on all 8 devices
    leaf = jax.tree_util.tree_leaves(meshed.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_fast_engine_meshed_with_pallas_kernels():
    """Pallas patch-embed (interpret) + Pallas attention inside shard_map:
    the production kernel config composes with the data mesh (VERDICT r2 #2,
    DP half — each device runs the kernels on its local shard)."""
    import functools

    from multimodal_content_moderation_tpu.models import model_io
    from multimodal_content_moderation_tpu.ops import pallas_image
    from multimodal_content_moderation_tpu.parallel.mesh import build_mesh

    model, params = _tiny_fusion(seed=1)
    model = model_io.with_performance_options(model, attention_impl="pallas")
    ids, mask, imgs_u8, ones = _tiny_batch(B=16, seed=1)

    ref_engine = FastInferenceEngine(model, params, MEAN, STD, use_pallas=False)
    patches = ref_engine.patches_from_hwc(imgs_u8)
    ref = np.asarray(ref_engine(ids, mask, patches, ones, ones))

    mesh = build_mesh()
    orig = pallas_image.patch_embed_u8
    pallas_image.patch_embed_u8 = functools.partial(orig, interpret=True)
    try:
        meshed = FastInferenceEngine(
            model, params, MEAN, STD, use_pallas=True, mesh=mesh
        )
        got = np.asarray(meshed(ids, mask, patches, ones, ones))
    finally:
        pallas_image.patch_embed_u8 = orig
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_fast_engine_meshed_rejects_indivisible_batch():
    from multimodal_content_moderation_tpu.parallel.mesh import build_mesh

    model, params = _tiny_fusion()
    ids, mask, imgs_u8, ones = _tiny_batch(B=6)  # 6 % 8 != 0
    meshed = FastInferenceEngine(
        model, params, MEAN, STD, use_pallas=False, mesh=build_mesh()
    )
    patches = meshed.patches_from_hwc(imgs_u8)
    with pytest.raises(ValueError, match="not divisible"):
        meshed(ids, mask, patches, ones, ones)


def test_evaluate_logits_u8_on_mesh(tmp_path):
    """The streaming u8 eval loop end-to-end on the 8-device mesh: logits
    must match the single-device loop on the same synthetic dataset."""
    from multimodal_content_moderation_tpu.data.dataset import CSVDataset
    from multimodal_content_moderation_tpu.data.images import ImagePreprocessor
    from multimodal_content_moderation_tpu.models.fast_infer import (
        evaluate_logits_u8,
    )
    from multimodal_content_moderation_tpu.parallel.mesh import build_mesh

    import pandas as pd
    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    g = np.random.default_rng(0)
    rows = []
    for i in range(20):  # not a multiple of 8: exercises last-batch padding
        name = f"im{i}.png"
        Image.fromarray(
            g.integers(0, 256, size=(36, 40, 3), dtype=np.uint8)
        ).save(img_dir / name)
        rows.append(
            {"text": "aa bb" if i % 2 else "cc dd", "image_path": name,
             "labels": "racist" if i % 2 else "sexist"}
        )
    csv = tmp_path / "test.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)

    class StubTok:
        def encode_batch(self, texts, max_length):
            ids = np.full((len(texts), max_length), 1, np.int32)
            ids[:, -1] = 63
            return ids, np.ones((len(texts), max_length), np.int32)

        def __call__(self, texts, max_length):
            return self.encode_batch(texts, max_length)

    model, params = _tiny_fusion(seed=2)
    pre = ImagePreprocessor(32, 32, MEAN, STD, output="uint8_hwc")
    ds = CSVDataset(
        str(csv), str(img_dir), StubTok(), pre, 12,
        class_names=["racist", "sexist", "other"],
    )

    single = FastInferenceEngine(model, params, MEAN, STD, use_pallas=False)
    lg_ref, lb_ref = evaluate_logits_u8(single, ds, batch_size=8, num_workers=2)

    meshed = FastInferenceEngine(
        model, params, MEAN, STD, use_pallas=False, mesh=build_mesh()
    )
    lg, lb = evaluate_logits_u8(meshed, ds, batch_size=8, num_workers=2)
    np.testing.assert_allclose(lg, lg_ref, atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(lb, lb_ref)


# ---------------------------------------------------------------------------
# Length-sorted bucketed evaluation (seq_buckets): EXACT for CLIP because the
# text tower is causal and pools the first-EOS hidden state — positions past
# a row's EOS are dead compute (the reference always pays them, padding every
# row to 77: scripts/inference.py:168-180).
# ---------------------------------------------------------------------------


class _VarLenTok:
    """Stub tokenizer: token length = word count + BOS/EOS, like CLIP BPE."""

    def encode_batch(self, texts, max_length):
        ids = np.zeros((len(texts), max_length), np.int32)
        mask = np.zeros((len(texts), max_length), np.int32)
        for i, t in enumerate(texts):
            n = min(len((t or "x").split()) + 2, max_length)
            ids[i, : n - 1] = 1 + (i % 50)
            ids[i, n - 1] = 63  # EOS
            mask[i, :n] = 1
        return ids, mask

    def __call__(self, texts, max_length):
        return self.encode_batch(texts, max_length)


def test_clip_text_truncation_exact():
    """Slicing padded ids to any length >= the EOS position leaves the pooled
    text feature bit-unchanged (causal mask + EOS pooling)."""
    from multimodal_content_moderation_tpu.models.clip import clip_text_features

    cfg = CLIPConfig(
        text=CLIPTextConfig(
            vocab_size=64, hidden_size=32, num_layers=2, num_heads=2,
            intermediate_size=64, max_positions=16, eos_token_id=63,
        ),
        vision=CLIPVisionConfig(
            hidden_size=32, num_layers=1, num_heads=2, intermediate_size=64,
            image_size=32, patch_size=16,
        ),
        projection_dim=32,
    )
    model = FusionModel.create("clip", num_labels=2, fusion_dim=8, clip_config=cfg)
    params = model.init(jax.random.key(5))["backbone"]

    g = np.random.default_rng(5)
    B, T = 4, 16
    ids = np.zeros((B, T), np.int32)
    mask = np.zeros((B, T), np.int32)
    for i, n in enumerate([3, 5, 7, 8]):  # EOS at n-1, all < bucket 8
        ids[i, : n - 1] = g.integers(1, 62, size=n - 1)
        ids[i, n - 1] = 63
        mask[i, :n] = 1

    full = np.asarray(clip_text_features(params, ids, mask, cfg))
    cut = np.asarray(clip_text_features(params, ids[:, :8], mask[:, :8], cfg))
    np.testing.assert_allclose(cut, full, atol=1e-6, rtol=1e-6)


def _bucket_dataset(tmp_path, n=22):
    import pandas as pd
    from PIL import Image

    from multimodal_content_moderation_tpu.data.dataset import CSVDataset
    from multimodal_content_moderation_tpu.data.images import ImagePreprocessor

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    g = np.random.default_rng(7)
    rows = []
    for i in range(n):
        if i == 4:
            name = "missing.png"  # degradation path: zeros + present=0
        else:
            name = f"im{i}.png"
            Image.fromarray(
                g.integers(0, 256, size=(36, 40, 3), dtype=np.uint8)
            ).save(img_dir / name)
        words = " ".join(["w"] * (1 + (7 * i) % 9))  # lengths 3..11 tokens
        rows.append(
            {"text": words, "image_path": name,
             "labels": "racist" if i % 2 else "sexist"}
        )
    csv = tmp_path / "test.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    pre = ImagePreprocessor(32, 32, MEAN, STD, output="uint8_hwc")
    return CSVDataset(
        str(csv), str(img_dir), _VarLenTok(), pre, 12,
        class_names=["racist", "sexist", "other"],
    )


def test_evaluate_logits_u8_seq_buckets_exact(tmp_path):
    """Bucketed eval == unbucketed eval, rows back in natural CSV order,
    across mixed lengths, a missing image, and a padded last batch."""
    from multimodal_content_moderation_tpu.models.fast_infer import (
        evaluate_logits_u8,
    )

    ds = _bucket_dataset(tmp_path)
    model, params = _tiny_fusion(seed=3)
    engine = FastInferenceEngine(model, params, MEAN, STD, use_pallas=False)

    lg_ref, lb_ref = evaluate_logits_u8(engine, ds, batch_size=8, num_workers=2)
    lg, lb = evaluate_logits_u8(
        engine, ds, batch_size=8, num_workers=2, seq_buckets=(6, 8)
    )
    np.testing.assert_array_equal(lb, lb_ref)  # natural order restored
    np.testing.assert_allclose(lg, lg_ref, atol=1e-5, rtol=1e-5)


def test_evaluate_logits_u8_seq_buckets_on_mesh(tmp_path):
    """Buckets compose with the SPMD data-mesh engine."""
    from multimodal_content_moderation_tpu.models.fast_infer import (
        evaluate_logits_u8,
    )
    from multimodal_content_moderation_tpu.parallel.mesh import build_mesh

    ds = _bucket_dataset(tmp_path, n=24)
    model, params = _tiny_fusion(seed=4)
    single = FastInferenceEngine(model, params, MEAN, STD, use_pallas=False)
    lg_ref, _ = evaluate_logits_u8(single, ds, batch_size=8, num_workers=2)

    meshed = FastInferenceEngine(
        model, params, MEAN, STD, use_pallas=False, mesh=build_mesh()
    )
    lg, _ = evaluate_logits_u8(
        meshed, ds, batch_size=8, num_workers=2, seq_buckets=(8,)
    )
    np.testing.assert_allclose(lg, lg_ref, atol=1e-5, rtol=1e-5)


def _tiny_siglip_fusion(max_positions=16, seed=6):
    from multimodal_content_moderation_tpu.models.siglip import (
        SigLIPConfig,
        SigLIPTextConfig,
        SigLIPVisionConfig,
    )

    cfg = SigLIPConfig(
        text=SigLIPTextConfig(
            vocab_size=64, hidden_size=32, num_layers=2, num_heads=2,
            intermediate_size=64, max_positions=max_positions,
            projection_size=32,
        ),
        vision=SigLIPVisionConfig(
            hidden_size=32, num_layers=1, num_heads=2, intermediate_size=64,
            image_size=32, patch_size=16,
        ),
    )
    model = FusionModel.create("siglip", num_labels=3, fusion_dim=8, siglip_config=cfg)
    return model, model.init(jax.random.key(seed)), cfg


def test_siglip_text_carry_column_exact():
    """The SigLIP bucket trick at the feature level: b-1 real columns plus a
    PAD carry column at the full width's LAST position (mask 0) reproduces
    the full-width pooled text feature bit-for-bit — masked keys carry
    exactly-zero attention weight and per-position ops have no cross-talk."""
    from multimodal_content_moderation_tpu.models.fast_infer import (
        bucket_batch_text,
    )
    from multimodal_content_moderation_tpu.models.siglip import (
        siglip_text_features,
    )

    _, params, cfg = _tiny_siglip_fusion(max_positions=16)
    bp = params["backbone"]

    g = np.random.default_rng(8)
    B, T = 4, 12  # T < max_positions: the carry must use position T-1
    ids = np.zeros((B, T), np.int32)  # PAD id 0 everywhere past the row
    mask = np.zeros((B, T), np.int32)
    for i, n in enumerate([3, 5, 6, 7]):
        ids[i, :n] = g.integers(1, 63, size=n)
        mask[i, :n] = 1

    full = np.asarray(siglip_text_features(bp, ids, mask, cfg))

    b = 8  # covers max length 7 plus the carry column
    ids_b, mask_b, carry_pos = bucket_batch_text(ids, mask, b, "siglip")
    assert carry_pos == T - 1
    assert ids_b.shape == (B, b) and mask_b[:, -1].sum() == 0
    position_ids = np.concatenate(
        [np.arange(b - 1, dtype=np.int32), np.array([carry_pos], np.int32)]
    )
    cut = np.asarray(
        siglip_text_features(bp, ids_b, mask_b, cfg, position_ids=position_ids)
    )
    np.testing.assert_allclose(cut, full, atol=1e-6, rtol=1e-6)


def test_evaluate_logits_u8_seq_buckets_siglip_exact(tmp_path):
    """Bucketed SigLIP eval == unbucketed eval end-to-end (carry column +
    position override through the engine, rows back in natural order)."""
    from multimodal_content_moderation_tpu.models.fast_infer import (
        evaluate_logits_u8,
    )

    ds = _bucket_dataset(tmp_path)  # 12-wide text, lengths 3..11
    model, params, _ = _tiny_siglip_fusion(max_positions=16)
    engine = FastInferenceEngine(
        model, params, SIGLIP_MEAN, SIGLIP_STD, use_pallas=False
    )

    lg_ref, lb_ref = evaluate_logits_u8(engine, ds, batch_size=8, num_workers=2)
    lg, lb = evaluate_logits_u8(
        engine, ds, batch_size=8, num_workers=2, seq_buckets=(6, 8)
    )
    np.testing.assert_array_equal(lb, lb_ref)
    np.testing.assert_allclose(lg, lg_ref, atol=1e-5, rtol=1e-5)


def test_parse_seq_buckets_malformed_spec_message():
    """A malformed --seq_buckets spec must raise a ValueError that names the
    expected grammar, not a bare int() traceback (ADVICE r3)."""
    from multimodal_content_moderation_tpu.models.fast_infer import (
        parse_seq_buckets,
    )

    assert parse_seq_buckets("auto") == (32, 48, 64)
    assert parse_seq_buckets("off") is None
    assert parse_seq_buckets("16, 24") == (16, 24)
    for bad in ("32;48", "abc", "32,,48"):
        with pytest.raises(ValueError, match="comma-separated"):
            parse_seq_buckets(bad)
