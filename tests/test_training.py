"""Training-layer tests: metrics parity, sampling, optimizer groups,
multi-device train loop on the virtual 8-device CPU mesh, checkpoints."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_content_moderation_tpu.data.dataset import CSVDataset
from multimodal_content_moderation_tpu.data.images import ImagePreprocessor
from multimodal_content_moderation_tpu.data.tokenizer import (
    bytes_to_unicode,
    load_tokenizer,
)
from multimodal_content_moderation_tpu.models import CLIPConfig, FusionModel
from multimodal_content_moderation_tpu.models.clip import CLIPTextConfig, CLIPVisionConfig
from multimodal_content_moderation_tpu.parallel.mesh import build_mesh, shard_batch
from multimodal_content_moderation_tpu.training.checkpoints import (
    list_checkpoints,
    restore_checkpoint,
    save_checkpoint,
)
from multimodal_content_moderation_tpu.training.loop import TrainArgs, Trainer
from multimodal_content_moderation_tpu.training.metrics import (
    calibrate_thresholds,
    compute_detailed_metrics,
    make_compute_metrics_mtl,
    make_compute_metrics_multi,
)
from multimodal_content_moderation_tpu.training.optim import build_optimizer
from multimodal_content_moderation_tpu.training.sampling import (
    build_multilabel_sample_weights,
    weighted_sample_indices,
)


# ---------------------------------------------------------------------------
# Metrics
# ---------------------------------------------------------------------------


def test_compute_metrics_multi_against_sklearn():
    from sklearn.metrics import f1_score, roc_auc_score

    g = np.random.default_rng(0)
    logits = g.normal(size=(100, 5)).astype(np.float32)
    labels = (g.random(size=(100, 5)) < 0.3).astype(np.float32)
    m = make_compute_metrics_multi(5)((logits, labels))
    probs = 1 / (1 + np.exp(-logits))
    preds = (probs >= 0.5).astype(int)
    assert m["f1_macro"] == pytest.approx(
        f1_score(labels, preds, average="macro", zero_division=0)
    )
    assert m["roc_macro"] == pytest.approx(roc_auc_score(labels, probs, average="macro"))


def test_compute_metrics_mtl_per_task_keys():
    g = np.random.default_rng(1)
    logits = g.normal(size=(50, 3)).astype(np.float32)
    labels = (g.random(size=(50, 3)) < 0.4).astype(np.float32)
    m = make_compute_metrics_mtl(["a", "b", "c"])((logits, labels))
    for k in ["f1_macro", "f1_micro", "roc_macro", "f1_a", "roc_a", "f1_b", "f1_c"]:
        assert k in m


def test_calibrate_thresholds_finds_optimum():
    # class 0: perfectly separable at 0.5; class 1: no positives -> 0.5 default
    probs = np.array([[0.9, 0.1], [0.8, 0.2], [0.2, 0.3], [0.1, 0.4]])
    y = np.array([[1, 0], [1, 0], [0, 0], [0, 0]], dtype=float)
    ths = calibrate_thresholds(probs, y)
    assert y[:, 1].sum() == 0 and ths[1] == 0.5
    preds = (probs[:, 0] >= ths[0]).astype(int)
    np.testing.assert_array_equal(preds, y[:, 0])


def test_detailed_metrics_schema():
    g = np.random.default_rng(2)
    probs = g.random(size=(40, 2))
    y = (g.random(size=(40, 2)) < 0.5).astype(float)
    m = compute_detailed_metrics(probs, y, 0.5, ["x", "y"])
    assert set(m["per_class"].keys()) == {"x", "y"}
    for k in ["f1", "precision", "recall", "support", "roc_auc"]:
        assert k in m["per_class"]["x"]


# ---------------------------------------------------------------------------
# Sampling
# ---------------------------------------------------------------------------


def test_sample_weights_match_torch_reference_formula():
    torch = pytest.importorskip("torch")
    g = np.random.default_rng(3)
    labels = (g.random(size=(64, 5)) < 0.2).astype(np.float32)
    got = build_multilabel_sample_weights(labels)

    lt = torch.tensor(labels)
    beta = 0.999
    pos_counts = lt.sum(dim=0).clamp(min=1.0)
    eff_num = 1.0 - torch.pow(torch.tensor(beta), pos_counts)
    cls_w = (1.0 - beta) / eff_num
    w = (lt * cls_w.unsqueeze(0)).sum(dim=1)
    min_pos = float(w[w > 0].min()) if (w > 0).any() else 1.0
    ref = torch.where(w > 0, w, torch.full_like(w, min_pos * 0.1)).double().numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-4)


def test_weighted_sampling_prefers_rare_classes():
    labels = np.zeros((1000, 2), np.float32)
    labels[:900, 0] = 1.0  # common class
    labels[900:, 1] = 1.0  # rare class
    w = build_multilabel_sample_weights(labels)
    idx = weighted_sample_indices(w, 20000, seed=0)
    rare_frac = float(np.mean(idx >= 900))
    assert rare_frac > 0.3  # rare 10% of data but >30% of samples


# ---------------------------------------------------------------------------
# Optimizer
# ---------------------------------------------------------------------------


def test_two_group_optimizer_lrs_differ():
    params = {
        "backbone": {"w": jnp.ones((4, 4))},
        "head": {"w": jnp.ones((4, 4))},
    }
    tx = build_optimizer(
        params, lr_encoder=1e-5, lr_head=1e-2, weight_decay=0.0,
        total_steps=10, warmup_ratio=0.0, schedule="constant", max_grad_norm=0.0,
    )
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    enc_step = float(jnp.abs(updates["backbone"]["w"]).mean())
    head_step = float(jnp.abs(updates["head"]["w"]).mean())
    assert head_step / enc_step > 100  # 1e-2 vs 1e-5 adam steps


# ---------------------------------------------------------------------------
# End-to-end tiny training on the 8-device mesh
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("train")
    # tokenizer assets
    b2u = bytes_to_unicode()
    vocab = {}
    for ch in b2u.values():
        vocab[ch] = len(vocab)
    for ch in b2u.values():
        vocab[ch + "</w>"] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    with open(d / "vocab.json", "w") as f:
        json.dump(vocab, f)
    with open(d / "merges.txt", "w") as f:
        f.write("#version: 0.2\n")
    tok = load_tokenizer(str(d))

    # synthetic CSV: label correlates with text token ("aa" vs "bb")
    import pandas as pd

    rows = []
    g = np.random.default_rng(0)
    for i in range(64):
        pos = i % 2 == 0
        rows.append(
            {
                "text": "aa aa aa" if pos else "bb bb bb",
                "image_path": "",
                "labels": "racist" if pos else "sexist",
            }
        )
    pd.DataFrame(rows).to_csv(d / "train.csv", index=False)
    pd.DataFrame(rows[:32]).to_csv(d / "val.csv", index=False)

    cfg = CLIPConfig(
        text=CLIPTextConfig(
            vocab_size=len(vocab), hidden_size=32, num_layers=1, num_heads=2,
            intermediate_size=64, max_positions=16,
            eos_token_id=vocab["<|endoftext|>"],
        ),
        vision=CLIPVisionConfig(
            hidden_size=32, num_layers=1, num_heads=2, intermediate_size=64,
            image_size=16, patch_size=8,
        ),
        projection_dim=32,
    )
    model = FusionModel.create("clip", num_labels=2, fusion_dim=16, clip_config=cfg)
    names = ["racist", "sexist"]
    pp = ImagePreprocessor(16, 16)
    train_ds = CSVDataset(str(d / "train.csv"), "", tok, pp, 16, class_names=names)
    val_ds = CSVDataset(str(d / "val.csv"), "", tok, pp, 16, class_names=names)
    return d, model, train_ds, val_ds


def test_mesh_has_8_devices():
    mesh = build_mesh()
    assert mesh.devices.size == 8


@pytest.mark.slow
def test_trainer_end_to_end(tiny_setup, tmp_path):
    d, model, train_ds, val_ds = tiny_setup
    args = TrainArgs(
        output_dir=str(tmp_path / "out"),
        num_train_epochs=3,
        per_device_train_batch_size=16,
        per_device_eval_batch_size=16,
        lr_encoder=1e-3,
        lr_head=1e-2,
        logging_steps=1,
        early_stopping=False,
        seed=0,
    )
    params = model.init(jax.random.key(0))
    trainer = Trainer(
        model, params, args, train_ds, val_ds,
        make_compute_metrics_multi(2), mesh=build_mesh(),
    )
    first_eval = trainer.evaluate()
    result = trainer.train()
    final_eval = trainer.evaluate()
    # learnable signal: text token decides label 0 -> roc should become ~1
    assert final_eval["roc_macro"] >= first_eval["roc_macro"]
    assert final_eval["roc_macro"] > 0.9
    assert result["best_checkpoint"] is not None
    assert os.path.isdir(result["best_checkpoint"])
    # save_total_limit respected
    assert len(list_checkpoints(args.output_dir)) <= args.save_total_limit + 1


@pytest.mark.slow
def test_trainer_weighted_sampler_runs(tiny_setup, tmp_path):
    d, model, train_ds, val_ds = tiny_setup
    args = TrainArgs(
        output_dir=str(tmp_path / "out_w"),
        num_train_epochs=1,
        per_device_train_batch_size=16,
        per_device_eval_batch_size=16,
        sampler="weighted",
        early_stopping=False,
        seed=0,
    )
    params = model.init(jax.random.key(1))
    trainer = Trainer(
        model, params, args, train_ds, val_ds, make_compute_metrics_multi(2)
    )
    result = trainer.train()
    assert result["global_step"] == 4  # 64/16


def test_checkpoint_roundtrip(tmp_path):
    params = {
        "backbone": {"w": jnp.arange(12, dtype=jnp.float32).reshape(3, 4)},
        "head": [{"b": jnp.ones((2,))}, {"b": jnp.zeros((2,))}],
    }
    p1 = save_checkpoint(str(tmp_path), params, 10, save_total_limit=2)
    save_checkpoint(str(tmp_path), params, 20, save_total_limit=2)
    save_checkpoint(str(tmp_path), params, 30, save_total_limit=2, keep=p1)
    ckpts = list_checkpoints(str(tmp_path))
    # step-10 kept (best), oldest prunable (20) dropped
    assert [os.path.basename(c) for c in ckpts] == ["checkpoint-10", "checkpoint-30"]
    zeroed = jax.tree_util.tree_map(jnp.zeros_like, params)
    restored = restore_checkpoint(p1, zeroed)
    np.testing.assert_array_equal(
        np.asarray(restored["backbone"]["w"]), np.asarray(params["backbone"]["w"])
    )


def test_shard_batch_places_on_mesh(tiny_setup):
    _, model, train_ds, _ = tiny_setup
    mesh = build_mesh()
    batch = next(train_ds.batches(16))
    dev = shard_batch(batch, mesh)
    sh = dev["pixel_values"].sharding
    assert sh.is_fully_replicated is False
    assert dev["pixel_values"].shape == batch["pixel_values"].shape


def test_frozen_encoder_gets_zero_updates():
    import optax

    params = {
        "backbone": {
            "text_model": {"w": jnp.ones((4, 4))},
            "vision_model": {"w": jnp.ones((4, 4))},
        },
        "head": {"w": jnp.ones((4, 4))},
    }
    tx = build_optimizer(
        params, lr_encoder=1e-3, lr_head=1e-3, weight_decay=0.0,
        total_steps=10, warmup_ratio=0.0, schedule="constant",
        max_grad_norm=0.0, freeze_text=True,
    )
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["backbone"]["text_model"]["w"]).max()) == 0.0
    assert float(jnp.abs(updates["backbone"]["vision_model"]["w"]).max()) > 0.0
    assert float(jnp.abs(updates["head"]["w"]).max()) > 0.0


def test_remat_forward_and_grad_match():
    """Gradient checkpointing must not change values or gradients."""
    import dataclasses

    from multimodal_content_moderation_tpu.models import CLIPConfig, FusionModel
    from multimodal_content_moderation_tpu.models.clip import (
        CLIPTextConfig,
        CLIPVisionConfig,
    )

    cfg = CLIPConfig(
        text=CLIPTextConfig(vocab_size=64, hidden_size=16, num_layers=2, num_heads=2,
                            intermediate_size=32, max_positions=8, eos_token_id=63),
        vision=CLIPVisionConfig(hidden_size=16, num_layers=2, num_heads=2,
                                intermediate_size=32, image_size=16, patch_size=8),
        projection_dim=16,
    )
    cfg_r = dataclasses.replace(
        cfg,
        text=dataclasses.replace(cfg.text, remat=True),
        vision=dataclasses.replace(cfg.vision, remat=True),
    )
    m1 = FusionModel.create("clip", num_labels=2, fusion_dim=8, clip_config=cfg)
    m2 = FusionModel.create("clip", num_labels=2, fusion_dim=8, clip_config=cfg_r)
    params = m1.init(jax.random.key(0))
    g = np.random.default_rng(0)
    batch = {
        "input_ids": g.integers(1, 63, size=(4, 8)),
        "attention_mask": np.ones((4, 8), np.int32),
        "pixel_values": g.normal(size=(4, 3, 16, 16)).astype(np.float32),
        "text_present": np.ones((4,), np.float32),
        "image_present": np.ones((4,), np.float32),
        "labels": (g.random((4, 2)) < 0.5).astype(np.float32),
    }
    l1, g1 = jax.value_and_grad(lambda p: m1.apply(p, batch)["loss"])(params)
    l2, g2 = jax.value_and_grad(lambda p: m2.apply(p, batch)["loss"])(params)
    assert float(l1) == pytest.approx(float(l2), abs=1e-6)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), g1, g2
    )
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-5


def test_pallas_attention_grad_matches_xla():
    """training.attention: pallas (attention_nhd_diff custom VJP) must give
    the XLA path's loss AND parameter gradients through a full model."""
    import dataclasses

    from multimodal_content_moderation_tpu.models import CLIPConfig, FusionModel
    from multimodal_content_moderation_tpu.models.clip import (
        CLIPTextConfig,
        CLIPVisionConfig,
    )

    cfg = CLIPConfig(
        text=CLIPTextConfig(vocab_size=64, hidden_size=16, num_layers=2, num_heads=2,
                            intermediate_size=32, max_positions=8, eos_token_id=63),
        vision=CLIPVisionConfig(hidden_size=16, num_layers=2, num_heads=2,
                                intermediate_size=32, image_size=16, patch_size=8),
        projection_dim=16,
    )
    cfg_p = dataclasses.replace(
        cfg,
        text=dataclasses.replace(cfg.text, attention_impl="pallas"),
        vision=dataclasses.replace(cfg.vision, attention_impl="pallas"),
    )
    m1 = FusionModel.create("clip", num_labels=2, fusion_dim=8, clip_config=cfg)
    m2 = FusionModel.create("clip", num_labels=2, fusion_dim=8, clip_config=cfg_p)
    params = m1.init(jax.random.key(0))
    g = np.random.default_rng(0)
    batch = {
        "input_ids": g.integers(1, 63, size=(4, 8)),
        "attention_mask": np.ones((4, 8), np.int32),
        "pixel_values": g.normal(size=(4, 3, 16, 16)).astype(np.float32),
        "text_present": np.ones((4,), np.float32),
        "image_present": np.ones((4,), np.float32),
        "labels": (g.random((4, 2)) < 0.5).astype(np.float32),
    }
    l1, g1 = jax.value_and_grad(lambda p: m1.apply(p, batch)["loss"])(params)
    l2, g2 = jax.value_and_grad(lambda p: m2.apply(p, batch)["loss"])(params)
    assert float(l1) == pytest.approx(float(l2), abs=1e-6)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), g1, g2
    )
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-5


def test_pallas_attention_grad_under_remat():
    """gradient_checkpointing (cfg.remat) + the custom-VJP Pallas attention
    must compose: remat recomputes the kernel forward, then the custom
    backward kernel runs — grads must equal the plain XLA path's."""
    import dataclasses

    from multimodal_content_moderation_tpu.models import CLIPConfig, FusionModel
    from multimodal_content_moderation_tpu.models.clip import (
        CLIPTextConfig,
        CLIPVisionConfig,
    )

    cfg = CLIPConfig(
        text=CLIPTextConfig(vocab_size=64, hidden_size=16, num_layers=2, num_heads=2,
                            intermediate_size=32, max_positions=8, eos_token_id=63),
        vision=CLIPVisionConfig(hidden_size=16, num_layers=2, num_heads=2,
                                intermediate_size=32, image_size=16, patch_size=8),
        projection_dim=16,
    )
    cfg_pr = dataclasses.replace(
        cfg,
        text=dataclasses.replace(cfg.text, attention_impl="pallas", remat=True),
        vision=dataclasses.replace(cfg.vision, attention_impl="pallas", remat=True),
    )
    m1 = FusionModel.create("clip", num_labels=2, fusion_dim=8, clip_config=cfg)
    m2 = FusionModel.create("clip", num_labels=2, fusion_dim=8, clip_config=cfg_pr)
    params = m1.init(jax.random.key(0))
    g = np.random.default_rng(0)
    batch = {
        "input_ids": g.integers(1, 63, size=(4, 8)),
        "attention_mask": np.ones((4, 8), np.int32),
        "pixel_values": g.normal(size=(4, 3, 16, 16)).astype(np.float32),
        "text_present": np.ones((4,), np.float32),
        "image_present": np.ones((4,), np.float32),
        "labels": (g.random((4, 2)) < 0.5).astype(np.float32),
    }
    l1, g1 = jax.value_and_grad(lambda p: m1.apply(p, batch)["loss"])(params)
    l2, g2 = jax.value_and_grad(lambda p: m2.apply(p, batch)["loss"])(params)
    assert float(l1) == pytest.approx(float(l2), abs=1e-6)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), g1, g2
    )
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-5


@pytest.mark.slow
def test_trainer_resume_from_checkpoint(tiny_setup, tmp_path):
    """Train 1 epoch, resume 'auto', finish a second epoch — loop counters,
    optimizer state, and best-metric tracking survive the round trip."""
    d, model, train_ds, val_ds = tiny_setup
    out = str(tmp_path / "resume")
    common = dict(
        output_dir=out,
        per_device_train_batch_size=16,
        per_device_eval_batch_size=16,
        lr_encoder=1e-3,
        lr_head=1e-2,
        early_stopping=False,
        seed=0,
    )
    args1 = TrainArgs(num_train_epochs=1, **common)
    params = model.init(jax.random.key(0))
    t1 = Trainer(model, params, args1, train_ds, val_ds, make_compute_metrics_multi(2))
    r1 = t1.train()
    assert r1["global_step"] == 4

    args2 = TrainArgs(num_train_epochs=2, resume_from_checkpoint="auto", **common)
    t2 = Trainer(model, model.init(jax.random.key(9)), args2, train_ds, val_ds,
                 make_compute_metrics_multi(2))
    assert t2.start_epoch == 1  # resumed past epoch 0
    r2 = t2.train()
    assert r2["global_step"] == 8  # continued, not restarted


@pytest.mark.slow
def test_tensorboard_event_file_written(tiny_setup, tmp_path):
    d, model, train_ds, val_ds = tiny_setup
    out = str(tmp_path / "tb")
    args = TrainArgs(
        output_dir=out, num_train_epochs=1, per_device_train_batch_size=16,
        per_device_eval_batch_size=16, logging_steps=1, early_stopping=False,
        report_to="tensorboard", seed=0,
    )
    t = Trainer(model, model.init(jax.random.key(0)), args, train_ds, val_ds,
                make_compute_metrics_multi(2))
    t.train()
    import glob

    files = glob.glob(os.path.join(out, "logs", "events.out.tfevents.*"))
    assert files, "no event file written"
    # file must carry the TFRecord magic framing + our tags
    data = open(files[0], "rb").read()
    assert b"brain.Event:2" in data
    assert b"train/loss" in data
    assert b"eval/roc_macro" in data


@pytest.mark.slow
def test_gradient_accumulation_updates_every_k(tiny_setup, tmp_path):
    """With accumulation k=2, params change only every 2nd micro-step and the
    applied update equals the mean-gradient step."""
    d, model, train_ds, val_ds = tiny_setup
    args = TrainArgs(
        output_dir=str(tmp_path / "ga"),
        num_train_epochs=1,
        per_device_train_batch_size=16,
        per_device_eval_batch_size=16,
        gradient_accumulation_steps=2,
        lr_head=1e-2,
        lr_encoder=1e-3,
        early_stopping=False,
        seed=0,
    )
    params = model.init(jax.random.key(0))
    t = Trainer(model, params, args, train_ds, val_ds, make_compute_metrics_multi(2))
    p0 = jax.tree_util.tree_leaves(t.params)[0].copy()

    gen = t.train_ds.batches(16, drop_last=True, indices=np.arange(64))
    from multimodal_content_moderation_tpu.parallel.mesh import shard_batch

    b1 = shard_batch(next(gen), t.mesh)
    t.params, t.opt_state, t.rng, _ = t.train_step(t.params, t.opt_state, t.rng, b1)
    p_after_1 = jax.tree_util.tree_leaves(t.params)[0]
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p_after_1))  # held

    b2 = shard_batch(next(gen), t.mesh)
    t.params, t.opt_state, t.rng, _ = t.train_step(t.params, t.opt_state, t.rng, b2)
    p_after_2 = jax.tree_util.tree_leaves(t.params)[0]
    assert not np.array_equal(np.asarray(p0), np.asarray(p_after_2))  # applied


def test_bf16_compute_dtype_close_to_fp32():
    import dataclasses

    from multimodal_content_moderation_tpu.models.clip import (
        CLIPTextConfig,
        CLIPVisionConfig,
    )

    cfg = CLIPConfig(
        text=CLIPTextConfig(vocab_size=64, hidden_size=32, num_layers=2, num_heads=2,
                            intermediate_size=64, max_positions=8, eos_token_id=63),
        vision=CLIPVisionConfig(hidden_size=32, num_layers=2, num_heads=2,
                                intermediate_size=64, image_size=16, patch_size=8),
        projection_dim=32,
    )
    cfg_bf = dataclasses.replace(
        cfg,
        text=dataclasses.replace(cfg.text, compute_dtype="bfloat16"),
        vision=dataclasses.replace(cfg.vision, compute_dtype="bfloat16"),
    )
    m32 = FusionModel.create("clip", num_labels=2, fusion_dim=16, clip_config=cfg)
    mbf = FusionModel.create("clip", num_labels=2, fusion_dim=16, clip_config=cfg_bf)
    params = m32.init(jax.random.key(0))
    g = np.random.default_rng(0)
    batch = {
        "input_ids": g.integers(1, 63, size=(4, 8)),
        "attention_mask": np.ones((4, 8), np.int32),
        "pixel_values": g.normal(size=(4, 3, 16, 16)).astype(np.float32),
        "text_present": np.ones((4,), np.float32),
        "image_present": np.ones((4,), np.float32),
    }
    l32 = np.asarray(m32.apply(params, batch)["logits"])
    lbf = np.asarray(mbf.apply(params, batch)["logits"])
    # bf16 compute, fp32 master params: logits agree to bf16 tolerance
    assert np.abs(l32 - lbf).max() < 0.05


# ---------------------------------------------------------------------------
# bf16 optimizer accumulators (VERDICT r2 #6)
# ---------------------------------------------------------------------------


def test_scale_by_adam_compact_fp32_matches_optax_adamw():
    import jax
    import jax.numpy as jnp
    import optax

    from multimodal_content_moderation_tpu.training.optim import (
        scale_by_adam_compact,
    )

    params = {"w": jnp.linspace(-1.0, 1.0, 32).reshape(4, 8),
              "b": jnp.ones((8,)) * 0.3}
    ref = optax.adamw(1e-3, weight_decay=0.01)
    mine = optax.chain(
        scale_by_adam_compact(0.9, 0.999, 1e-8, "float32"),
        optax.add_decayed_weights(0.01),
        optax.scale_by_learning_rate(1e-3),
    )
    p_ref, s_ref = dict(params), ref.init(params)
    p_my, s_my = dict(params), mine.init(params)
    g = np.random.default_rng(0)
    for i in range(5):
        grads = {
            "w": jnp.asarray(g.normal(size=(4, 8)), jnp.float32),
            "b": jnp.asarray(g.normal(size=(8,)), jnp.float32),
        }
        u, s_ref = ref.update(grads, s_ref, p_ref)
        p_ref = optax.apply_updates(p_ref, u)
        u, s_my = mine.update(grads, s_my, p_my)
        p_my = optax.apply_updates(p_my, u)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(p_my[k]), np.asarray(p_ref[k]), atol=1e-6, rtol=1e-6
        )


def test_bf16_accumulators_state_dtype_and_closeness():
    import jax
    import jax.numpy as jnp

    from multimodal_content_moderation_tpu.training.optim import build_optimizer

    params = {
        "backbone": {"text_model": {"w": jnp.ones((16, 16)) * 0.1}},
        "head": {"w": jnp.ones((16, 4)) * 0.2},
    }
    tx16 = build_optimizer(
        params, total_steps=10, accumulator_dtype="bfloat16"
    )
    tx32 = build_optimizer(params, total_steps=10)
    s16, s32 = tx16.init(params), tx32.init(params)
    # every m/v leaf carried in bf16 (the only >0-d state arrays)
    dtypes = {
        np.dtype(l.dtype)
        for l in jax.tree_util.tree_leaves(s16)
        if hasattr(l, "dtype") and l.ndim > 0
    }
    assert dtypes == {np.dtype(jnp.bfloat16)}, dtypes

    p16, p32 = params, params
    g = np.random.default_rng(1)
    import optax

    for i in range(5):
        grads = jax.tree_util.tree_map(
            lambda p: jnp.asarray(g.normal(size=p.shape), jnp.float32), params
        )
        u, s16 = tx16.update(grads, s16, p16)
        p16 = optax.apply_updates(p16, u)
        u, s32 = tx32.update(grads, s32, p32)
        p32 = optax.apply_updates(p32, u)
    # bf16 rounding on the moments perturbs the trajectory only slightly
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_leaves_with_path(p16),
        jax.tree_util.tree_leaves_with_path(p32),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3, rtol=5e-2,
            err_msg=jax.tree_util.keystr(ka),
        )


def test_trainer_with_bf16_accumulators_steps(tmp_path):
    """TrainArgs.accumulator_dtype wires through to the optimizer: the
    train step runs and the carried m/v state is bf16."""
    import jax
    import jax.numpy as jnp

    from multimodal_content_moderation_tpu.models import CLIPConfig, FusionModel
    from multimodal_content_moderation_tpu.models.clip import (
        CLIPTextConfig,
        CLIPVisionConfig,
    )
    from multimodal_content_moderation_tpu.parallel.mesh import build_mesh, shard_batch
    from multimodal_content_moderation_tpu.training.loop import TrainArgs, Trainer

    cfg = CLIPConfig(
        text=CLIPTextConfig(
            vocab_size=64, hidden_size=32, num_layers=1, num_heads=2,
            intermediate_size=64, max_positions=8, eos_token_id=63,
        ),
        vision=CLIPVisionConfig(
            hidden_size=32, num_layers=1, num_heads=2, intermediate_size=64,
            image_size=16, patch_size=8,
        ),
        projection_dim=32,
    )
    model = FusionModel.create("clip", num_labels=3, fusion_dim=16, clip_config=cfg)
    params = model.init(jax.random.key(0))

    class FakeDS:
        labels = np.zeros((8, 3), np.float32)

        def __len__(self):
            return 8

    trainer = Trainer(
        model, params,
        TrainArgs(output_dir=str(tmp_path), accumulator_dtype="bfloat16"),
        FakeDS(), FakeDS(), compute_metrics=lambda x: {},
        mesh=build_mesh(1, 1, devices=jax.devices()[:1]),
    )
    moment_dtypes = {
        np.dtype(l.dtype)
        for l in jax.tree_util.tree_leaves(trainer.opt_state)
        if hasattr(l, "dtype") and getattr(l, "ndim", 0) > 0
    }
    assert np.dtype(jnp.bfloat16) in moment_dtypes

    g = np.random.default_rng(0)
    ids = g.integers(1, 62, (8, 8)).astype(np.int32)
    ids[:, -1] = 63
    batch = shard_batch(
        {
            "input_ids": ids,
            "attention_mask": np.ones((8, 8), np.int32),
            "pixel_values": g.normal(size=(8, 3, 16, 16)).astype(np.float32),
            "text_present": np.ones((8,), np.float32),
            "image_present": np.ones((8,), np.float32),
            "labels": (g.random((8, 3)) < 0.4).astype(np.float32),
        },
        trainer.mesh,
    )
    p, o, r, loss = trainer.train_step(
        trainer.params, trainer.opt_state, trainer.rng, batch
    )
    assert np.isfinite(float(loss))
