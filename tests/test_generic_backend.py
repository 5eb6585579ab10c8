"""Generic (``AutoModel``-equivalent) dual-encoder backend parity vs torch.

The reference loads *any* CLIP-like dual encoder via ``AutoModel``
(src/models/fusion.py:110-120) and pools with pooler-or-mean fallbacks
(src/models/multitask.py:130-154). The canonical "third architecture" is HF
``VisionTextDualEncoderModel`` (ViT vision + BERT text) — previously this
framework rejected it; ``models/generic.py`` now loads it. These tests pin:

- ``resolve_backend("auto")`` dispatch on a VTDE ``config.json``
- feature-level logit parity vs the torch model (projected
  ``get_text_features``/``get_image_features`` and raw pooler towers)
- the plain-mean fallback for pooler-less towers (multitask.py:141 —
  unmasked ``.mean(dim=1)``)
- a full fusion forward through ``init_from_encoder_dir``
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from multimodal_content_moderation_tpu.models import model_io
from multimodal_content_moderation_tpu.models.generic import (
    GenericDualConfig,
    bert_tower_from_torch,
    distilbert_tower_from_torch,
    generic_image_features,
    generic_params_from_torch,
    generic_text_features,
    generic_text_pooled,
    generic_vision_pooled,
)

TINY_BERT = dict(
    model_type="bert",
    vocab_size=200,
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=2,
    intermediate_size=64,
    max_position_embeddings=64,
    type_vocab_size=2,
    pad_token_id=0,
    hidden_act="gelu",
    layer_norm_eps=1e-12,
)
TINY_VIT = dict(
    model_type="vit",
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=2,
    intermediate_size=64,
    image_size=32,
    patch_size=16,
    num_channels=3,
    hidden_act="gelu",
    layer_norm_eps=1e-12,
)


@pytest.fixture(scope="module")
def vtde(tmp_path_factory):
    """Tiny VisionTextDualEncoderModel saved to a local dir (the offline
    stand-in for an AutoModel hub checkpoint)."""
    torch.manual_seed(0)
    cfg = transformers.VisionTextDualEncoderConfig.from_vision_text_configs(
        transformers.ViTConfig(**{k: v for k, v in TINY_VIT.items() if k != "model_type"}),
        transformers.BertConfig(**{k: v for k, v in TINY_BERT.items() if k != "model_type"}),
        projection_dim=24,
    )
    model = transformers.VisionTextDualEncoderModel(cfg).eval()
    d = tmp_path_factory.mktemp("vtde")
    model.save_pretrained(d, safe_serialization=True)
    with open(d / "preprocessor_config.json", "w") as f:
        json.dump(
            {"size": 32, "image_mean": [0.5] * 3, "image_std": [0.5] * 3}, f
        )
    # WordPiece tokenizer assets (tokenizer.json drives data/tokenizer_json)
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
        f"tok{i}" for i in range(50)
    ] + ["hello", "world", "hate", "meme"]
    vfile = d / "vocab.txt"
    vfile.write_text("\n".join(vocab))
    tok = transformers.BertTokenizerFast(vocab_file=str(vfile))
    tok.save_pretrained(d)
    return model, str(d)


def _inputs(B=3, T=12, seed=1):
    g = np.random.default_rng(seed)
    ids = g.integers(5, 59, size=(B, T)).astype(np.int64)
    ids[:, 0] = 2  # [CLS]
    mask = np.ones((B, T), np.int64)
    mask[1, 8:] = 0
    ids[1, 8:] = 0
    px = g.normal(size=(B, 3, 32, 32)).astype(np.float32)
    return ids, mask, px


def test_resolve_backend_generic_dispatch(vtde):
    _, d = vtde
    assert model_io.resolve_backend(d, "auto") == "generic"
    # clip/siglip strings remain untouched
    assert model_io.resolve_backend(d, "clip") == "clip"
    cfg = model_io.load_encoder_config(d, "generic")
    assert isinstance(cfg, GenericDualConfig)
    assert cfg.projection_dim == 24
    assert cfg.text.hidden_size == 32 and cfg.vision.patch_size == 16


def test_generic_projected_features_match_torch(vtde):
    """get_text_features / get_image_features parity (the reference fusion
    backend path: pooled tower -> bias-free projection)."""
    model, d = vtde
    cfg = model_io.load_encoder_config(d, "generic")
    sd = {k: v for k, v in model.state_dict().items()}
    params = jax.tree_util.tree_map(
        jnp.asarray, generic_params_from_torch(sd, cfg)
    )
    ids, mask, px = _inputs()
    with torch.no_grad():
        t_ref = model.get_text_features(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).numpy()
        v_ref = model.get_image_features(pixel_values=torch.tensor(px)).numpy()
    t = np.asarray(generic_text_features(params, jnp.asarray(ids), jnp.asarray(mask), cfg))
    v = np.asarray(generic_image_features(params, jnp.asarray(px), cfg))
    np.testing.assert_allclose(t, t_ref, atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(v, v_ref, atol=2e-5, rtol=1e-5)


def test_generic_raw_tower_pooling_matches_torch(vtde):
    """MTL auto path: raw towers, pooler_output (multitask.py:130-154)."""
    model, d = vtde
    cfg = model_io.load_encoder_config(d, "generic")
    sd = {k: v for k, v in model.state_dict().items()}
    params = jax.tree_util.tree_map(
        jnp.asarray, generic_params_from_torch(sd, cfg)
    )
    ids, mask, px = _inputs(seed=2)
    with torch.no_grad():
        t_ref = model.text_model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).pooler_output.numpy()
        v_ref = model.vision_model(
            pixel_values=torch.tensor(px)
        ).pooler_output.numpy()
    t = np.asarray(generic_text_pooled(params, jnp.asarray(ids), jnp.asarray(mask), cfg.text))
    v = np.asarray(generic_vision_pooled(params, jnp.asarray(px), cfg.vision))
    np.testing.assert_allclose(t, t_ref, atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(v, v_ref, atol=2e-5, rtol=1e-5)


def test_generic_mean_pool_fallback_matches_torch():
    """Pooler-less tower -> the reference's PLAIN (unmasked) mean over
    last_hidden_state (multitask.py:141)."""
    import dataclasses

    torch.manual_seed(3)
    bcfg = transformers.BertConfig(
        **{k: v for k, v in TINY_BERT.items() if k != "model_type"}
    )
    bert = transformers.BertModel(bcfg, add_pooling_layer=False).eval()
    cfg = GenericDualConfig.from_dict(
        {"text_config": TINY_BERT, "vision_config": TINY_VIT}
    )
    tcfg = dataclasses.replace(cfg.text, pooling="mean")
    params = {
        "text_model": jax.tree_util.tree_map(
            jnp.asarray,
            bert_tower_from_torch(bert.state_dict(), tcfg, prefix=""),
        )
    }
    ids, mask, _ = _inputs(seed=4)
    with torch.no_grad():
        ref = (
            bert(input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask))
            .last_hidden_state.mean(dim=1)
            .numpy()
        )
    got = np.asarray(
        generic_text_pooled({"text_model": params["text_model"]},
                            jnp.asarray(ids), jnp.asarray(mask), tcfg)
    )
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)


def test_generic_roberta_text_tower_matches_torch():
    """RoBERTa-family towers use pad-aware offset position ids (HF
    RobertaEmbeddings.create_position_ids_from_input_ids: positions start at
    pad_token_id+1 and pads keep pad_token_id) — a plain 0-based gather
    silently produces wrong features. Oracle parity incl. padded rows."""
    torch.manual_seed(5)
    rcfg_d = dict(
        model_type="roberta",
        vocab_size=120,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=64,
        max_position_embeddings=34,  # T + pad_token_id + 1 headroom
        type_vocab_size=1,
        pad_token_id=1,
        hidden_act="gelu",
        layer_norm_eps=1e-5,
    )
    roberta = transformers.RobertaModel(
        transformers.RobertaConfig(
            **{k: v for k, v in rcfg_d.items() if k != "model_type"}
        )
    ).eval()
    cfg = GenericDualConfig.from_dict(
        {"text_config": rcfg_d, "vision_config": TINY_VIT}
    )
    assert cfg.text.position_style == "roberta"
    assert cfg.text.pad_token_id == 1
    params = {
        "text_model": jax.tree_util.tree_map(
            jnp.asarray,
            bert_tower_from_torch(roberta.state_dict(), cfg.text, prefix=""),
        )
    }
    g = np.random.default_rng(6)
    ids = g.integers(4, 119, size=(3, 12)).astype(np.int64)
    ids[:, 0] = 0  # <s>
    mask = np.ones((3, 12), np.int64)
    mask[1, 7:] = 0
    ids[1, 7:] = 1  # pad_token_id
    with torch.no_grad():
        ref = roberta(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).pooler_output.numpy()
    got = np.asarray(
        generic_text_pooled(params, jnp.asarray(ids), jnp.asarray(mask), cfg.text)
    )
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)


def test_generic_distilbert_text_tower_matches_torch():
    """DistilBERT: no token-type embeddings, no pooler (-> plain-mean
    pooling), DistilBert state-dict naming. Oracle parity incl. padded
    rows."""
    torch.manual_seed(7)
    dcfg_d = dict(
        model_type="distilbert",
        vocab_size=120,
        dim=32,
        n_layers=2,
        n_heads=2,
        hidden_dim=64,
        max_position_embeddings=32,
        pad_token_id=0,
        activation="gelu",
    )
    distil = transformers.DistilBertModel(
        transformers.DistilBertConfig(
            **{k: v for k, v in dcfg_d.items() if k != "model_type"}
        )
    ).eval()
    cfg = GenericDualConfig.from_dict(
        {"text_config": dcfg_d, "vision_config": TINY_VIT}
    )
    assert cfg.text.arch == "distilbert"
    assert cfg.text.pooling == "mean"
    assert cfg.text.type_vocab_size == 0
    params = {
        "text_model": jax.tree_util.tree_map(
            jnp.asarray,
            distilbert_tower_from_torch(distil.state_dict(), cfg.text, prefix=""),
        )
    }
    assert "token_type_embeddings" not in params["text_model"]
    g = np.random.default_rng(8)
    ids = g.integers(4, 119, size=(3, 12)).astype(np.int64)
    mask = np.ones((3, 12), np.int64)
    mask[2, 5:] = 0
    ids[2, 5:] = 0
    with torch.no_grad():
        ref = (
            distil(input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask))
            .last_hidden_state.mean(dim=1)
            .numpy()
        )
    got = np.asarray(
        generic_text_pooled(params, jnp.asarray(ids), jnp.asarray(mask), cfg.text)
    )
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)


def test_generic_from_dict_rejects_unsupported_towers():
    with pytest.raises(ValueError, match="unsupported text tower"):
        GenericDualConfig.from_dict(
            {"text_config": {"model_type": "gpt2"}, "vision_config": TINY_VIT}
        )
    with pytest.raises(ValueError, match="unsupported vision tower"):
        GenericDualConfig.from_dict(
            {"text_config": TINY_BERT, "vision_config": {"model_type": "swin"}}
        )


def test_generic_pooler_config_without_pooler_params_falls_back_to_mean():
    """ADVICE r4: pooling='pooler' over a checkpoint converted without pooler
    weights must fall back to the mean (the reference's pooler_output-is-None
    branch), not KeyError inside jit."""
    torch.manual_seed(9)
    bcfg = transformers.BertConfig(
        **{k: v for k, v in TINY_BERT.items() if k != "model_type"}
    )
    bert = transformers.BertModel(bcfg, add_pooling_layer=False).eval()
    cfg = GenericDualConfig.from_dict(
        {"text_config": TINY_BERT, "vision_config": TINY_VIT}
    )
    assert cfg.text.pooling == "pooler"  # config still claims a pooler
    params = {
        "text_model": jax.tree_util.tree_map(
            jnp.asarray,
            bert_tower_from_torch(bert.state_dict(), cfg.text, prefix=""),
        )
    }
    assert "pooler" not in params["text_model"]
    ids, mask, _ = _inputs(seed=10)
    with torch.no_grad():
        ref = (
            bert(input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask))
            .last_hidden_state.mean(dim=1)
            .numpy()
        )
    got = np.asarray(
        generic_text_pooled(params, jnp.asarray(ids), jnp.asarray(mask), cfg.text)
    )
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)


def test_generic_init_distinct_rng_streams():
    """ADVICE r4: from-scratch init must not reuse RNG keys across
    parameters (position_embeddings used to equal the first rows of
    word_embeddings' stream; patch_embedding and the vision pooler used to
    get identical matrices)."""
    from multimodal_content_moderation_tpu.models.generic import generic_init

    cfg = GenericDualConfig.from_dict(
        {"text_config": TINY_BERT, "vision_config": TINY_VIT}
    )
    p = generic_init(jax.random.key(0), cfg)
    tm, vm = p["text_model"], p["vision_model"]
    assert not np.allclose(
        np.asarray(tm["word_embeddings"])[: tm["position_embeddings"].shape[0]],
        np.asarray(tm["position_embeddings"]),
    )
    assert not np.allclose(
        np.asarray(vm["patch_embedding"]["w"])[: 32, :],
        np.asarray(vm["pooler"]["w"])[:32, :],
    )


def test_generic_text_tower_train_dropout():
    """HF train-mode dropout (defaults 0.1) is active exactly when a
    dropout_rng is threaded; zero-prob configs are identity even with an
    rng (ADVICE r4: the reference fine-tunes these towers with dropout)."""
    import dataclasses

    from multimodal_content_moderation_tpu.models.generic import generic_init

    cfg = GenericDualConfig.from_dict(
        {"text_config": TINY_BERT, "vision_config": TINY_VIT}
    )
    assert cfg.text.hidden_dropout_prob == pytest.approx(0.1)
    assert cfg.text.attention_probs_dropout_prob == pytest.approx(0.1)
    params = generic_init(jax.random.key(0), cfg)
    ids, mask, _ = _inputs(seed=20)

    ev1 = np.asarray(generic_text_pooled(params, jnp.asarray(ids), jnp.asarray(mask), cfg.text))
    ev2 = np.asarray(generic_text_pooled(params, jnp.asarray(ids), jnp.asarray(mask), cfg.text))
    np.testing.assert_array_equal(ev1, ev2)  # eval: deterministic

    tr = np.asarray(
        generic_text_pooled(
            params, jnp.asarray(ids), jnp.asarray(mask), cfg.text,
            dropout_rng=jax.random.key(1),
        )
    )
    assert np.abs(tr - ev1).max() > 1e-6  # train: dropout active

    zero = dataclasses.replace(
        cfg.text, hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0
    )
    tr0 = np.asarray(
        generic_text_pooled(
            params, jnp.asarray(ids), jnp.asarray(mask), zero,
            dropout_rng=jax.random.key(1),
        )
    )
    ev0 = np.asarray(
        generic_text_pooled(params, jnp.asarray(ids), jnp.asarray(mask), zero)
    )
    np.testing.assert_array_equal(tr0, ev0)


def test_generic_rejects_nonzero_vision_dropout():
    with pytest.raises(ValueError, match="vision-tower dropout"):
        GenericDualConfig.from_dict(
            {
                "text_config": TINY_BERT,
                "vision_config": dict(TINY_VIT, hidden_dropout_prob=0.1),
            }
        )


def test_generic_fusion_forward_from_encoder_dir(vtde):
    """init_from_encoder_dir converts a VTDE checkpoint into a working
    generic FusionModel: finite (B, C) logits, presence-flag degradation,
    and feature_dim follows the reference's projection-dim probe."""
    _, d = vtde
    backend = model_io.resolve_backend(d, "auto")
    cfg = model_io.load_encoder_config(d, backend)
    model = model_io.build_model(
        "fusion", backend, ["a", "b", "c"], fusion_dim=16, generic_config=cfg
    )
    assert model.feature_dim == 24  # projection_dim probe (fusion.py:110-120)
    params = model_io.init_from_encoder_dir(model, d, jax.random.key(0))
    ids, mask, px = _inputs()
    batch = {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.asarray(mask),
        "pixel_values": jnp.asarray(px),
        "text_present": jnp.asarray([1.0, 1.0, 0.0]),
        "image_present": jnp.asarray([1.0, 0.0, 1.0]),
        "labels": jnp.asarray(np.eye(3, dtype=np.float32)),
    }
    out = model.apply(params, batch)
    assert out["logits"].shape == (3, 3)
    assert bool(jnp.all(jnp.isfinite(out["logits"])))
    assert np.isfinite(float(out["loss"]))

    # MTL head over raw towers: tower_dims follow hidden sizes
    mtl = model_io.build_model("mtl", backend, ["a", "b"], fusion_dim=16,
                               generic_config=cfg)
    assert mtl.tower_dims == (32, 32)
    mparams = model_io.init_from_encoder_dir(mtl, d, jax.random.key(1))
    assert "text_projection" not in mparams["backbone"]
    mout = mtl.apply(mparams, batch | {"labels": jnp.asarray(
        np.ones((3, 2), np.float32))})
    assert mout["logits"].shape == (3, 2)


@pytest.mark.slow
def test_generic_train_eval_infer_e2e(vtde, tmp_path):
    """backend: auto + a VTDE encoder dir runs the full train CLI ->
    inference path (the reference's AutoModel flow, scripts/train.py)."""
    import pandas as pd
    from PIL import Image

    from multimodal_content_moderation_tpu.cli import train as train_cli
    from multimodal_content_moderation_tpu.cli.inference import MultiModalClassifier

    _, enc = vtde
    g = np.random.default_rng(0)
    ddir = tmp_path / "data"
    (ddir / "images").mkdir(parents=True)
    rows = []
    for i in range(16):
        img = f"g{i}.png"
        Image.fromarray(
            g.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
        ).save(ddir / "images" / img)
        rows.append(
            {
                "text": "hate meme" if i % 2 else "hello world",
                "image_path": img,
                "labels": "bad" if i % 2 else "",
            }
        )
    pd.DataFrame(rows).to_csv(ddir / "train.csv", index=False)
    pd.DataFrame(rows[:8]).to_csv(ddir / "val.csv", index=False)

    cfg = f"""
model:
  backend: auto
  head: fusion
  encoder_dir: {enc}
  fusion_dim: 16
  max_text_length: 12
data:
  train_csv: {ddir}/train.csv
  val_csv: {ddir}/val.csv
  image_root: {ddir}/images
  class_names: [bad]
training:
  per_device_train_batch_size: 8
  per_device_eval_batch_size: 8
  num_train_epochs: 1
  num_workers: 2
early_stopping:
  enabled: false
seed: 0
"""
    cfg_path = tmp_path / "gen.yaml"
    cfg_path.write_text(cfg)
    out = str(tmp_path / "genrun")
    result = train_cli.main(["--config", str(cfg_path), "--saving.output_dir", out])

    with open(os.path.join(out, "inference_config.json")) as f:
        icfg = json.load(f)
    assert icfg["backend"] == "generic"

    clf = MultiModalClassifier(result["result"]["best_checkpoint"], batch_size=4)
    r = clf.predict("hate meme", None)
    assert set(r["predictions"].keys()) == {"bad"}
