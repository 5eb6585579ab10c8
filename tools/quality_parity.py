#!/usr/bin/env python
"""Quality-parity harness: fine-tune the torch reference-shaped model and the
JAX model on the SAME dataset and compare F1/ROC.

This is the machinery that demonstrates the BASELINE quality target
(F1-macro/ROC-AUC within +-0.005 of 0.569/0.783, reference
runs/clip_mtl_mmhshateful/test_metrics.json) the moment real MMHS150K assets
are mounted — and it is exercised continuously on synthetic fixtures in
tests/test_quality_parity.py.

Two modes:
- ``--mode locked`` (default): identical init (torch weights converted into
  the JAX pytree), identical data order, dropout off, same AdamW hyperparams.
  Differences are then pure numerics, so per-step losses and final metrics
  must agree tightly — this validates the training stack end to end.
- ``--mode independent``: each side trains from its own init with dropout on
  (the realistic comparison; metric deltas reflect seed noise, not bugs).

Both sides consume OUR input pipeline (CSVDataset batches), so the data is
bit-identical and the comparison isolates model+optimizer behavior. The
torch side re-derives the reference architectures (``--head fusion`` =
src/models/fusion.py:55-229; ``--head mtl`` = src/models/multitask.py:16-227
incl. hidden task heads) trained with plain AdamW + BCE, mirroring the
reference's effective configuration (single LR — its two-LR knob was
cosmetic, scripts/train.py:273).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_torch_fusion(
    encoder_dir: str, num_labels: int, fusion_dim: int, seed: int,
    backend: str = "clip",
):
    """Reference-shaped torch fusion classifier over a local HF encoder dir.

    ``backend="clip"`` mirrors the reference's CLIP path
    (``CLIPModel.get_text/image_features``); ``backend="siglip"`` mirrors its
    "auto" path (AutoModel submodule pooler outputs: text pooler head,
    vision MAP head — reference src/models/fusion.py:100-111)."""
    import torch
    import torch.nn as nn
    import transformers

    class TorchFusion(nn.Module):
        def __init__(self):
            super().__init__()
            if backend == "clip":
                cfg = transformers.CLIPConfig.from_pretrained(encoder_dir)
                self.backbone = transformers.CLIPModel.from_pretrained(encoder_dir)
                d = cfg.projection_dim
            else:
                self.backbone = transformers.SiglipModel.from_pretrained(encoder_dir)
                d = self.backbone.config.text_config.hidden_size
            self.proj_t = nn.Linear(d, fusion_dim)
            self.proj_i = nn.Linear(d, fusion_dim)
            self.g_t = nn.Linear(fusion_dim, fusion_dim)
            self.g_i = nn.Linear(fusion_dim, fusion_dim)
            self.gate = nn.Linear(fusion_dim * 2 + 2, fusion_dim)
            self.ln_fused = nn.LayerNorm(fusion_dim)
            self.cls = nn.Sequential(
                nn.LayerNorm(fusion_dim * 5),
                nn.Linear(fusion_dim * 5, fusion_dim),
                nn.GELU(),
                nn.Dropout(0.2),
                nn.Linear(fusion_dim, num_labels),
            )

        def forward(self, ids, mask, px, tpres, ipres):
            import torch
            import torch.nn.functional as F

            if backend == "clip":
                t = self.backbone.get_text_features(input_ids=ids, attention_mask=mask)
                v = self.backbone.get_image_features(pixel_values=px)
            else:
                t = self.backbone.text_model(
                    input_ids=ids, attention_mask=mask
                ).pooler_output
                v = self.backbone.vision_model(pixel_values=px).pooler_output
            t = F.normalize(t, dim=-1) * tpres.unsqueeze(1)
            v = F.normalize(v, dim=-1) * ipres.unsqueeze(1)
            tp, vp = self.proj_t(t), self.proj_i(v)
            zt, zi = torch.tanh(self.g_t(tp)), torch.tanh(self.g_i(vp))
            presence = torch.stack([tpres, ipres], dim=1)
            g = torch.sigmoid(self.gate(torch.cat([tp, vp, presence], dim=1)))
            fused = torch.where(
                (ipres < 0.5).unsqueeze(1),
                zt,
                torch.where((tpres < 0.5).unsqueeze(1), zi, g * zt + (1 - g) * zi),
            )
            fused = self.ln_fused(fused)
            feat = torch.cat([fused, tp, vp, torch.abs(tp - vp), tp * vp], dim=1)
            return self.cls(feat)

    torch.manual_seed(seed)
    return TorchFusion()


def build_torch_mtl(
    encoder_dir: str, num_tasks: int, fusion_dim: int, head_hidden_dim: int,
    seed: int, backend: str = "clip",
):
    """Reference-shaped torch MTL classifier (pooler outputs + shared trunk +
    per-task heads, src/models/multitask.py). ``backend="clip"`` uses the
    separate tower_txt/tower_img layout; ``backend="siglip"`` the shared
    AutoModel backbone layout (multitask.py:130-154)."""
    import torch
    import torch.nn as nn
    import transformers

    class TorchMTL(nn.Module):
        def __init__(self):
            super().__init__()
            if backend == "clip":
                cfg = transformers.CLIPConfig.from_pretrained(encoder_dir)
                self.tower_txt = transformers.CLIPTextModel.from_pretrained(
                    encoder_dir
                )
                self.tower_img = transformers.CLIPVisionModel.from_pretrained(
                    encoder_dir
                )
                tdim = cfg.text_config.hidden_size
                idim = cfg.vision_config.hidden_size
            else:
                self.backbone = transformers.SiglipModel.from_pretrained(encoder_dir)
                tdim = self.backbone.config.text_config.hidden_size
                idim = self.backbone.config.vision_config.hidden_size
            self.proj_t = nn.Linear(tdim, fusion_dim)
            self.proj_i = nn.Linear(idim, fusion_dim)
            self.g_t = nn.Linear(fusion_dim, fusion_dim)
            self.g_i = nn.Linear(fusion_dim, fusion_dim)
            self.gate = nn.Linear(fusion_dim * 2 + 2, fusion_dim)
            self.shared_head = nn.Sequential(
                nn.Dropout(0.2), nn.Linear(fusion_dim, fusion_dim),
                nn.GELU(), nn.Dropout(0.2),
            )

            def make_head():
                if head_hidden_dim > 0:
                    return nn.Sequential(
                        nn.Linear(fusion_dim, head_hidden_dim), nn.GELU(),
                        nn.Dropout(0.1), nn.Linear(head_hidden_dim, 1),
                    )
                return nn.Linear(fusion_dim, 1)

            self.heads = nn.ModuleList([make_head() for _ in range(num_tasks)])

        def forward(self, ids, mask, px, tpres, ipres):
            import torch

            if backend == "clip":
                tfeat = self.tower_txt(
                    input_ids=ids, attention_mask=mask
                ).pooler_output
                vfeat = self.tower_img(pixel_values=px).pooler_output
            else:
                tfeat = self.backbone.text_model(
                    input_ids=ids, attention_mask=mask
                ).pooler_output
                vfeat = self.backbone.vision_model(pixel_values=px).pooler_output
            tp, vp = self.proj_t(tfeat), self.proj_i(vfeat)
            presence = torch.stack([tpres, ipres], dim=1)
            zt, zi = torch.tanh(self.g_t(tp)), torch.tanh(self.g_i(vp))
            g = torch.sigmoid(self.gate(torch.cat([tp, vp, presence], dim=1)))
            fused = torch.where(
                (ipres < 0.5).unsqueeze(1),
                zt,
                torch.where((tpres < 0.5).unsqueeze(1), zi, g * zt + (1 - g) * zi),
            )
            shared = self.shared_head(fused)
            return torch.stack([h(shared).squeeze(-1) for h in self.heads], dim=1)

    torch.manual_seed(seed)
    return TorchMTL()


def epoch_orders(n: int, epochs: int, seed: int):
    return [
        np.random.default_rng(seed + e).permutation(n) for e in range(epochs)
    ]


def batches_for(ds, order, batch_size):
    for batch in ds.batches(batch_size, drop_last=True, indices=order):
        yield batch


def train_torch(model, train_ds, val_ds, orders, batch_size, lr, wd, dropout_off):
    import torch
    import torch.nn.functional as F

    if dropout_off:
        model.eval()
    else:
        model.train()
    opt = torch.optim.AdamW(model.parameters(), lr=lr, weight_decay=wd)
    losses = []
    for order in orders:
        for b in batches_for(train_ds, order, batch_size):
            opt.zero_grad()
            logits = model(
                torch.tensor(b["input_ids"].astype(np.int64)),
                torch.tensor(b["attention_mask"].astype(np.int64)),
                torch.tensor(b["pixel_values"]),
                torch.tensor(b["text_present"]),
                torch.tensor(b["image_present"]),
            )
            loss = F.binary_cross_entropy_with_logits(
                logits, torch.tensor(b["labels"])
            )
            loss.backward()
            opt.step()
            losses.append(float(loss))
    model.eval()
    all_logits, all_labels = [], []
    with torch.no_grad():
        for b in batches_for(val_ds, np.arange(len(val_ds)), batch_size):
            all_logits.append(
                model(
                    torch.tensor(b["input_ids"].astype(np.int64)),
                    torch.tensor(b["attention_mask"].astype(np.int64)),
                    torch.tensor(b["pixel_values"]),
                    torch.tensor(b["text_present"]),
                    torch.tensor(b["image_present"]),
                ).numpy()
            )
            all_labels.append(b["labels"])
    return losses, np.concatenate(all_logits), np.concatenate(all_labels)


def train_jax(model, params, train_ds, val_ds, orders, batch_size, lr, wd,
              dropout_off, seed, fast=None):
    """``fast`` (dict or None) switches the JAX side to the PRODUCTION fast
    train config (the 3,436 samples/s recipe, docs/PERFORMANCE.md) while the
    torch side stays the fp32 reference: uint8 wire + folded-norm patch
    embed, bf16 compute + bf16 attention scores, bf16 Adam accumulators
    (training/optim.scale_by_adam_compact — the real production transform),
    and text_fit (static text width shrunk to the data; exact for CLIP).
    Keys: {"mean", "std", "patch_size", "text_width"}. Attention/embed
    kernels pick Pallas automatically on TPU, XLA reference elsewhere."""
    import dataclasses

    import jax
    import optax

    text_w = None
    if fast:
        from multimodal_content_moderation_tpu.models import model_io
        from multimodal_content_moderation_tpu.training.optim import (
            scale_by_adam_compact,
        )

        on_tpu = jax.default_backend() not in ("cpu",)
        model = dataclasses.replace(
            model,
            image_mean=tuple(float(m) for m in fast["mean"]),
            image_std=tuple(float(s) for s in fast["std"]),
            embed_impl="pallas" if on_tpu else "reference",
        )
        model = model_io.with_performance_options(
            model,
            compute_dtype="bfloat16",
            scores_dtype="bfloat16",
            attention_impl="pallas" if on_tpu else "xla",
        )
        text_w = fast.get("text_width")
        tx = optax.chain(
            scale_by_adam_compact(0.9, 0.999, 1e-8, "bfloat16"),
            optax.add_decayed_weights(wd),
            optax.scale_by_learning_rate(lr),
        )
    else:
        tx = optax.adamw(lr, weight_decay=wd)
    opt_state = tx.init(params)
    rng = jax.random.key(seed)

    @jax.jit
    def step(params, opt_state, rng, batch):
        if dropout_off:
            drop_rng = None
            new_rng = rng
        else:
            new_rng, drop_rng = jax.random.split(rng)
        loss, grads = jax.value_and_grad(
            lambda p: model.apply(p, batch, dropout_rng=drop_rng)["loss"]
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, new_rng, loss

    keys = ("input_ids", "attention_mask", "pixel_values", "text_present",
            "image_present", "labels")

    def prep(b, with_labels=True):
        out = {k: b[k] for k in keys if with_labels or k != "labels"}
        if fast:
            from multimodal_content_moderation_tpu.ops.pallas_image import (
                extract_patches_u8,
            )

            out["patches_u8"] = extract_patches_u8(
                out.pop("pixel_values"), fast["patch_size"]
            )
            if text_w and text_w < out["input_ids"].shape[1]:
                out["input_ids"] = np.ascontiguousarray(
                    out["input_ids"][:, :text_w]
                )
                out["attention_mask"] = np.ascontiguousarray(
                    out["attention_mask"][:, :text_w]
                )
        return out

    losses = []
    for order in orders:
        for b in batches_for(train_ds, order, batch_size):
            params, opt_state, rng, loss = step(
                params, opt_state, rng, prep(b)
            )
            losses.append(float(loss))

    fwd = jax.jit(
        lambda p, b: model.apply(p, b)["logits"].astype(jnp_f32())
    )

    def eval_val(p):
        all_logits, all_labels = [], []
        for b in batches_for(val_ds, np.arange(len(val_ds)), batch_size):
            all_logits.append(np.asarray(fwd(p, prep(b, with_labels=False))))
            all_labels.append(b["labels"])
        return np.concatenate(all_logits), np.concatenate(all_labels)

    logits, labels = eval_val(params)
    return losses, logits, labels, (params, eval_val)


def jnp_f32():
    import jax.numpy as jnp

    return jnp.float32


def run(
    encoder_dir: str,
    train_csv: str,
    val_csv: str,
    image_root: str = "",
    class_names=None,
    mode: str = "locked",
    epochs: int = 2,
    batch_size: int = 8,
    lr: float = 1e-3,
    weight_decay: float = 0.01,
    fusion_dim: int = 32,
    max_text_length: int = 77,
    seed: int = 0,
    head: str = "fusion",
    head_hidden_dim: int = 0,
    backend: str = "clip",
    jax_fast: bool = False,
    int8_eval: bool = False,
) -> dict:
    from multimodal_content_moderation_tpu.cli.common import image_stats_from_dir
    from multimodal_content_moderation_tpu.data.dataset import CSVDataset
    from multimodal_content_moderation_tpu.data.images import ImagePreprocessor
    from multimodal_content_moderation_tpu.data.tokenizer import load_tokenizer
    from multimodal_content_moderation_tpu.models import (
        CLIPConfig,
        FusionModel,
        SigLIPConfig,
    )
    from multimodal_content_moderation_tpu.models.convert import (
        fusion_model_from_torch,
    )
    from multimodal_content_moderation_tpu.training.metrics import (
        make_compute_metrics_multi,
    )

    import jax
    import transformers

    class_names = class_names or ["racist", "sexist", "homophobe", "religion",
                                  "otherhate"]
    tokenizer = load_tokenizer(encoder_dir)
    (H, W), mean, std = image_stats_from_dir(encoder_dir, backend)
    pp = ImagePreprocessor(H, W, mean, std)
    mk = lambda csv: CSVDataset(
        csv, image_root, tokenizer, pp, max_text_length, class_names=class_names
    )
    train_ds, val_ds = mk(train_csv), mk(val_csv)
    orders = epoch_orders(len(train_ds), epochs, seed)

    if backend == "clip":
        hf_cfg = transformers.CLIPConfig.from_pretrained(encoder_dir)
        cfg = CLIPConfig.from_hf(hf_cfg)
        cfg_kw = {"clip_config": cfg}
        conv_kw = {"clip_cfg": cfg}
    else:
        hf_cfg = transformers.SiglipConfig.from_pretrained(encoder_dir)
        cfg = SigLIPConfig.from_hf(hf_cfg)
        cfg_kw = {"siglip_config": cfg}
        conv_kw = {"siglip_cfg": cfg}
    if head == "mtl":
        from multimodal_content_moderation_tpu.models import MultiTaskModel
        from multimodal_content_moderation_tpu.models.convert import (
            mtl_model_from_torch,
        )

        oracle = build_torch_mtl(
            encoder_dir, len(class_names), fusion_dim, head_hidden_dim, seed,
            backend=backend,
        )
        jmodel = MultiTaskModel.create(
            backend, num_tasks=len(class_names), fusion_dim=fusion_dim,
            head_hidden_dim=head_hidden_dim, **cfg_kw,
        )
        convert = lambda sd: mtl_model_from_torch(
            sd, backend, num_tasks=len(class_names), **conv_kw
        )
    else:
        oracle = build_torch_fusion(
            encoder_dir, len(class_names), fusion_dim, seed, backend=backend
        )
        jmodel = FusionModel.create(
            backend, num_labels=len(class_names), fusion_dim=fusion_dim,
            **cfg_kw,
        )
        convert = lambda sd: fusion_model_from_torch(sd, backend, **conv_kw)

    if mode == "locked":
        jparams = convert(oracle.state_dict())
        dropout_off = True
    else:
        jparams = jmodel.init(jax.random.key(seed + 1))
        # encoders still start from the pretrained weights on both sides
        jparams["backbone"] = convert(oracle.state_dict())["backbone"]
        dropout_off = False

    fast = None
    j_train_ds, j_val_ds = train_ds, val_ds
    if jax_fast:
        # the JAX side runs the PRODUCTION fast config (u8 wire + bf16
        # compute/scores + bf16 Adam accumulators + text_fit); torch stays
        # the fp32 reference, so the final band check proves the fast recipe
        # holds the quality band, not just the locked fp32 path
        vcfg = cfg.vision
        pp_u8 = ImagePreprocessor(H, W, mean, std, output="uint8_hwc")
        mk_u8 = lambda csv: CSVDataset(
            csv, image_root, tokenizer, pp_u8, max_text_length,
            class_names=class_names,
        )
        j_train_ds, j_val_ds = mk_u8(train_csv), mk_u8(val_csv)
        text_width = None
        if backend == "clip":  # text_fit: exact for CLIP (causal + EOS pool)
            longest = max(
                int(d.attention_mask.sum(axis=1).max(initial=1))
                for d in (j_train_ds, j_val_ds)
            )
            text_width = min(max_text_length, max(8, -(-longest // 8) * 8))
        fast = {
            "mean": mean, "std": std, "patch_size": vcfg.patch_size,
            "text_width": text_width,
        }

    t_losses, t_logits, labels = train_torch(
        oracle, train_ds, val_ds, orders, batch_size, lr, weight_decay, dropout_off
    )
    j_losses, j_logits, _, (j_final_params, j_eval_val) = train_jax(
        jmodel, jparams, j_train_ds, j_val_ds, orders, batch_size, lr,
        weight_decay, dropout_off, seed, fast=fast,
    )

    cm = make_compute_metrics_multi(len(class_names))
    t_metrics = cm((t_logits, labels))
    j_metrics = cm((j_logits, labels))
    report = {
        "mode": mode + ("_fast" if jax_fast else ""),
        "jax_config": (
            "u8 wire + bf16 compute/scores + bf16 Adam accumulators + "
            f"text_fit {fast['text_width']}" if jax_fast else "fp32 parity"
        ),
        "head": head,
        "steps": len(t_losses),
        "torch": {k: float(v) for k, v in t_metrics.items()},
        "jax": {k: float(v) for k, v in j_metrics.items()},
        "delta": {
            k: float(abs(j_metrics[k] - t_metrics[k])) for k in t_metrics
        },
        "final_loss_torch": t_losses[-1],
        "final_loss_jax": j_losses[-1],
        "max_step_loss_delta": float(
            np.max(np.abs(np.asarray(t_losses) - np.asarray(j_losses)))
        ),
        "max_val_logit_delta": float(np.max(np.abs(t_logits - j_logits)))
        if mode == "locked"
        else None,
    }
    if int8_eval:
        # quantify the OPT-IN int8_mlp eval tier: same trained params, val
        # evaluated with the production selective int8 fc1 quantization
        # (ops/quant.py) vs the model's own fp32/bf16 logits and the torch
        # reference metrics
        from multimodal_content_moderation_tpu.ops.quant import (
            quantize_fc1_layers,
        )

        q_params, nq = quantize_fc1_layers(j_final_params)
        i_logits, _ = j_eval_val(q_params)
        i_metrics = cm((i_logits, labels))
        sig = lambda z: 1.0 / (1.0 + np.exp(-z))
        report["int8_mlp"] = {
            "quantized_fc1_layers": nq,
            "metrics": {k: float(v) for k, v in i_metrics.items()},
            "delta_vs_torch": {
                k: float(abs(i_metrics[k] - t_metrics[k])) for k in t_metrics
            },
            "delta_vs_jax": {
                k: float(abs(i_metrics[k] - j_metrics[k])) for k in j_metrics
            },
            "max_val_logit_delta_vs_jax": float(
                np.max(np.abs(i_logits - j_logits))
            ),
            "max_val_prob_delta_vs_jax": float(
                np.max(np.abs(sig(i_logits) - sig(j_logits)))
            ),
        }
    return report


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--encoder_dir", required=True)
    ap.add_argument("--train_csv", required=True)
    ap.add_argument("--val_csv", required=True)
    ap.add_argument("--image_root", default="")
    ap.add_argument("--class_names", default="")
    ap.add_argument("--mode", choices=["locked", "independent"], default="locked")
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--weight_decay", type=float, default=0.01)
    ap.add_argument("--fusion_dim", type=int, default=32)
    ap.add_argument("--head", choices=["fusion", "mtl"], default="fusion")
    ap.add_argument("--head_hidden_dim", type=int, default=0)
    ap.add_argument("--backend", choices=["clip", "siglip"], default="clip")
    ap.add_argument("--max_text_length", type=int, default=77)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tolerance", type=float, default=0.005,
                    help="max allowed |delta| on f1_macro / roc_macro")
    ap.add_argument(
        "--jax_fast", action="store_true",
        help="JAX side trains with the PRODUCTION fast config (u8 wire + "
        "bf16 compute/scores + bf16 Adam accumulators + text_fit) while "
        "torch stays the fp32 reference — proves the fast recipe holds the "
        "quality band",
    )
    ap.add_argument(
        "--int8_eval", action="store_true",
        help="also evaluate the trained JAX model with the opt-in int8_mlp "
        "tier (selective int8 fc1, ops/quant.py) and report its metric / "
        "logit deltas",
    )
    ap.add_argument("--output", default="")
    args = ap.parse_args(argv)
    names = [c for c in args.class_names.split(",") if c] or None
    report = run(
        args.encoder_dir, args.train_csv, args.val_csv, args.image_root, names,
        args.mode, args.epochs, args.batch_size, args.lr, args.weight_decay,
        args.fusion_dim, args.max_text_length, args.seed,
        head=args.head, head_hidden_dim=args.head_hidden_dim,
        backend=args.backend, jax_fast=args.jax_fast,
        int8_eval=args.int8_eval,
    )
    print(json.dumps(report, indent=2))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(report, f, indent=2)
    ok = (
        report["delta"].get("f1_macro", 1.0) <= args.tolerance
        and report["delta"].get("roc_macro", 1.0) <= args.tolerance
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
