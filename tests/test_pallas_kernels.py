"""Pallas kernel parity tests (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_content_moderation_tpu.ops.pallas_attention import (
    NEG_INF,
    attention_small,
    flash_attention,
    fused_mha,
)
from multimodal_content_moderation_tpu.ops.pallas_image import (
    extract_patches_u8,
    fold_norm_into_embed,
    patch_embed_reference,
    patch_embed_u8,
)


def _sdpa_reference(q, k, v, mask):
    """Plain fp32 softmax attention."""
    dh = q.shape[-1]
    s = np.einsum("btd,bsd->bts", q, k).astype(np.float32) / np.sqrt(dh)
    s = s + mask
    s = s - s.max(axis=-1, keepdims=True)
    p = np.exp(s)
    p = p / p.sum(axis=-1, keepdims=True)
    return np.einsum("bts,bsd->btd", p, v.astype(np.float32))


class TestAttentionSmall:
    def test_matches_reference(self):
        g = np.random.default_rng(0)
        BH, T, dh = 4, 64, 32
        q = g.normal(size=(BH, T, dh)).astype(np.float32)
        k = g.normal(size=(BH, T, dh)).astype(np.float32)
        v = g.normal(size=(BH, T, dh)).astype(np.float32)
        mask = np.zeros((BH, T, T), np.float32)
        mask[:, :, 50:] = NEG_INF  # padding mask
        got = np.asarray(attention_small(q, k, v, mask, interpret=True))
        ref = _sdpa_reference(q, k, v, mask)
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)

    def test_causal_mask(self):
        g = np.random.default_rng(1)
        BH, T, dh = 2, 16, 8
        q = g.normal(size=(BH, T, dh)).astype(np.float32)
        k = g.normal(size=(BH, T, dh)).astype(np.float32)
        v = g.normal(size=(BH, T, dh)).astype(np.float32)
        causal = np.triu(np.full((T, T), NEG_INF, np.float32), k=1)
        mask = np.broadcast_to(causal, (BH, T, T)).copy()
        got = np.asarray(attention_small(q, k, v, mask, interpret=True))
        ref = _sdpa_reference(q, k, v, mask)
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


class TestFlashAttention:
    def test_matches_reference_multiblock(self):
        g = np.random.default_rng(2)
        BH, T, dh = 2, 256, 64
        q = g.normal(size=(BH, T, dh)).astype(np.float32)
        k = g.normal(size=(BH, T, dh)).astype(np.float32)
        v = g.normal(size=(BH, T, dh)).astype(np.float32)
        mask = np.zeros((BH, T, T), np.float32)
        got = np.asarray(
            flash_attention(q, k, v, mask, block_q=128, block_k=128, interpret=True)
        )
        ref = _sdpa_reference(q, k, v, mask)
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)

    def test_with_padding_mask(self):
        g = np.random.default_rng(3)
        BH, T, dh = 2, 256, 32
        q = g.normal(size=(BH, T, dh)).astype(np.float32)
        k = g.normal(size=(BH, T, dh)).astype(np.float32)
        v = g.normal(size=(BH, T, dh)).astype(np.float32)
        mask = np.zeros((BH, T, T), np.float32)
        mask[:, :, 200:] = NEG_INF
        got = np.asarray(flash_attention(q, k, v, mask, interpret=True))
        ref = _sdpa_reference(q, k, v, mask)
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


class TestFusedMHADispatch:
    def test_small_path(self):
        g = np.random.default_rng(4)
        B, H, T, dh = 2, 2, 77, 32
        q = g.normal(size=(B, H, T, dh)).astype(np.float32)
        k = g.normal(size=(B, H, T, dh)).astype(np.float32)
        v = g.normal(size=(B, H, T, dh)).astype(np.float32)
        got = np.asarray(fused_mha(q, k, v, None, interpret=True))
        ref = _sdpa_reference(
            q.reshape(B * H, T, dh), k.reshape(B * H, T, dh), v.reshape(B * H, T, dh),
            np.zeros((B * H, T, T), np.float32),
        ).reshape(B, H, T, dh)
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)

    def test_long_path_with_ragged_seq(self):
        """Seq 300 (not a block multiple) exercises the pad+slice path."""
        g = np.random.default_rng(5)
        B, H, T, dh = 1, 2, 300, 32
        q = g.normal(size=(B, H, T, dh)).astype(np.float32)
        k = g.normal(size=(B, H, T, dh)).astype(np.float32)
        v = g.normal(size=(B, H, T, dh)).astype(np.float32)
        got = np.asarray(fused_mha(q, k, v, None, interpret=True))
        ref = _sdpa_reference(
            q.reshape(B * H, T, dh), k.reshape(B * H, T, dh), v.reshape(B * H, T, dh),
            np.zeros((B * H, T, T), np.float32),
        ).reshape(B, H, T, dh)
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


class TestPatchEmbed:
    def test_fold_and_kernel_match_unfused(self):
        """uint8 -> fused folded-GEMM == normalize -> patchify -> dense."""
        g = np.random.default_rng(6)
        B, H, W, C, p, D = 2, 32, 32, 3, 16, 64
        imgs = g.integers(0, 256, size=(B, H, W, C), dtype=np.uint8)
        w = g.normal(size=(C * p * p, D)).astype(np.float32) * 0.05
        b = g.normal(size=(D,)).astype(np.float32)
        mean = (0.48, 0.46, 0.41)
        std = (0.27, 0.26, 0.28)

        patches = extract_patches_u8(imgs, p)
        wf, bf = fold_norm_into_embed(jnp.asarray(w), jnp.asarray(b), mean, std, p, C)

        got = np.asarray(
            patch_embed_u8(
                jnp.asarray(patches), wf, bf, out_dtype=jnp.float32, interpret=True
            )
        )

        # unfused reference via the model's own patchify path
        from multimodal_content_moderation_tpu.ops.layers import dense, patchify

        x = imgs.astype(np.float32) / 255.0
        x = (x - np.asarray(mean)) / np.asarray(std)
        nchw = x.transpose(0, 3, 1, 2)
        ref = np.asarray(
            dense(patchify(jnp.asarray(nchw, jnp.float32), p), {"w": w, "b": b})
        )
        np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-4)

    def test_reference_fallback_matches_kernel(self):
        g = np.random.default_rng(7)
        B, N, K, D = 2, 4, 48, 32
        patches = g.integers(0, 256, size=(B, N, K), dtype=np.uint8)
        wf = g.normal(size=(K, D)).astype(np.float32)
        bf = g.normal(size=(D,)).astype(np.float32)
        a = np.asarray(
            patch_embed_u8(patches, wf, bf, out_dtype=jnp.float32, interpret=True)
        )
        r = np.asarray(
            patch_embed_reference(patches, wf, bf, out_dtype=jnp.float32)
        )
        np.testing.assert_allclose(a, r, rtol=1e-3, atol=1e-3)

    def test_non_multiple_rows_padding(self):
        g = np.random.default_rng(8)
        B, N, K, D = 3, 7, 48, 32  # 21 rows, block 16 -> padded to 32
        patches = g.integers(0, 256, size=(B, N, K), dtype=np.uint8)
        wf = g.normal(size=(K, D)).astype(np.float32)
        bf = np.zeros((D,), np.float32)
        a = np.asarray(
            patch_embed_u8(
                patches, wf, bf, block_rows=16, out_dtype=jnp.float32, interpret=True
            )
        )
        r = np.asarray(patch_embed_reference(patches, wf, bf, out_dtype=jnp.float32))
        np.testing.assert_allclose(a, r, rtol=1e-3, atol=1e-3)


class TestAttentionNHD:
    """attention_nhd consumes [B, T, D] directly (no head transpose in HLO)."""

    @staticmethod
    def _reference(q, k, v, h, km=None, causal=False):
        B, T, D = q.shape
        S = k.shape[1]
        dh = D // h
        qh = q.reshape(B, T, h, dh).transpose(0, 2, 1, 3).astype(np.float32)
        kh = k.reshape(B, S, h, dh).transpose(0, 2, 1, 3).astype(np.float32)
        vh = v.reshape(B, S, h, dh).transpose(0, 2, 1, 3).astype(np.float32)
        s = np.einsum("bhqd,bhkd->bhqk", qh, kh) / np.sqrt(dh)
        if km is not None:
            s = s + km[:, None, None, :]
        if causal:
            r, c = np.indices((T, S))
            s = np.where(c <= r, s, -np.inf)
        s = s - s.max(axis=-1, keepdims=True)
        p = np.exp(s)
        p = p / p.sum(axis=-1, keepdims=True)
        o = np.einsum("bhqk,bhkd->bhqd", p, vh)
        return o.transpose(0, 2, 1, 3).reshape(B, T, D)

    @pytest.mark.parametrize(
        "B,T,h,causal,with_km,bb",
        [
            (4, 50, 12, False, False, 0),  # ViT tower shape (no mask)
            (6, 77, 8, True, True, 0),  # CLIP text (causal + padding)
            (3, 64, 12, False, True, 2),  # SigLIP text (padding only)
            (5, 196, 12, False, False, 0),  # B=5: block_b divisor fallback
            # T=197 (ViT+CLS, generic backend): the Mosaic compile-pathology
            # shape — exercises the internal pad-to-200 + masked-pad-keys
            # shim (_pad_pathological_seq); must stay EXACT
            (4, 197, 12, False, False, 0),
            (4, 197, 12, False, True, 0),
            (2, 131, 4, True, True, 0),  # odd >=128, causal + padding
        ],
    )
    def test_matches_reference(self, B, T, h, causal, with_km, bb):
        from multimodal_content_moderation_tpu.ops.pallas_attention import (
            attention_nhd,
        )

        g = np.random.default_rng(11)
        D = h * 64
        q = g.normal(size=(B, T, D)).astype(np.float32)
        k = g.normal(size=(B, T, D)).astype(np.float32)
        v = g.normal(size=(B, T, D)).astype(np.float32)
        km = None
        if with_km:
            keep = (g.random((B, T)) < 0.8).astype(np.float32)
            keep[:, 0] = 1.0
            km = ((1.0 - keep) * NEG_INF).astype(np.float32)
        got = np.asarray(
            attention_nhd(
                jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), h,
                key_mask=None if km is None else jnp.asarray(km),
                causal=causal, block_b=bb, interpret=True,
            )
        )
        want = self._reference(q, k, v, h, km, causal)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_block_b_picker_stays_power_of_two(self):
        """Non-power-of-2 batch blocks are a Mosaic compile cliff (134 s at
        block_b=6 vs 1.2 s at 4) and the 2D mask block is only lowerable
        when block_b is sublane-aligned — the picker must halve to a
        power-of-2 divisor, never decrement."""
        from multimodal_content_moderation_tpu.ops.pallas_attention import (
            _pick_block_b,
            _snap_to_divisor,
        )

        small = 1024  # per-item bytes far under budget -> start at 8
        assert _pick_block_b(120, small) == 8
        assert _pick_block_b(144, small) == 8
        assert _pick_block_b(132, small) == 4  # not 6
        assert _pick_block_b(156, small) == 4
        assert _pick_block_b(100, small) == 4
        assert _pick_block_b(133, small) == 1  # odd batch -> bB=1
        for B in range(1, 400):
            bb = _pick_block_b(B, small)
            assert B % bb == 0 and (bb & (bb - 1)) == 0
        # explicit block_b also snaps
        assert _snap_to_divisor(132, 8) == 4

    def test_odd_batch_with_key_mask(self):
        """B not divisible by 8 + key padding mask — the exact combination
        that crashed the 2D-mask lowering (block (4, S) on array [B, S]);
        the [B, 1, S] carrier must make it both legal and correct."""
        from multimodal_content_moderation_tpu.ops.pallas_attention import (
            attention_nhd,
        )

        g = np.random.default_rng(3)
        B, T, h = 12, 77, 8  # block_b -> 4
        D = h * 64
        q = g.normal(size=(B, T, D)).astype(np.float32)
        k = g.normal(size=(B, T, D)).astype(np.float32)
        v = g.normal(size=(B, T, D)).astype(np.float32)
        keep = (g.random((B, T)) < 0.8).astype(np.float32)
        keep[:, 0] = 1.0
        km = ((1.0 - keep) * NEG_INF).astype(np.float32)
        got = np.asarray(
            attention_nhd(
                jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), h,
                key_mask=jnp.asarray(km), causal=True, block_b=4,
                interpret=True,
            )
        )
        want = self._reference(q, k, v, h, km, causal=True)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize(
        "B,T,h,causal,with_km",
        [
            (4, 50, 12, False, False),
            (3, 77, 8, True, True),
            # pathological seq (pad shim active in fwd AND bwd kernels)
            (2, 131, 4, False, True),
        ],
    )
    def test_vjp_matches_xla_autodiff(self, B, T, h, causal, with_km):
        """attention_nhd_diff's recompute backward kernel vs jax.grad through
        the plain einsum chain (interpret mode)."""
        from multimodal_content_moderation_tpu.ops.pallas_attention import (
            attention_nhd_diff,
        )

        def xla_att(q, k, v, km):
            D = q.shape[2]
            dh = D // h
            S = k.shape[1]
            qh = q.reshape(B, T, h, dh).transpose(0, 2, 1, 3)
            kh = k.reshape(B, S, h, dh).transpose(0, 2, 1, 3)
            vh = v.reshape(B, S, h, dh).transpose(0, 2, 1, 3)
            s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) * dh**-0.5
            if km is not None:
                s = s + km[:, None, None, :]
            if causal:
                r = jax.lax.broadcasted_iota(jnp.int32, (T, S), 0)
                c = jax.lax.broadcasted_iota(jnp.int32, (T, S), 1)
                s = jnp.where(c <= r, s, -jnp.inf)
            p = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("bhqk,bhkd->bhqd", p, vh)
            return o.transpose(0, 2, 1, 3).reshape(B, T, D)

        g = np.random.default_rng(7)
        D = h * 64
        q = jnp.asarray(g.normal(size=(B, T, D)), jnp.float32)
        k = jnp.asarray(g.normal(size=(B, T, D)), jnp.float32)
        v = jnp.asarray(g.normal(size=(B, T, D)), jnp.float32)
        km = None
        if with_km:
            keep = (g.random((B, T)) < 0.8).astype(np.float32)
            keep[:, 0] = 1.0
            km = jnp.asarray((1.0 - keep) * NEG_INF)
        w = jnp.asarray(g.normal(size=(B, T, D)), jnp.float32)

        gp = jax.grad(
            lambda q, k, v: jnp.sum(
                attention_nhd_diff(q, k, v, km, h, causal, 0, True) * w
            ),
            argnums=(0, 1, 2),
        )(q, k, v)
        gx = jax.grad(
            lambda q, k, v: jnp.sum(xla_att(q, k, v, km) * w), argnums=(0, 1, 2)
        )(q, k, v)
        for a, b in zip(gp, gx):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)

    @pytest.mark.parametrize("h,dh", [(4, 96), (4, 128), (3, 64)])
    def test_bwd_head_pack_fallbacks(self, h, dh):
        """The backward kernel packs heads into 128-wide D blocks; odd head
        dims (96 -> full-D fallback, 128 -> one head per block, odd head
        counts) must still match XLA autodiff."""
        from multimodal_content_moderation_tpu.ops.pallas_attention import (
            attention_nhd_diff,
        )

        g = np.random.default_rng(3)
        B, T = 2, 16
        D = h * dh
        q = jnp.asarray(g.normal(size=(B, T, D)), jnp.float32)
        k = jnp.asarray(g.normal(size=(B, T, D)), jnp.float32)
        v = jnp.asarray(g.normal(size=(B, T, D)), jnp.float32)
        w = jnp.asarray(g.normal(size=(B, T, D)), jnp.float32)

        def xla_att(q, k, v):
            qh = q.reshape(B, T, h, dh).transpose(0, 2, 1, 3)
            kh = k.reshape(B, T, h, dh).transpose(0, 2, 1, 3)
            vh = v.reshape(B, T, h, dh).transpose(0, 2, 1, 3)
            s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) * dh**-0.5
            p = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("bhqk,bhkd->bhqd", p, vh)
            return o.transpose(0, 2, 1, 3).reshape(B, T, D)

        gp = jax.grad(
            lambda q, k, v: jnp.sum(
                attention_nhd_diff(q, k, v, None, h, False, 0, True) * w
            ),
            argnums=(0, 1, 2),
        )(q, k, v)
        gx = jax.grad(
            lambda q, k, v: jnp.sum(xla_att(q, k, v) * w), argnums=(0, 1, 2)
        )(q, k, v)
        for a, b in zip(gp, gx):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_attention_impl_pallas_in_model():
    """attention_impl='pallas' on the tower config must match the XLA path
    (interpret-mode kernels on CPU)."""
    import dataclasses

    from multimodal_content_moderation_tpu.models import CLIPConfig
    from multimodal_content_moderation_tpu.models.clip import (
        CLIPTextConfig,
        CLIPVisionConfig,
        clip_image_features,
        clip_text_features,
        clip_init,
    )

    cfg = CLIPConfig(
        text=CLIPTextConfig(vocab_size=64, hidden_size=32, num_layers=1,
                            num_heads=2, intermediate_size=64, max_positions=8,
                            eos_token_id=63),
        vision=CLIPVisionConfig(hidden_size=32, num_layers=1, num_heads=2,
                                intermediate_size=64, image_size=16, patch_size=8),
        projection_dim=16,
    )
    cfg_pl = dataclasses.replace(
        cfg,
        text=dataclasses.replace(cfg.text, attention_impl="pallas"),
        vision=dataclasses.replace(cfg.vision, attention_impl="pallas"),
    )
    params = clip_init(jax.random.key(0), cfg)
    g = np.random.default_rng(0)
    ids = g.integers(1, 62, size=(2, 8)).astype(np.int32)
    ids[:, 5] = 63
    mask = np.ones((2, 8), np.int32)
    px = g.normal(size=(2, 3, 16, 16)).astype(np.float32)

    t_x = np.asarray(clip_text_features(params, ids, mask, cfg))
    t_p = np.asarray(clip_text_features(params, ids, mask, cfg_pl))
    np.testing.assert_allclose(t_p, t_x, atol=2e-5, rtol=1e-4)

    v_x = np.asarray(clip_image_features(params, px, cfg))
    v_p = np.asarray(clip_image_features(params, px, cfg_pl))
    np.testing.assert_allclose(v_p, v_x, atol=2e-5, rtol=1e-4)


class TestInKernelMasks:
    """causal/key_mask computed in-kernel (no dense [T,S] tensor in HBM)."""

    def test_flash_causal_flag(self):
        g = np.random.default_rng(20)
        BH, T, dh = 4, 256, 32
        q = g.normal(size=(BH, T, dh)).astype(np.float32)
        k = g.normal(size=(BH, T, dh)).astype(np.float32)
        v = g.normal(size=(BH, T, dh)).astype(np.float32)
        dense = np.where(
            np.arange(T)[None, :, None] >= np.arange(T)[None, None, :], 0.0, NEG_INF
        ).astype(np.float32).repeat(BH, 0).reshape(BH, T, T)
        ref = _sdpa_reference(q, k, v, dense)
        got = np.asarray(
            flash_attention(q, k, v, causal=True, interpret=True)
        )
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)

    def test_flash_key_mask(self):
        g = np.random.default_rng(21)
        BH, T, dh = 4, 256, 32
        q = g.normal(size=(BH, T, dh)).astype(np.float32)
        k = g.normal(size=(BH, T, dh)).astype(np.float32)
        v = g.normal(size=(BH, T, dh)).astype(np.float32)
        # pad out a different tail per row
        valid = np.array([256, 200, 129, 77])
        km = np.where(np.arange(T)[None, :] < valid[:, None], 0.0, NEG_INF).astype(
            np.float32
        )
        ref = _sdpa_reference(q, k, v, km[:, None, :])
        got = np.asarray(
            flash_attention(q, k, v, key_mask=km, interpret=True)
        )
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)

    def test_flash_causal_plus_key_mask(self):
        g = np.random.default_rng(22)
        BH, T, dh = 2, 256, 32
        q = g.normal(size=(BH, T, dh)).astype(np.float32)
        k = g.normal(size=(BH, T, dh)).astype(np.float32)
        v = g.normal(size=(BH, T, dh)).astype(np.float32)
        valid = np.array([256, 160])
        km = np.where(np.arange(T)[None, :] < valid[:, None], 0.0, NEG_INF).astype(
            np.float32
        )
        causal = np.where(
            np.arange(T)[:, None] >= np.arange(T)[None, :], 0.0, NEG_INF
        ).astype(np.float32)
        ref = _sdpa_reference(q, k, v, causal[None] + km[:, None, :])
        got = np.asarray(
            flash_attention(q, k, v, key_mask=km, causal=True, interpret=True)
        )
        # fully-masked causal rows beyond a row's own position are fine:
        # row i always sees key i. Compare everything.
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)

    def test_fused_mha_causal_long_ragged(self):
        """Dispatcher long path with ragged seq (padding) + causal + key
        padding, vs the dense reference."""
        g = np.random.default_rng(23)
        B, H, T, dh = 2, 2, 300, 16  # pads to 384
        q = g.normal(size=(B, H, T, dh)).astype(np.float32)
        k = g.normal(size=(B, H, T, dh)).astype(np.float32)
        v = g.normal(size=(B, H, T, dh)).astype(np.float32)
        valid = np.array([300, 250])
        km = np.where(np.arange(T)[None, :] < valid[:, None], 0.0, NEG_INF).astype(
            np.float32
        )
        causal = np.where(
            np.arange(T)[:, None] >= np.arange(T)[None, :], 0.0, NEG_INF
        ).astype(np.float32)
        dense = causal[None, None] + km[:, None, None, :]
        ref = _sdpa_reference(
            q.reshape(B * H, T, dh), k.reshape(B * H, T, dh),
            v.reshape(B * H, T, dh),
            np.broadcast_to(dense, (B, H, T, T)).reshape(B * H, T, T),
        ).reshape(B, H, T, dh)
        got = np.asarray(
            fused_mha(q, k, v, None, causal=True, key_mask=km, interpret=True)
        )
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)

    def test_fused_mha_small_path_flags(self):
        g = np.random.default_rng(24)
        B, H, T, dh = 2, 2, 64, 16
        q = g.normal(size=(B, H, T, dh)).astype(np.float32)
        k = g.normal(size=(B, H, T, dh)).astype(np.float32)
        v = g.normal(size=(B, H, T, dh)).astype(np.float32)
        km = np.where(np.arange(T)[None, :] < 50, 0.0, NEG_INF).astype(np.float32)
        km = np.broadcast_to(km, (B, T)).copy()
        causal = np.where(
            np.arange(T)[:, None] >= np.arange(T)[None, :], 0.0, NEG_INF
        ).astype(np.float32)
        dense = causal[None, None] + km[:, None, None, :]
        ref = _sdpa_reference(
            q.reshape(B * H, T, dh), k.reshape(B * H, T, dh),
            v.reshape(B * H, T, dh),
            np.broadcast_to(dense, (B, H, T, T)).reshape(B * H, T, T),
        ).reshape(B, H, T, dh)
        got = np.asarray(
            fused_mha(q, k, v, None, causal=True, key_mask=km, interpret=True)
        )
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)
