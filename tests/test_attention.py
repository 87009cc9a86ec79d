"""Flash-attention kernel parity tests (interpret mode on CPU; exercised
compiled on real TPU by bench.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_transformers_tpu.ops.attention import (attention_reference,
                                                  flash_attention)


def _qkv(b, h, tq, tk, d, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.standard_normal((b, h, tq, d)).astype(dtype)),
            jnp.asarray(rng.standard_normal((b, h, tk, d)).astype(dtype)),
            jnp.asarray(rng.standard_normal((b, h, tk, d)).astype(dtype)))


@pytest.mark.parametrize("tq,tk,causal", [
    (256, 256, False),
    (300, 300, False),     # non-multiple of block -> padding + masking
    (128, 384, False),     # cross-attention shape
    (256, 256, True),
    (200, 200, True),
])
def test_flash_matches_reference(tq, tk, causal):
    q, k, v = _qkv(2, 3, tq, tk, 64, seed=tq + tk)
    got = flash_attention(q, k, v, causal=causal, block_q=128, block_k=128)
    want = attention_reference(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_flash_in_encoder_matches_xla():
    from audio_transformers_tpu.core.config import WhisperConfig
    from audio_transformers_tpu.models import whisper as wm

    cfg = WhisperConfig.test()
    params = wm.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    mel = jnp.asarray(rng.standard_normal(
        (2, 2 * cfg.max_source_positions, cfg.n_mels)).astype(np.float32))
    a = wm.encode(params, cfg, mel, attn_impl="xla")
    b = wm.encode(params, cfg, mel, attn_impl="flash")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-4, atol=2e-5)


class TestFlashBackward:
    @pytest.mark.parametrize("tq,tk,causal", [
        (256, 256, False),
        (300, 300, True),      # padding + causal
        (128, 384, False),     # cross-attention shape
    ])
    def test_grads_match_reference(self, tq, tk, causal):
        q, k, v = _qkv(2, 2, tq, tk, 64, seed=tq * 2 + tk)

        def loss_flash(q, k, v):
            o = flash_attention(q, k, v, causal=causal,
                                block_q=128, block_k=128)
            return jnp.sum(jnp.sin(o.astype(jnp.float32)))

        def loss_ref(q, k, v):
            o = attention_reference(q, k, v, causal=causal)
            return jnp.sum(jnp.sin(o.astype(jnp.float32)))

        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for gf, gr, name in zip(g_flash, g_ref, "qkv"):
            np.testing.assert_allclose(
                np.asarray(gf), np.asarray(gr), rtol=5e-3, atol=5e-4,
                err_msg=f"d{name} mismatch (tq={tq}, tk={tk}, "
                        f"causal={causal})")

    def test_grad_through_encoder(self):
        from audio_transformers_tpu.core.config import WhisperConfig
        from audio_transformers_tpu.models import whisper as wm

        cfg = WhisperConfig.test()
        params = wm.init(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(2)
        mel = jnp.asarray(rng.standard_normal(
            (2, 2 * cfg.max_source_positions, cfg.n_mels))
            .astype(np.float32))

        def loss(params, impl):
            out = wm.encode(params, cfg, mel, attn_impl=impl)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        g_flash = jax.grad(lambda p: loss(p, "flash"))(params)
        g_xla = jax.grad(lambda p: loss(p, "xla"))(params)
        for (path, a), (_, b) in zip(
                jax.tree_util.tree_leaves_with_path(g_flash),
                jax.tree_util.tree_leaves_with_path(g_xla)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-3, atol=1e-3,
                                       err_msg=str(path))


class TestDecodeAttention:
    @pytest.mark.parametrize("b,h,t", [(4, 6, 1500), (3, 2, 100),
                                       (1, 6, 513)])
    def test_matches_reference(self, b, h, t):
        from audio_transformers_tpu.ops.decode_attention import (
            decode_cross_attention, decode_cross_attention_reference)

        rng = np.random.default_rng(b * t)
        q = jnp.asarray(rng.standard_normal((b, h, 64)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((b, h, 64, t))
                        .astype(np.float32))
        v = jnp.asarray(rng.standard_normal((b, h, 64, t))
                        .astype(np.float32))
        got = decode_cross_attention(q, k, v)
        want = decode_cross_attention_reference(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_int8_scales_match_reference(self):
        from audio_transformers_tpu.ops.decode_attention import (
            decode_cross_attention, decode_cross_attention_reference)

        b, h, t, hd = 2, 3, 300, 64
        rng = np.random.default_rng(9)
        q = jnp.asarray(rng.standard_normal((b, h, hd)).astype(np.float32))
        k8 = jnp.asarray(rng.integers(-127, 128, (b, h, hd, t))
                         .astype(np.int8))
        v8 = jnp.asarray(rng.integers(-127, 128, (b, h, hd, t))
                         .astype(np.int8))
        ks = jnp.asarray(rng.uniform(0.005, 0.02, (b, h, t))
                         .astype(np.float32))
        vs = jnp.asarray(rng.uniform(0.005, 0.02, (b, h, hd))
                         .astype(np.float32))
        got = decode_cross_attention(q, k8, v8, k_scale=ks, v_scale=vs)
        want = decode_cross_attention_reference(q, k8, v8, k_scale=ks,
                                                v_scale=vs)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_default_blocks_chip_validated(self):
        """Lock the on-chip sweep results: int4 must default to 64 at the
        production geometry (128 OOMs Mosaic's scoped-VMEM stack — the
        unpack temporaries cost ~12 B/packed element), int8 to 64, bf16
        to 32 (double-buffered K+V ~12.6 MB)."""
        from audio_transformers_tpu.ops.decode_attention import (
            default_block_bh, preferred_block_t)

        bt = preferred_block_t(1500)   # 768
        assert default_block_bh(1, bt, int4=True) == 64
        assert default_block_bh(1, bt, int4=False) == 64   # int8
        assert default_block_bh(2, bt, int4=False) == 32   # bf16
        assert default_block_bh(4, bt, int4=False) == 16   # f32
        # never below the 8-sublane minimum, even at huge time blocks
        assert default_block_bh(4, 4 * bt, int4=False) == 8

    def test_int4_pack_unpack_roundtrip(self):
        from audio_transformers_tpu.ops.decode_attention import (pack_int4,
                                                                 unpack_int4)

        rng = np.random.default_rng(3)
        x = rng.integers(-8, 8, (2, 3, 64, 10)).astype(np.int32)
        rt = np.asarray(unpack_int4(pack_int4(jnp.asarray(x))))
        np.testing.assert_array_equal(rt, x)

    @pytest.mark.parametrize("t,t_pad", [(300, None), (300, "blocks")])
    def test_int4_matches_oracle(self, t, t_pad):
        """Nibble-packed K/V with even/odd-split scales: the kernel's
        two-half-block online softmax must equal the dequantizing XLA
        oracle, with and without kernel-block time padding (t_valid)."""
        from audio_transformers_tpu.ops.decode_attention import (
            decode_cross_attention, decode_cross_attention_reference,
            pack_int4, preferred_block_t)

        b, h, hd = 2, 3, 64
        rng = np.random.default_rng(17)
        q = jnp.asarray(rng.standard_normal((b, h, hd)).astype(np.float32))
        k4 = pack_int4(jnp.asarray(
            rng.integers(-8, 8, (b, h, hd, t)).astype(np.int32)))
        v4 = pack_int4(jnp.asarray(
            rng.integers(-8, 8, (b, h, hd, t)).astype(np.int32)))
        ks = jnp.asarray(rng.uniform(0.05, 0.2, (b, h, 2, t // 2))
                         .astype(np.float32))
        vs = jnp.asarray(rng.uniform(0.05, 0.2, (b, h, hd))
                         .astype(np.float32))
        want = decode_cross_attention_reference(q, k4, v4, k_scale=ks,
                                                v_scale=vs)
        kw = {}
        if t_pad == "blocks":
            bt = preferred_block_t(t)
            bt += (-bt) % 256  # int4 packed lane extent needs bt/2 % 128
            half = (-(-t // bt) * bt) // 2

            def padh(x):
                return jnp.pad(x, ((0, 0),) * (x.ndim - 1)
                               + ((0, half - x.shape[-1]),))

            k4, v4, ks = padh(k4), padh(v4), padh(ks)
            kw["t_valid"] = t
        got = decode_cross_attention(q, k4, v4, k_scale=ks, v_scale=vs,
                                     **kw)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize("quant", ["none", "int8", "int4"])
    def test_decoder_step_fused_matches_xla(self, quant):
        from audio_transformers_tpu.core.config import WhisperConfig
        from audio_transformers_tpu.models import whisper as wm

        cfg = WhisperConfig.test()
        params = wm.init(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(5)
        mel = jnp.asarray(rng.standard_normal(
            (2, 2 * cfg.max_source_positions, cfg.n_mels))
            .astype(np.float32))
        enc = wm.encode(params, cfg, mel)
        cross = wm.precompute_cross_attention(params, cfg, enc, quant=quant)
        cache_a = wm.init_cache(cfg, 2, max_len=8)
        cache_b = wm.init_cache(cfg, 2, max_len=8)
        tok = jnp.asarray(np.array([5, 9], np.int32))
        ha, _ = wm.apply_decoder_step(params, cfg, tok, cache_a, cross,
                                      attn_impl="xla")
        hb, _ = wm.apply_decoder_step(params, cfg, tok, cache_b, cross,
                                      attn_impl="fused")
        # int8: the fused kernel never quantizes q or the probabilities,
        # so it is CLOSER to exact than the XLA int8 path — compare both
        # against each other loosely there, tightly for bf16/f32. int4's
        # XLA fallback dequantizes through the kernel's own oracle, so it
        # compares tightly too.
        tol = dict(rtol=0.05, atol=0.02) if quant == "int8" \
            else dict(rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(ha), np.asarray(hb), **tol)
