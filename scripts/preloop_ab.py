"""A/B: fused cross-KV precompute vs the per-layer formulation.

pipeline_phase_bench attributes 14.1 ms (b128 int8) to the decode
pre-loop; the cross-K/V projections + transposes + quantize dominate it.
Variants:
  current      precompute_cross_attention as shipped (8 separate
               projections, each split/transposed/quantized)
  fused_bct    ONE (D, 8D) projection matmul emitted directly in the
               time-minor (B, C, T) layout (einsum "btd,dc->bct"), so
               the per-tensor transposes disappear; per-layer slices of
               the channel axis are contiguous views
  fused_btc    same single matmul in natural (B, T, C) layout, then the
               usual per-tensor transposes (isolates the matmul-fusion
               win from the layout win)

Parity: dequantized K/V and scales must match `current` to fp32 noise.

Usage: python scripts/preloop_ab.py [--batch 128] [--quant int8]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

from _ab import roundrobin_min  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--quant", default="int8")
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--lo", type=int, default=2)
    p.add_argument("--hi", type=int, default=10)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from audio_transformers_tpu.core.config import (EmotionWhisperConfig,
                                                    MelConfig)
    from audio_transformers_tpu.core.profiling import (
        enable_compilation_cache)
    from audio_transformers_tpu.models import whisper as wm
    from audio_transformers_tpu.models.whisper import emotion as emo
    from audio_transformers_tpu.ops.mel import log_mel

    enable_compilation_cache()
    cfg = EmotionWhisperConfig()
    w = cfg.whisper
    B = args.batch
    quant = args.quant
    rng = np.random.default_rng(0)
    mel_cfg = MelConfig.whisper()
    params = emo.init(jax.random.PRNGKey(0), cfg)["whisper"]
    wav = jnp.asarray((rng.standard_normal(
        (B, mel_cfg.sample_rate * 30)) * 0.1).astype(np.float32))
    mel = jax.jit(lambda x: log_mel(x, mel_cfg).astype(jnp.bfloat16))(wav)
    enc = wm.encode_jit(params, w, mel, attn_impl="auto")

    d = w.d_model
    h, hd = w.num_heads, w.head_dim
    L = w.decoder_layers
    qmax = {"int8": 127.0, "int4": 7.0, "none": None}[quant]

    def fused_weights(dtype):
        ws, bs = [], []
        for bp in params["decoder"]["blocks"]:
            for name in ("k", "v"):
                lin = bp["cross_attn"][name]
                ws.append(lin["w"])
                bs.append(lin.get("b", jnp.zeros((d,), jnp.float32)))
        return (jnp.concatenate(ws, axis=1).astype(dtype),
                jnp.concatenate(bs).astype(dtype))

    def quantize(k, v):
        # k, v (B, H, hd, T) in the storage layout
        if quant == "none":
            return k, v, None, None
        ks = jnp.maximum(jnp.max(jnp.abs(k), axis=2, keepdims=True)
                         .astype(jnp.float32), 1e-6) / qmax
        vs = jnp.maximum(jnp.max(jnp.abs(v), axis=3, keepdims=True)
                         .astype(jnp.float32), 1e-6) / qmax
        kq = jnp.round(k.astype(jnp.float32) / ks).astype(jnp.int8)
        vq = jnp.round(v.astype(jnp.float32) / vs).astype(jnp.int8)
        return kq, vq, ks[:, :, 0, :], vs[:, :, :, 0]

    def pre_fused_bct(enc):
        b = enc.shape[0]
        wf, bf = fused_weights(enc.dtype)
        kv = jnp.einsum("btd,dc->bct", enc, wf,
                        preferred_element_type=jnp.float32) \
            + bf[None, :, None]
        kv = kv.astype(enc.dtype)                # (B, 8D, T)
        out = {"k": [], "v": []}
        if quant != "none":
            out["k_scale"], out["v_scale"] = [], []
        t = enc.shape[1]
        for li in range(L):
            k = kv[:, (2 * li) * d:(2 * li + 1) * d].reshape(b, h, hd, t)
            v = kv[:, (2 * li + 1) * d:(2 * li + 2) * d].reshape(b, h, hd,
                                                                 t)
            kq, vq, ks, vs = quantize(k, v)
            out["k"].append(kq)
            out["v"].append(vq)
            if quant != "none":
                out["k_scale"].append(ks)
                out["v_scale"].append(vs)
        return out

    def pre_fused_btc(enc):
        b = enc.shape[0]
        wf, bf = fused_weights(enc.dtype)
        kv = (enc @ wf + bf[None, None, :])      # (B, T, 8D)
        out = {"k": [], "v": []}
        if quant != "none":
            out["k_scale"], out["v_scale"] = [], []
        t = enc.shape[1]
        for li in range(L):
            k = kv[:, :, (2 * li) * d:(2 * li + 1) * d] \
                .reshape(b, t, h, hd).transpose(0, 2, 3, 1)
            v = kv[:, :, (2 * li + 1) * d:(2 * li + 2) * d] \
                .reshape(b, t, h, hd).transpose(0, 2, 3, 1)
            kq, vq, ks, vs = quantize(k, v)
            out["k"].append(kq)
            out["v"].append(vq)
            if quant != "none":
                out["k_scale"].append(ks)
                out["v_scale"].append(vs)
        return out

    variants = {
        "current": lambda e: wm.precompute_cross_attention(
            params, w, e, quant=quant),
        "fused_bct": pre_fused_bct,
        "fused_btc": pre_fused_btc,
    }

    # ---- parity (dequantized)
    def dequant(c):
        if quant == "none":
            return c["k"][0].astype(jnp.float32), \
                c["v"][0].astype(jnp.float32)
        return (c["k"][0].astype(jnp.float32)
                * c["k_scale"][0][:, :, None, :],
                c["v"][0].astype(jnp.float32)
                * c["v_scale"][0][:, :, :, None])

    ref = jax.jit(variants["current"])(enc[:4])
    rk, rv = (np.asarray(x) for x in dequant(ref))
    for name in ("fused_bct", "fused_btc"):
        got = jax.jit(variants[name])(enc[:4])
        gk, gv = (np.asarray(x) for x in dequant(got))
        dk = np.abs(gk - rk).max() / (np.abs(rk).max() + 1e-9)
        dv = np.abs(gv - rv).max() / (np.abs(rv).max() + 1e-9)
        print(f"parity {name}: rel max|dK|={dk:.2e} rel max|dV|={dv:.2e}",
              flush=True)

    # ---- timing
    timed = {}
    for name, fn in variants.items():
        for n in (args.lo, args.hi):
            @jax.jit
            def chained(enc, fn=fn, n=n):
                def body(c, _):
                    out = fn(enc + c.astype(enc.dtype))
                    leaves = [x.reshape(-1)[:1].astype(jnp.float32)
                              for x in jax.tree.leaves(out)]
                    return jnp.concatenate(leaves).sum() * 1e-30, None
                c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
                return c
            float(chained(enc))
            timed[(name, n)] = (lambda chained=chained:
                                float(chained(enc)))
        print(f"compiled {name}", flush=True)
    best = roundrobin_min(timed, args.rounds)
    span = args.hi - args.lo
    for name in variants:
        ms = (best[(name, args.hi)] - best[(name, args.lo)]) / span * 1e3
        print(f"{name:10s} {ms:7.2f} ms @ b{B} quant={quant}")


if __name__ == "__main__":
    main()
