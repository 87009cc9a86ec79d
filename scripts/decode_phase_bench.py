"""Component-level attribution for the decode step at batch 128.

Times each piece of the decode-loop body in isolation (exact shapes,
layouts and dtypes of the real step) with the repo's scan-differencing
methodology (see phase_bench.py header), so the gap between the measured
per-step cost and the HBM bandwidth floor can be attributed:

  self_step   4-layer incremental self-attn + MLP (cache update included)
  cross_bf16  4-layer cross-attention against bf16 (B,H,hd,T) K/V
  cross_int8  same with int8 K/V + scale folding (the production int8 path)
  logits      tied projection (B,D) @ (V,D)^T -> fp32 (B,V)
  procs       fused logit-processor chain + argmax on a (B,V) feed

Usage: python scripts/decode_phase_bench.py [--batch 128]
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
    p.add_argument("--buf", type=int, default=68)
    p.add_argument("--rounds", type=int, default=2)
    p.add_argument("--reps", type=int, default=2)
    p.add_argument("--lo", type=int, default=2)
    p.add_argument("--hi", type=int, default=10)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from audio_transformers_tpu.core.profiling import (
        enable_compilation_cache)
    enable_compilation_cache()

    from audio_transformers_tpu.core.config import (DecodeConfig,
                                                    EmotionWhisperConfig,
                                                    MelConfig)
    from audio_transformers_tpu.models import whisper as wm
    from audio_transformers_tpu.models.whisper import decode as wdecode
    from audio_transformers_tpu.models.whisper import emotion as emo
    from audio_transformers_tpu.ops import nn
    from audio_transformers_tpu.ops.mel import log_mel

    on_tpu = jax.default_backend() == "tpu"
    cfg = EmotionWhisperConfig()
    w = cfg.whisper
    mel_cfg = MelConfig.whisper()
    compute = jnp.bfloat16 if on_tpu else jnp.float32
    B = args.batch if on_tpu else 4
    LBUF = args.buf
    LO, HI, REPS = args.lo, args.hi, args.reps
    if not on_tpu:
        HI = 3

    rng = np.random.default_rng(0)
    waveform = jnp.asarray(
        (rng.standard_normal((B, mel_cfg.sample_rate * 30)) * 0.1)
        .astype(np.float32))
    params = emo.init(jax.random.PRNGKey(0), cfg)
    mel = jax.jit(lambda wv: log_mel(wv, mel_cfg).astype(compute))(waveform)
    enc = wm.encode_jit(params["whisper"], w, mel, attn_impl="xla")

    # the XLA bodies consume the production (unpadded) K/V; the fused
    # bodies need block-padded time axes built OUTSIDE the scan (an
    # in-body jnp.pad copies the whole cache every rep — +3.3 ms/step
    # measured). pad_cross_time runs outside jit so its t_valid stays a
    # static python int.
    cross16 = jax.jit(lambda e: wm.precompute_cross_attention(
        params["whisper"], w, e, quant="none"))(enc)
    cross8 = jax.jit(lambda e: wm.precompute_cross_attention(
        params["whisper"], w, e, quant="int8"))(enc)
    cross16p = wm.pad_cross_time(cross16)
    cross8p = wm.pad_cross_time(cross8)
    cross4p = wm.pad_cross_time(jax.jit(
        lambda e: wm.precompute_cross_attention(
            params["whisper"], w, e, quant="int4"))(enc))
    sp = jax.jit(lambda: wm.prepare_decode_params(params["whisper"], w,
                                                  dtype=compute))()
    cache = wm.init_cache(w, B, max_len=LBUF, dtype=compute)
    x0 = jnp.asarray(rng.standard_normal((B, w.d_model)), compute)
    d = w.d_model
    heads, hd = w.num_heads, w.head_dim
    import math
    scale = 1.0 / math.sqrt(hd)
    idx0 = jnp.int32(LBUF // 2)
    dcfg = DecodeConfig(max_new_tokens=64, no_repeat_ngram_size=3,
                        repetition_penalty=1.15)
    tokens0 = jnp.asarray(rng.integers(100, 5000, (B, LBUF)), jnp.int32)
    logits0 = jnp.asarray(rng.standard_normal((B, w.vocab_size)), jnp.float32)

    # ---- bodies (feed, c) -> consumable output ------------------------
    # NOTE: the K/V buffers (cache ~53 MB, cross ~0.6 GB at batch 128) are
    # passed as jit ARGUMENTS via the closure dict `ops` below — closing
    # over them directly embeds them as program constants, which breaks
    # the remote compiler. Step params (~16 MB) stay closed over, matching
    # the in-pipeline closure behavior (see phase_bench.py).
    def self_step_body(feed, c, ops):
        x = feed + c.astype(feed.dtype) * 1e-30
        pos_ids = jnp.arange(LBUF)
        attn_mask = (pos_ids <= idx0)[None, None, :]
        for li, bp in enumerate(sp["blocks"]):
            h = nn.layer_norm(bp["self_ln"], x)
            qkv = nn.linear(bp["qkv"], h)
            q = qkv[:, :d].reshape(B, heads, hd)
            k_new = qkv[:, d:2 * d].reshape(B, heads, hd, 1)
            v_new = qkv[:, 2 * d:].reshape(B, heads, hd, 1)
            k_all = jax.lax.dynamic_update_slice(
                ops["cache"]["k"][li], k_new, (0, 0, 0, idx0))
            v_all = jax.lax.dynamic_update_slice(
                ops["cache"]["v"][li], v_new, (0, 0, 0, idx0))
            logits = jnp.einsum("bhd,bhdk->bhk", q, k_all,
                                preferred_element_type=jnp.float32) * scale
            logits = jnp.where(attn_mask, logits,
                               jnp.finfo(jnp.float32).min)
            probs = jax.nn.softmax(logits, axis=-1).astype(v_all.dtype)
            attn = jnp.einsum("bhk,bhdk->bhd", probs, v_all,
                              preferred_element_type=jnp.float32
                              ).astype(x.dtype)
            x = x + nn.linear(bp["self_o"], attn.reshape(B, d))
            h = nn.layer_norm(bp["mlp_ln"], x)
            x = x + nn.linear(bp["fc2"], nn.gelu(nn.linear(bp["fc1"], h)))
        return x

    def cross_bf16_body(feed, c, ops):
        x = feed + c.astype(feed.dtype) * 1e-30
        for li, bp in enumerate(sp["blocks"]):
            h = nn.layer_norm(bp["cross_ln"], x)
            cq = nn.linear(bp["cross_q"], h).reshape(B, heads, hd)
            clogits = jnp.einsum("bhd,bhdk->bhk", cq, ops["cross16"]["k"][li],
                                 preferred_element_type=jnp.float32) * scale
            cprobs = jax.nn.softmax(clogits, axis=-1).astype(x.dtype)
            cattn = jnp.einsum("bhk,bhdk->bhd", cprobs, ops["cross16"]["v"][li],
                               preferred_element_type=jnp.float32
                               ).astype(x.dtype)
            x = x + nn.linear(bp["cross_o"], cattn.reshape(B, d))
        return x

    def cross_int8_body(feed, c, ops):
        x = feed + c.astype(feed.dtype) * 1e-30
        for li, bp in enumerate(sp["blocks"]):
            h = nn.layer_norm(bp["cross_ln"], x)
            cq = nn.linear(bp["cross_q"], h).reshape(B, heads, hd)
            cq32 = cq.astype(jnp.float32)
            q_scale = jnp.maximum(jnp.max(jnp.abs(cq32), axis=-1,
                                          keepdims=True), 1e-6) / 127.0
            q_i8 = jnp.round(cq32 / q_scale).astype(jnp.int8)
            cl_i32 = jnp.einsum("bhd,bhdk->bhk", q_i8, ops["cross8"]["k"][li],
                                preferred_element_type=jnp.int32)
            clogits = (cl_i32.astype(jnp.float32) * q_scale
                       * ops["cross8"]["k_scale"][li] * scale)
            cprobs = jax.nn.softmax(clogits, axis=-1)
            p_scale = jnp.max(cprobs, axis=-1, keepdims=True) / 127.0
            p_i8 = jnp.round(cprobs / p_scale).astype(jnp.int8)
            ca_i32 = jnp.einsum("bhk,bhdk->bhd", p_i8, ops["cross8"]["v"][li],
                                preferred_element_type=jnp.int32)
            cattn = (ca_i32.astype(jnp.float32) * p_scale
                     * ops["cross8"]["v_scale"][li]).astype(x.dtype)
            x = x + nn.linear(bp["cross_o"], cattn.reshape(B, d))
        return x

    def logits_body(feed, c, ops):
        # consume through argmax: a slice would let XLA's algebraic
        # simplifier narrow the dot to (B, slice) and a plain sum would
        # rewrite reduce(dot) -> dot(reduce) — both delete the benched op
        # (this probe once measured NEGATIVE through a slice)
        x = feed + c.astype(feed.dtype) * 1e-30
        table = sp["embed"]["table"]
        out = jnp.einsum("bd,vd->bv", x, table,
                         preferred_element_type=jnp.float32)
        return jnp.argmax(out, axis=-1)[:, None].astype(jnp.float32)

    def procs_body(feed, c, ops):
        lg = logits0 + c * 1e-30 + feed[:, :1] * 0.0
        lg = wdecode._process_logits(
            lg, tokens0, idx0, w, dcfg, 4,
            wdecode.default_suppress_ids(w), (220, w.eos_token_id))
        nxt = jnp.argmax(lg, axis=-1).astype(jnp.int32)
        return nxt[:, None].astype(jnp.float32) * 1e-30 + feed[:, :1]

    from audio_transformers_tpu.ops.decode_attention import (
        decode_cross_attention)

    def make_fused_body(key, t_valid):
        # t_valid is captured STATICALLY (it configures the kernel); the
        # ops dicts passed as jit arguments hold arrays only
        def body(feed, c, ops):
            x = feed + c.astype(feed.dtype) * 1e-30
            cr = ops[key]
            quant = "k_scale" in cr
            for li, bp in enumerate(sp["blocks"]):
                h = nn.layer_norm(bp["cross_ln"], x)
                cq = nn.linear(bp["cross_q"], h).reshape(B, heads, hd)
                cattn = decode_cross_attention(
                    cq, cr["k"][li], cr["v"][li],
                    k_scale=cr["k_scale"][li] if quant else None,
                    v_scale=cr["v_scale"][li] if quant else None,
                    t_valid=t_valid,
                    scale=scale).astype(x.dtype)
                x = x + nn.linear(bp["cross_o"], cattn.reshape(B, d))
            return x
        return body

    def strip_tv(cr):
        return {k: v for k, v in cr.items() if k != "t_valid"}

    variants = {
        "self_step": self_step_body,
        "cross_bf16": cross_bf16_body,
        "cross_int8": cross_int8_body,
        "cross_fused16": make_fused_body("cross16p", cross16p["t_valid"]),
        "cross_fused8": make_fused_body("cross8p", cross8p["t_valid"]),
        "cross_fused4": make_fused_body("cross4p", cross4p["t_valid"]),
        "logits": logits_body,
        "procs": procs_body,
    }

    all_ops = {"cache": cache, "cross16": cross16, "cross8": cross8,
               "cross16p": strip_tv(cross16p), "cross8p": strip_tv(cross8p),
               "cross4p": strip_tv(cross4p)}
    fns = {}
    for name, body in variants.items():
        fns[name] = {}
        for n in (LO, HI):
            @jax.jit
            def fn(feed, ops, body=body, n=n):
                def sbody(carry, _):
                    out = body(feed, carry, ops)
                    return jnp.sum(out.astype(jnp.float32)) * 1e-30, None
                cc, _ = jax.lax.scan(sbody, jnp.float32(0), None, length=n)
                return cc.reshape(1)
            float(np.asarray(fn(x0, all_ops)[0], np.float32))
            fns[name][n] = fn

    def rep_window(fn):
        out = None
        for _ in range(REPS):
            out = fn(x0, all_ops)
        float(np.asarray(out[0], np.float32))

    best = roundrobin_min(
        {(name, n): (lambda fn=fns[name][n]: rep_window(fn))
         for name in variants for n in (LO, HI)},
        args.rounds)
    total = 0.0
    production = ("self_step", "cross_fused8", "logits", "procs")
    for name in variants:
        v = (best[(name, HI)] - best[(name, LO)]) / (HI - LO) / REPS * 1e3
        if name in production:
            total += v
        print(f"{name:14s} {v:8.3f} ms", flush=True)
    print(f"sum (production int8 step: {'+'.join(production)}): "
          f"{total:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
