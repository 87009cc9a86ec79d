"""Component attribution inside one encoder block at batch 128.

Measured (v5e, whisper-tiny, B=128, T=1500, bf16, round 3):
  attn_full        8.6 ms   qkvo_projs ~0.8, mlp 3.9-6.0, LN ~0,
  attn_full_hm    10.7 ms   (head-major projections + (B,H,T,hd) math:
                             the relayout costs more than it saves)
  block_total     16.6 ms   (x4 layers = the encoder's 66 ms)

The 8.6 ms attention is the bf16 (B,H,T,T) probs materialization
(~6.9 GB write+read at 820 GB/s = 8.4 ms) — XLA's floor for the unfused
formulation, and the flash kernel is slower still at d_head=64
(encoder_attn_ab.py). The encoder is at its practical ceiling; don't
re-litigate without new evidence. NOTE: an earlier "attention is only
2 ms" reading came from consuming the benched op with jnp.sum, which
lets XLA rewrite reduce(dot)->dot(reduce) and delete the probs tensor —
this script's bodies feed the full-rank output into the carry sum only
AFTER the op chain, which has the same hazard for the *_full variants'
tails; treat single-op numbers as lower bounds.

Usage: python scripts/encoder_block_ab.py [--batch 128]
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
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--reps", type=int, default=2)
    p.add_argument("--lo", type=int, default=1)
    p.add_argument("--hi", type=int, default=5)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from audio_transformers_tpu.core.profiling import enable_compilation_cache
    enable_compilation_cache()

    from audio_transformers_tpu.core.config import EmotionWhisperConfig
    from audio_transformers_tpu.models.whisper import model as wmod
    from audio_transformers_tpu.ops import nn

    on_tpu = jax.default_backend() == "tpu"
    cfg = EmotionWhisperConfig()
    w = cfg.whisper
    compute = jnp.bfloat16 if on_tpu else jnp.float32
    B = args.batch if on_tpu else 4
    T, D, F = 1500, w.d_model, w.ffn_dim
    LO, HI, REPS = args.lo, args.hi, args.reps

    rng = np.random.default_rng(0)
    params = wmod.init(jax.random.PRNGKey(0), w)
    bp0 = params["encoder"]["blocks"][0]
    x0 = jnp.asarray(rng.standard_normal((B, T, D)) * 0.1, compute)

    def ln(feed, c):
        return nn.layer_norm(bp0["self_ln"], feed + c.astype(feed.dtype))

    def qkvo(feed, c):
        h = feed + c.astype(feed.dtype)
        sa = bp0["self_attn"]
        q = nn.linear(sa["q"], h)
        k = nn.linear(sa["k"], h)
        v = nn.linear(sa["v"], h)
        return nn.linear(sa["o"], q * 0.5 + k * 0.3 + v * 0.2)

    def attn_full(feed, c):
        h = feed + c.astype(feed.dtype)
        return nn.multihead_attention(bp0["self_attn"], h, h,
                                      num_heads=w.num_heads, impl="xla")

    def mlp(feed, c):
        h = feed + c.astype(feed.dtype)
        return nn.linear(bp0["fc2"], nn.gelu(nn.linear(bp0["fc1"], h)))

    def block(feed, c):
        return wmod._self_block(bp0, feed + c.astype(feed.dtype),
                                w.num_heads, "xla")

    def attn_full_hm(feed, c):
        """Head-major XLA attention: project straight into (B, H, T, hd)
        (permutation folded into the matmul), run the attention math in
        that layout (XLA fuses the softmax chain there — the bqhd/bkhd
        einsum formulation breaks that fusion), merge heads inside the
        output projection."""
        from audio_transformers_tpu.ops.attention import attention_reference
        from audio_transformers_tpu.ops.nn import _linear_heads
        h = feed + c.astype(feed.dtype)
        sa = bp0["self_attn"]
        q = _linear_heads(sa["q"], h, w.num_heads)
        k = _linear_heads(sa["k"], h, w.num_heads)
        v = _linear_heads(sa["v"], h, w.num_heads)
        out = attention_reference(q, k, v)
        hd = D // w.num_heads
        w_o = sa["o"]["w"].astype(out.dtype).reshape(w.num_heads, hd, -1)
        y = jnp.einsum("bhtk,hkd->btd", out, w_o,
                       preferred_element_type=jnp.float32)
        return (y + sa["o"]["b"].astype(jnp.float32)).astype(h.dtype)

    def block_hm(feed, c):
        x = feed + c.astype(feed.dtype)
        h = nn.layer_norm(bp0["self_ln"], x)
        x = x + attn_full_hm(h, jnp.float32(0))
        h = nn.layer_norm(bp0["mlp_ln"], x)
        return x + nn.linear(bp0["fc2"], nn.gelu(nn.linear(bp0["fc1"], h)))

    def matmul_sq(feed, c):
        h = (feed + c.astype(feed.dtype)).reshape(B * T, D)
        return jnp.einsum("td,dk->tk", h,
                          bp0["self_attn"]["q"]["w"].astype(h.dtype),
                          preferred_element_type=jnp.float32
                          ).astype(h.dtype)

    def matmul_ffn(feed, c):
        h = (feed + c.astype(feed.dtype)).reshape(B * T, D)
        return jnp.einsum("td,df->tf", h, bp0["fc1"]["w"].astype(h.dtype),
                          preferred_element_type=jnp.float32
                          ).astype(h.dtype)

    variants = {
        "layer_norm": ln,
        "qkvo_projs": qkvo,
        "attn_full": attn_full,
        "attn_full_hm": attn_full_hm,
        "mlp": mlp,
        "block_total": block,
        "block_hm": block_hm,
        "matmul_384x384": matmul_sq,
        "matmul_384x1536": matmul_ffn,
    }

    fns = {}
    for name, body in variants.items():
        fns[name] = {}
        for n in (LO, HI):
            @jax.jit
            def fn(feed_, body=body, n=n):
                def sbody(c, _):
                    out = body(feed_, c * 1e-30)
                    return jnp.sum(out).astype(jnp.float32) * 1e-30, None
                c, _ = jax.lax.scan(sbody, jnp.float32(0), None, length=n)
                return c.reshape(1)
            float(np.asarray(fn(x0)[0], np.float32))
            fns[name][n] = fn
        print(f"compiled {name}", flush=True)

    def rep_window(fn):
        out = None
        for _ in range(REPS):
            out = fn(x0)
        float(np.asarray(out[0], np.float32))

    best = roundrobin_min(
        {(name, n): (lambda fn=fns[name][n]: rep_window(fn))
         for name in variants for n in (LO, HI)},
        args.rounds)
    for name in variants:
        v = (best[(name, HI)] - best[(name, LO)]) / (HI - LO) / REPS * 1e3
        print(f"{name:18s} {v:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
