"""Same-process A/B: encoder attention forward, XLA vs flash variants.

Measured (v5e, B=128, H=6, T=1500, hd=64, bf16, round 3):
  attn_xla             1.54 ms   <- INVALID: consuming the output with
        jnp.sum lets XLA's algebraic simplifier rewrite
        reduce(dot) -> dot(reduce), deleting the PV matmul AND the
        (B,H,T,T) probability materialization; cost_analysis of the
        un-summed op shows 23 GB accessed (~28 ms). The in-block number
        (attn_full, scripts/encoder_block_ab.py) is the real one: 8.6 ms.
  attn_flash 256/512  11.07 ms   (512/512 9.69, 512/1536 6.65-10)
  blocks_xla          66.2 ms    blocks_flash 88.3 ms

Conclusion: the forward encoder stays on XLA ("auto" -> "xla" in
models/whisper/model.py:encode is correct); at d_head=64 the flash
kernel's MXU halves and its exp/rescale VPU chain exceeds the bf16
probs-materialization traffic XLA pays. Kept for re-running if shapes
or toolchain change.

Usage: python scripts/encoder_attn_ab.py [--batch 128]
"""

from __future__ import annotations

import argparse
import functools
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
    from audio_transformers_tpu.ops.attention import (attention_reference,
                                                      flash_attention)

    on_tpu = jax.default_backend() == "tpu"
    cfg = EmotionWhisperConfig()
    w = cfg.whisper
    compute = jnp.bfloat16 if on_tpu else jnp.float32
    B = args.batch if on_tpu else 4
    T, H, HD = 1500, w.num_heads, w.head_dim
    LO, HI, REPS = args.lo, args.hi, args.reps

    rng = np.random.default_rng(0)
    params = wmod.init(jax.random.PRNGKey(0), w)
    x0 = jnp.asarray(rng.standard_normal((B, T, w.d_model)) * 0.1, compute)
    q0 = jnp.asarray(rng.standard_normal((B, H, T, HD)) * 0.5, compute)
    k0 = jnp.asarray(rng.standard_normal((B, H, T, HD)) * 0.5, compute)
    v0 = jnp.asarray(rng.standard_normal((B, H, T, HD)) * 0.5, compute)

    # --- isolated attention op (k/v as ARGUMENTS — closing over the
    # ~150 MB buffers embeds them as program constants and kills the
    # remote compiler with HTTP 413) -------------------------------------
    def attn_xla(feed, c):
        q, k, v = feed
        q = q + c.astype(q.dtype)
        return attention_reference(q, k, v)

    def attn_flash(bq, bk, feed, c):
        q, k, v = feed
        q = q + c.astype(q.dtype)
        return flash_attention(q, k, v, block_q=bq, block_k=bk)

    # --- full encoder blocks ---------------------------------------------
    def blocks(impl, feed, c):
        x = feed + c.astype(feed.dtype)
        for bp in params["encoder"]["blocks"]:
            x = wmod._self_block(bp, x, w.num_heads, impl)
        return nn.layer_norm(params["encoder"]["ln"], x)

    qkv = (q0, k0, v0)
    variants = {
        "attn_xla": (attn_xla, qkv),
        "attn_flash_256_512": (functools.partial(attn_flash, 256, 512), qkv),
        "attn_flash_512_512": (functools.partial(attn_flash, 512, 512), qkv),
        "attn_flash_256_1536": (functools.partial(attn_flash, 256, 1536),
                                qkv),
        "attn_flash_512_1536": (functools.partial(attn_flash, 512, 1536),
                                qkv),
        "blocks_xla": (functools.partial(blocks, "xla"), x0),
        "blocks_flash": (functools.partial(blocks, "flash"), x0),
    }

    fns = {}
    for name, (body, feed) in variants.items():
        fns[name] = {}
        for n in (LO, HI):
            @jax.jit
            def fn(feed_, body=body, n=n):
                def sbody(c, _):
                    out = body(feed_, c * 1e-30)
                    return jnp.sum(out).astype(jnp.float32) * 1e-30, None
                c, _ = jax.lax.scan(sbody, jnp.float32(0), None, length=n)
                return c.reshape(1)
            float(np.asarray(fn(feed)[0], np.float32))  # compile + warm
            fns[name][n] = (fn, feed)
        print(f"compiled {name}", flush=True)

    def rep_window(fn, feed):
        out = None
        for _ in range(REPS):
            out = fn(feed)
        float(np.asarray(out[0], np.float32))

    best = roundrobin_min(
        {(name, n): (lambda fn_feed=fns[name][n]: rep_window(*fn_feed))
         for name in variants for n in (LO, HI)},
        args.rounds)
    for name in variants:
        v = (best[(name, HI)] - best[(name, LO)]) / (HI - LO) / REPS * 1e3
        print(f"{name:22s} {v:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
