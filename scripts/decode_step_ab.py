"""Attribute the HEADLINE decode step (L=68, int8, batch 128).

decode_phase_bench.py times isolated bodies, but two of its probes are
known-broken in ways that only show up on the chip: the fused-kernel
bodies re-pad loop-invariant K/V inside the scan (full-cache copy per
rep) and the logits probe consumes the einsum through a slice, which
XLA's algebraic simplifier narrows to a (B, d) x (d, d) dot — it
measured NEGATIVE. This script instead runs FULL production decodes
(wdecode.generate) and toggles one in-loop feature at a time; the
~15-40 ms dispatch overhead cancels in the variant deltas.

Cross-attention is ablated by monkeypatching
ops.decode_attention.decode_cross_attention (decode_step imports it at
trace time) with `lambda q, ...: q * 1e-6` — the multiply keeps the
cross_q/cross_o linears alive so the delta is the kernel alone. Each
patched variant gets its own max_len (identical static args would
silently reuse the first compile — see CLAUDE.md).

The logits+argmax cost is measured standalone with a scan whose body
consumes the full (B, V) row through argmax (not reducible, not
narrowable) and carries the result.

Usage: python scripts/decode_step_ab.py [--batch 128]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--rounds", type=int, default=2)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from audio_transformers_tpu.core.profiling import enable_compilation_cache
    enable_compilation_cache()

    from audio_transformers_tpu.core.config import (DecodeConfig,
                                                    EmotionWhisperConfig,
                                                    MelConfig)
    from audio_transformers_tpu.models import whisper as wm
    from audio_transformers_tpu.models.whisper import decode as wdecode
    from audio_transformers_tpu.models.whisper import emotion as emo
    from audio_transformers_tpu.ops import decode_attention as da
    from audio_transformers_tpu.ops.mel import log_mel

    on_tpu = jax.default_backend() == "tpu"
    cfg = EmotionWhisperConfig()
    w = cfg.whisper
    mel_cfg = MelConfig.whisper()
    compute = jnp.bfloat16 if on_tpu else jnp.float32
    B = args.batch if on_tpu else 4
    REPS = args.reps if on_tpu else 1
    L = 68 if on_tpu else 12  # the bench/headline decode geometry

    rng = np.random.default_rng(0)
    waveform = jnp.asarray(
        (rng.standard_normal((B, mel_cfg.sample_rate * 30)) * 0.1)
        .astype(np.float32))
    params = emo.init(jax.random.PRNGKey(0), cfg)
    mel0 = jax.jit(lambda wv: log_mel(wv, mel_cfg).astype(compute))(waveform)
    enc0 = wm.encode_jit(params["whisper"], w, mel0, attn_impl="auto")

    real_cross = da.decode_cross_attention

    def fake_cross(q, k, v, **kw):
        return q * 1e-6

    # (name, dcfg kwargs, max_len, patch_cross)
    full = dict(repetition_penalty=1.15, no_repeat_ngram_size=3)
    variants = [
        ("i8_full", dict(kv_quant="int8", **full), L, False),
        ("i8_noproc", dict(kv_quant="int8"), L, False),
        ("i8_full_nocross", dict(kv_quant="int8", **full), L + 1, True),
        ("i8_noproc_nocross", dict(kv_quant="int8"), L + 1, True),
        ("bf16_full", dict(kv_quant="none", **full), L, False),
    ]

    def timed(name, kwargs, max_len, patch):
        da.decode_cross_attention = fake_cross if patch else real_cross
        try:
            dcfg = DecodeConfig(max_new_tokens=max_len, **kwargs)
            prompt = wdecode.build_prompt(w, dcfg)
            out = wdecode.generate(params["whisper"], w, dcfg, enc0,
                                   prompt=prompt, max_len=max_len)
            int(np.asarray(out["lengths"][0]))
            t0 = time.perf_counter()
            for _ in range(REPS):
                out = wdecode.generate(params["whisper"], w, dcfg, enc0,
                                       prompt=prompt, max_len=max_len)
            int(np.asarray(out["lengths"][0]))
            return (time.perf_counter() - t0) / REPS
        finally:
            da.decode_cross_attention = real_cross

    for v in variants:
        timed(*v)
        print(f"compiled {v[0]}", flush=True)

    results = {v[0]: [] for v in variants}
    for _ in range(args.rounds):
        for v in variants:
            results[v[0]].append(timed(*v) * 1e3)
    best = {name: min(vals) for name, vals in results.items()}

    print()
    for name, _, max_len, _ in variants:
        steps = max_len - 1
        print(f"{name:20s} {best[name]:8.1f} ms total  "
              f"{best[name] / steps:6.3f} ms/step", flush=True)
    sf = L - 1
    sn = L
    print(f"\nprocs  (full - noproc):          "
          f"{best['i8_full'] / sf - best['i8_noproc'] / sf:+.3f} ms/step")
    print(f"cross  (full - full_nocross):    "
          f"{best['i8_full'] / sf - best['i8_full_nocross'] / sn:+.3f}"
          " ms/step   (includes one-time precompute deletion ~0.02)")
    print(f"rest   (noproc_nocross):          "
          f"{best['i8_noproc_nocross'] / sn:.3f} ms/step"
          "   (self+mlp+embed+logits+argmax+loop)")

    # ---- standalone logits+argmax (scan-differencing) -------------------
    sp = jax.jit(lambda: wm.prepare_decode_params(params["whisper"], w,
                                                  dtype=compute))()
    table = sp["embed"]["table"]
    x0 = jnp.asarray(rng.standard_normal((B, w.d_model)), compute)

    def make(n):
        @jax.jit
        def fn(feed, table):
            def body(c, _):
                h = feed + c.astype(feed.dtype) * 1e-30
                lg = jnp.einsum("bd,vd->bv", h, table,
                                preferred_element_type=jnp.float32)
                nxt = jnp.argmax(lg, axis=-1)
                return nxt[:, None].astype(jnp.float32), None
            c, _ = jax.lax.scan(body, jnp.zeros((B, 1), jnp.float32),
                                None, length=n)
            return c[0, 0]
        return fn

    lo_n, hi_n = (4, 20) if on_tpu else (2, 4)
    f_lo, f_hi = make(lo_n), make(hi_n)
    float(f_lo(x0, table)); float(f_hi(x0, table))
    # min each chain length separately, then difference the mins — a
    # min over per-round differences goes negative under tunnel jitter
    t_lo = t_hi = 1e9
    for _ in range(max(args.rounds, 3)):
        t0 = time.perf_counter(); float(f_lo(x0, table))
        t_lo = min(t_lo, time.perf_counter() - t0)
        t0 = time.perf_counter(); float(f_hi(x0, table))
        t_hi = min(t_hi, time.perf_counter() - t0)
    print(f"logits+argmax standalone:         "
          f"{(t_hi - t_lo) / (hi_n - lo_n) * 1e3:.3f} ms/step")


if __name__ == "__main__":
    main()
