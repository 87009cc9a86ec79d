"""Attribute the length-dependent decode cost at the segment-eval budget.

L=268 greedy decode costs ~2.7 ms/step vs ~1.1 at L=68 (round 3) while
the mechanistically expected growth (self-KV read + mask-path processor
scatters) explains well under half of it. Runs FULL decodes at a fixed
buffer (max_len=268; greedy on random weights never EOSes every row, so
the loop runs all 267 steps) and toggles one feature at a time — the
~15-40 ms dispatch overhead cancels in the variant DELTAS, which is what
attribution needs. A max_len=140 base run gives the per-step slope.

Usage: python scripts/decode_len_ab.py [--batch 128]
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
    from audio_transformers_tpu.ops.mel import log_mel

    on_tpu = jax.default_backend() == "tpu"
    cfg = EmotionWhisperConfig()
    w = cfg.whisper
    mel_cfg = MelConfig.whisper()
    compute = jnp.bfloat16 if on_tpu else jnp.float32
    B = args.batch if on_tpu else 4
    REPS = args.reps if on_tpu else 1
    L, L_SHORT = (268, 140) if on_tpu else (24, 16)
    L_TINY = 68 if on_tpu else 12  # the bench/headline decode geometry

    rng = np.random.default_rng(0)
    waveform = jnp.asarray(
        (rng.standard_normal((B, mel_cfg.sample_rate * 30)) * 0.1)
        .astype(np.float32))
    params = emo.init(jax.random.PRNGKey(0), cfg)
    mel0 = jax.jit(lambda wv: log_mel(wv, mel_cfg, precision="high")
                   .astype(compute))(waveform)
    enc0 = wm.encode_jit(params["whisper"], w, mel0, attn_impl="auto")

    # (name, dcfg kwargs, max_len) — the selfoff variant disables self-KV
    # quantization via DecodeConfig.self_kv_min, which is part of the jit
    # cache key (hashable static arg), so it gets its own program.
    variants = [
        ("noproc_tiny", dict(kv_quant="none"), L_TINY),
        ("pen_tiny", dict(kv_quant="none", repetition_penalty=1.15),
         L_TINY),
        ("full_tiny", dict(kv_quant="none", repetition_penalty=1.15,
                           no_repeat_ngram_size=3), L_TINY),
        ("noproc_short", dict(kv_quant="none"), L_SHORT),
        ("noproc", dict(kv_quant="none"), L),
        ("pen", dict(kv_quant="none", repetition_penalty=1.15), L),
        ("ngram", dict(kv_quant="none", no_repeat_ngram_size=3), L),
        ("full", dict(kv_quant="none", repetition_penalty=1.15,
                      no_repeat_ngram_size=3), L),
        ("full_ts", dict(kv_quant="none", repetition_penalty=1.15,
                         no_repeat_ngram_size=3, return_timestamps=True),
         L),
        ("i8_full", dict(kv_quant="int8", repetition_penalty=1.15,
                         no_repeat_ngram_size=3), L),
        ("i8_full_selfoff", dict(kv_quant="int8", repetition_penalty=1.15,
                                 no_repeat_ngram_size=3,
                                 self_kv_min=10 ** 9), L),
    ]

    def timed(name, kwargs, max_len):
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

    for name, kwargs, max_len in variants:
        timed(name, kwargs, max_len)
        print(f"compiled {name}", flush=True)

    results = {name: [] for name, _, _ in variants}
    for _ in range(args.rounds):
        for name, kwargs, max_len in variants:
            results[name].append(timed(name, kwargs, max_len) * 1e3)
    best = {name: min(vals) for name, vals in results.items()}
    base = best["noproc"]
    slope = (base - best["noproc_short"]) / (L - L_SHORT)
    print(f"\nnoproc total {base:.1f} ms over {L - 1} steps "
          f"(marginal per-step from L-slope: {slope:.3f} ms)", flush=True)
    for name, _, max_len in variants:
        if name == "noproc_short":
            continue
        ref = "noproc_tiny" if name.endswith("_tiny") else "noproc"
        steps = max_len - 1
        print(f"{name:18s} {best[name]:8.1f} ms total  "
              f"{best[name]/steps:6.3f} ms/step  "
              f"delta vs {ref} {(best[name]-best[ref])/steps:+.3f} ms/step",
              flush=True)


if __name__ == "__main__":
    main()
