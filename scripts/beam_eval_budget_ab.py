"""Beam-4 cost at the LONG (eval-like) token budget, bf16 vs int8 KV.

bench.py's beam fields run the 64/16-token budgets (L=68), where the
L-proportional costs (reorder bytes, self-attention reads) are small.
The reference's num_beams
surface is the sequence evaluator (~100-token budgets) and long serving
decodes run far past that, where the reorder's bytes grow with L. This
measures PRODUCTION generate_beam at budgets 256/64 (differenced ->
long-L marginal ms/step), interleaved round-robin:

  bf16    kv_quant="none"  — the reorder moves bf16 self-K/V
  int8    kv_quant="int8" — beams gate self-KV quantization on
          beam_self_kv_min (default 0), so BOTH budgets quantize the
          self cache and the differenced marginal stays in one regime;
          the reorder runs the int8 MXU dot on the int8 buffers (half
          the bytes, twice the MACs/s) and the f32 scale vectors move
          at Precision.HIGHEST (exact — beam.py _permute_rows_mxu).
          The self_kv_min=4 kwarg below is inert for beams; kept so
          the greedy-gating era's jit cache keys don't collide.

Methodology per CLAUDE.md: one jitted program per (variant, budget),
min per cell across interleaved rounds, difference the mins.
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
    p.add_argument("--beams", type=int, default=4)
    p.add_argument("--reps", type=int, default=2)
    p.add_argument("--rounds", type=int, default=3)
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
    from audio_transformers_tpu.models.whisper import beam as wbeam
    from audio_transformers_tpu.models.whisper import emotion as emo
    from audio_transformers_tpu.ops.mel import log_mel

    on_tpu = jax.default_backend() == "tpu"
    cfg = EmotionWhisperConfig()
    w = cfg.whisper
    mel_cfg = MelConfig.whisper()
    compute = jnp.bfloat16 if on_tpu else jnp.float32
    B = args.batch if on_tpu else 4
    HI, LO = (256, 64) if on_tpu else (12, 4)
    REPS = args.reps if on_tpu else 1

    rng = np.random.default_rng(0)
    waveform = jnp.asarray(
        (rng.standard_normal((B, mel_cfg.sample_rate * 30)) * 0.1)
        .astype(np.float32))
    params = emo.init(jax.random.PRNGKey(0), cfg)
    mel0 = jax.jit(lambda wv: log_mel(wv, mel_cfg, precision="high")
                   .astype(compute))(waveform)
    enc0 = wm.encode_jit(params["whisper"], w, mel0, attn_impl="auto")
    enc0.block_until_ready()

    VARIANTS = {
        "bf16": dict(kv_quant="none"),
        "int8": dict(kv_quant="int8", self_kv_min=4),
    }

    def call(variant: str, budget: int):
        d = DecodeConfig(max_new_tokens=budget, num_beams=args.beams,
                         repetition_penalty=1.15, no_repeat_ngram_size=3,
                         **VARIANTS[variant])
        return wbeam.generate_beam(params["whisper"], w, d, enc0)["lengths"]

    def sync(x):
        return float(np.asarray(x.reshape(-1)[0], np.float32))

    def min_time(fn, reps):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(fn())
            best = min(best, time.perf_counter() - t0)
        return best

    for v in VARIANTS:
        for budget in (HI, LO):
            t0 = time.perf_counter()
            sync(call(v, budget))
            print(f"compiled {v}/{budget} ({time.perf_counter()-t0:.1f}s)",
                  flush=True)

    best = {}
    for r in range(args.rounds):
        for v in VARIANTS:
            for budget in (HI, LO):
                k = (v, budget)
                best[k] = min(best.get(k, float("inf")),
                              min_time(lambda: call(v, budget), REPS))
        print(f"round {r} done", flush=True)

    print(f"\n== beam-{args.beams} long-budget marginal "
          f"(B={B}, budgets {HI}/{LO}, pen 1.15 + ngram 3) ==")
    for v in VARIANTS:
        hi, lo = best[(v, HI)], best[(v, LO)]
        ms = (hi - lo) / (HI - LO) * 1e3
        print(f"{v:5s} {ms:7.3f} ms/step   "
              f"(totals {hi*1e3:.0f} / {lo*1e3:.0f} ms)", flush=True)


if __name__ == "__main__":
    main()
