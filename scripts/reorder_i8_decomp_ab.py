"""Decompose the long-budget int8 beam reorder regression.

The exactness fixes in beam._permute_rows_mxu (int8 x int8 -> int32
dot; f32 scales at Precision.HIGHEST) moved the budgets-256/64 int8
marginal 9.56 -> 11.74 ms/step (scripts/beam_eval_budget_ab.py, bf16
variant unchanged at 12.27 in the same runs). This isolates which
piece pays, in PRODUCTION generate_beam at kv_quant="int8":

  cur    whatever beam._permute_rows_mxu currently does
  i8pro  bf16-promote dot on int8 buffers + HIGHEST f32 scales
  demot  int8 dot + default-precision bf16 tensordot on f32 scales
         (the pre-fix DEMOTING path — numerically wrong, timing only)

RESULT (v5e, B=128/N=4): with cur = int8 dot + HIGHEST it measured
cur 11.741 / i8pro 9.652 / demot 11.654 ms/step — the int8 x int8 ->
int32 dot IS the regression (layout/conversion work outweighs the
halved reads) and HIGHEST on the f32 scales is free (9.652 vs the
pre-fix 9.56). beam._permute_rows_mxu therefore reverted int8 buffers
to the bf16-promote path and kept the HIGHEST scales fix.

Each variant is traced under its monkeypatch with a DISTINCT
beam_self_kv_min (0/1/2 — all semantically "always quantize" at these
budgets) so each occupies its own jit cache entry; flipping a patch
without a distinct static arg would silently reuse the first-compiled
program (CLAUDE.md).
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

    cur = wbeam._permute_rows_mxu

    def i8pro(a, onehot):
        if a.dtype == jnp.int8:   # pre-fix: promote through bf16
            return jnp.tensordot(onehot, a, axes=1).astype(a.dtype)
        return cur(a, onehot)

    def demot(a, onehot):
        if a.dtype == jnp.float32:   # pre-fix: default-precision demotes
            return jnp.tensordot(onehot, a, axes=1).astype(a.dtype)
        return cur(a, onehot)

    VARIANTS = {           # name -> (patch fn, distinct static tag)
        "cur": (cur, 0),
        "i8pro": (i8pro, 1),
        "demot": (demot, 2),
    }

    def call(variant: str, budget: int):
        fn, tag = VARIANTS[variant]
        wbeam._permute_rows_mxu = fn
        try:
            d = DecodeConfig(max_new_tokens=budget, num_beams=args.beams,
                             repetition_penalty=1.15,
                             no_repeat_ngram_size=3, kv_quant="int8",
                             beam_self_kv_min=tag)
            return wbeam.generate_beam(params["whisper"], w, d,
                                       enc0)["lengths"]
        finally:
            wbeam._permute_rows_mxu = cur

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

    print(f"\n== int8 beam-{args.beams} reorder dtype paths "
          f"(B={B}, budgets {HI}/{LO}, pen 1.15 + ngram 3) ==")
    for v in VARIANTS:
        hi, lo = best[(v, HI)], best[(v, LO)]
        ms = (hi - lo) / (HI - LO) * 1e3
        print(f"{v:6s} {ms:7.3f} ms/step   "
              f"(totals {hi*1e3:.0f} / {lo*1e3:.0f} ms)", flush=True)


if __name__ == "__main__":
    main()
