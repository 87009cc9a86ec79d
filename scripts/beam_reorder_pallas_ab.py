"""Beam cache reorder: Pallas gather-copy vs one-hot MXU matmul, in
PRODUCTION generate_beam, plus the beam self-KV quantization gate.

Decomposes two changes at the bench config (b128/N=4, budgets 64/16
differenced, pen 1.15 + ngram 3):

  reorder impl   "mm" (one-hot matmul, the r5 shipped default) vs
                 "pallas" (ops/permute.py scalar-prefetch gather-copy:
                 the copy at HBM bandwidth instead of O(rows^2) FLOPs)
  self-KV gate   legacy greedy gating (bf16 self cache below
                 self_kv_min — beam_self_kv_min=192 here) vs beam
                 gating (beam_self_kv_min=0: the reorder rewrites the
                 whole cache every step, so halving its bytes pays at
                 any L)

Variants (kv_quant / beam_self_kv_min / reorder):
  mm_bf16   none / -   / mm       the r5 shipped bf16 headline
  pl_bf16   none / -   / pallas
  mm_i8     int8 / 192 / mm       the r5 shipped int8 field
  pl_i8     int8 / 192 / pallas
  mm_i8s    int8 / 0   / mm       gate effect under mm
  pl_i8s    int8 / 0   / pallas   the proposed serving config

Token-equality of pallas vs mm is asserted at a small batch first.
Methodology per CLAUDE.md: one jitted program per (variant, budget),
interleaved rounds, min per cell, difference the mins.

RESULT (v5e, artifacts/beam_attribution_r5/reorder_pallas_ab.log):
mm_bf16 5.89 / pl_bf16 13.28 / mm_i8 5.35 / pl_i8 12.57 / mm_i8s 5.31
/ pl_i8s 13.75 ms/step. Pallas REJECTED as the reorder default (the
opaque custom call defeats XLA's while-loop carry aliasing — see
ops/permute.py); beam_self_kv_min=0 kept as a speed tie with capacity
and single-regime benefits. The token-equality gate caught the f32
scale demotion bug fixed in beam._permute_rows_mxu.
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
    HI, LO = (64, 16) if on_tpu else (8, 3)
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
        "mm_bf16": dict(kv_quant="none", beam_reorder="mm"),
        "pl_bf16": dict(kv_quant="none", beam_reorder="pallas"),
        "mm_i8": dict(kv_quant="int8", beam_self_kv_min=192,
                      beam_reorder="mm"),
        "pl_i8": dict(kv_quant="int8", beam_self_kv_min=192,
                      beam_reorder="pallas"),
        "mm_i8s": dict(kv_quant="int8", beam_self_kv_min=0,
                       beam_reorder="mm"),
        "pl_i8s": dict(kv_quant="int8", beam_self_kv_min=0,
                       beam_reorder="pallas"),
    }

    def dcfg(variant: str, budget: int) -> DecodeConfig:
        return DecodeConfig(max_new_tokens=budget, num_beams=args.beams,
                            repetition_penalty=1.15,
                            no_repeat_ngram_size=3, **VARIANTS[variant])

    # token-equality first, small batch (pallas must equal mm exactly
    # per quant config; across quant configs tokens may differ)
    enc_s = enc0[:8] if on_tpu else enc0
    for mm_v, pl_v in (("mm_bf16", "pl_bf16"), ("mm_i8s", "pl_i8s")):
        outs = {}
        for v in (mm_v, pl_v):
            outs[v] = wbeam.generate_beam(params["whisper"], w,
                                          dcfg(v, 24), enc_s)
        np.testing.assert_array_equal(np.asarray(outs[mm_v]["tokens"]),
                                      np.asarray(outs[pl_v]["tokens"]))
        print(f"token-equal: {pl_v} == {mm_v}", flush=True)

    def call(variant: str, budget: int):
        return wbeam.generate_beam(params["whisper"], w,
                                   dcfg(variant, budget), enc0)["lengths"]

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

    print(f"\n== beam-{args.beams} reorder impl x self-KV gate "
          f"(B={B}, budgets {HI}/{LO}, pen 1.15 + ngram 3) ==")
    for v in VARIANTS:
        hi, lo = best[(v, HI)], best[(v, LO)]
        ms = (hi - lo) / (HI - LO) * 1e3
        print(f"{v:8s} {ms:7.3f} ms/step   "
              f"(totals {hi*1e3:.0f} / {lo*1e3:.0f} ms)", flush=True)


if __name__ == "__main__":
    main()
