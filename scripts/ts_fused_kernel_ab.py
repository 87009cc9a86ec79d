"""Chip-check + in-pipeline A/B for the fused timestamped greedy kernel.

Stage 1 (chip check): one fused_greedy_step with ts_bounds at the
production vocab geometry on real Mosaic, asserted against the XLA
oracle — CPU interpret success does NOT imply the kernel compiles
(CLAUDE.md), so any Mosaic failure surfaces here with a small repro.

Stage 2 (A/B): the segment evaluator's decode config (256-token budget,
return_timestamps, ngram 3, penalty 1.1, int8 KV — the
decode_ms_per_step_b128_int8_ts256 bench shape) with
logits_impl "fused" vs "xla", full decodes interleaved in one process,
min over rounds. logits_impl is a static DecodeConfig field, so the two
variants occupy distinct jit cache entries by construction.

Context: the XLA path pays +0.187 ms/step for the timestamp rules at
L=268 (scripts/ts_rule_ab.py — unfusable sibling reductions); the
kernel absorbs the rules into its single projection pass. This script
decides whether "auto" should route timestamped greedy chains to the
kernel (models/whisper/decode.resolve_logits_impl).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def chip_check():
    import jax
    import jax.numpy as jnp

    from audio_transformers_tpu.ops.decode_logits import (
        NEG_INF, fused_greedy_step, fused_greedy_step_reference, pad_vocab)

    rng = np.random.default_rng(11)
    b, d, vocab, tb = 16, 384, 51865, 50364
    imax = np.iinfo(np.int32).max
    v_pad = pad_vocab(vocab)
    hidden = jnp.asarray(rng.standard_normal((b, d)), jnp.bfloat16)
    table = rng.standard_normal((d, v_pad)) * 0.05
    table[:, tb:vocab] += 0.06
    table_t = jnp.asarray(table, jnp.bfloat16)
    add = np.zeros((1, v_pad), np.float32)
    add[0, vocab:] = NEG_INF
    add[0, 50363] = NEG_INF
    add = jnp.asarray(add)
    tlo = np.zeros((b,), np.int32)
    thi = np.full((b,), tb, np.int32)
    tcap = np.full((b,), imax, np.int32)
    tlo[1], tcap[1] = tb, tb + 50
    thi[2] = imax
    thi[3] = tb + 800
    bounds = tuple(jnp.asarray(x) for x in (tlo, thi, tcap))
    seen = jnp.asarray(rng.integers(0, 2, (b, v_pad)), jnp.int8)
    got = np.asarray(fused_greedy_step(
        hidden, table_t, add, seen=seen, penalty=1.1,
        ts_bounds=bounds, timestamp_begin=tb))
    want = np.asarray(fused_greedy_step_reference(
        hidden, table_t, add, seen=seen, penalty=1.1,
        ts_bounds=bounds, timestamp_begin=tb))
    np.testing.assert_array_equal(got, want)
    assert np.any(got >= tb) and np.any(got < tb), got
    print(f"chip check OK: fused ts kernel compiles on Mosaic and "
          f"matches the XLA oracle ({(got >= tb).sum()}/{b} rows forced "
          f"to timestamps)", flush=True)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--kv", default="int8")
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
    from audio_transformers_tpu.ops.mel import log_mel

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        chip_check()

    cfg = EmotionWhisperConfig()
    w = cfg.whisper
    mel_cfg = MelConfig.whisper()
    compute = jnp.bfloat16 if on_tpu else jnp.float32
    B = args.batch if on_tpu else 4
    REPS = args.reps if on_tpu else 1
    L = 260 if on_tpu else 24

    rng = np.random.default_rng(0)
    waveform = jnp.asarray(
        (rng.standard_normal((B, mel_cfg.sample_rate * 30)) * 0.1)
        .astype(np.float32))
    params = emo.init(jax.random.PRNGKey(0), cfg)
    mel0 = jax.jit(lambda wv: log_mel(wv, mel_cfg, precision="high")
                   .astype(compute))(waveform)
    enc0 = wm.encode_jit(params["whisper"], w, mel0, attn_impl="auto")

    def dconf(impl):
        return DecodeConfig(max_new_tokens=L, kv_quant=args.kv,
                            repetition_penalty=1.1,
                            no_repeat_ngram_size=3,
                            return_timestamps=True, logits_impl=impl)

    outs = {}
    for impl in ("xla", "fused"):
        dcfg = dconf(impl)
        prompt = wdecode.build_prompt(w, dcfg)
        out = wdecode.generate(params["whisper"], w, dcfg, enc0,
                               prompt=prompt, max_len=L)
        int(np.asarray(out["lengths"][0]))
        outs[impl] = np.asarray(out["tokens"])
        print(f"compiled {impl}", flush=True)
    # the A/B is only meaningful if both variants decode the same tokens
    np.testing.assert_array_equal(outs["xla"], outs["fused"])
    print("token parity xla == fused at full geometry OK", flush=True)

    best = {"xla": float("inf"), "fused": float("inf")}
    for _ in range(args.rounds):
        for impl in ("xla", "fused"):
            dcfg = dconf(impl)
            prompt = wdecode.build_prompt(w, dcfg)
            t0 = time.perf_counter()
            for _ in range(REPS):
                out = wdecode.generate(params["whisper"], w, dcfg, enc0,
                                       prompt=prompt, max_len=L)
            int(np.asarray(out["lengths"][0]))
            best[impl] = min(best[impl], (time.perf_counter() - t0) / REPS)

    for impl, t in best.items():
        print(f"{impl:6s} {t / (L - 1) * 1e3:6.3f} ms/step "
              f"({t * 1e3:.1f} ms total, kv={args.kv})", flush=True)


if __name__ == "__main__":
    main()
