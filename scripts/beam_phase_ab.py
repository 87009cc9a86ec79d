"""Attribute the beam-search step cost phase by phase on chip.

Ablation ladder (each variant strips one more phase; deltas between
adjacent rungs attribute that phase). All variants run the FULL
generate_beam program — ablations are module-level monkeypatches plus
config changes, and every variant gets its own max_new_tokens pair so
no two occupy the same jit cache entry (CLAUDE.md: identical static
args + a monkeypatched body silently reuse the first-compiled program).

  full    production bench config: repetition_penalty 1.15, ngram 3
  noproc  penalty 1.0 / ngram 0  -> delta = logit processors (+ the
          seen-mask gather+scatter that track_seen adds)
  nosel   noproc + _stable_top_k replaced by a take-first-2k stub
          -> delta = candidate selection (bucket max pass + gathers)
  base    nosel + log_softmax replaced by identity
          -> delta = the (B*N, V) log-softmax passes
  base itself = decoder fwd step (shared-cross einsum, 4x self) +
          logits einsum + cache-reorder gather + offer bookkeeping.

Marginal ms/step from two chain lengths per variant, min per length
over rounds, then differenced (cancels dispatch + final pass).

SUPERSEDED (r5): this ladder only toggled processors/selection and left
the per-step cache reorder in EVERY rung, so the reorder's +12.1
ms/step — 70% of the old 16.9 ms beam step, fixed by the one-hot MXU
matmul (DecodeConfig.beam_reorder) — was invisible to it, and its r4
"+9.4 penalty+ngram combination pathology" reading did not reproduce
under the full stage decomposition. Use scripts/beam_stage_ab.py, which
rebuilds the loop stage by stage and measured every stage to a floor.
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
    L_hi, L_lo = (64, 16) if on_tpu else (16, 8)

    rng = np.random.default_rng(0)
    waveform = jnp.asarray(
        (rng.standard_normal((B, mel_cfg.sample_rate * 30)) * 0.1)
        .astype(np.float32))
    params = emo.init(jax.random.PRNGKey(0), cfg)
    mel0 = jax.jit(lambda wv: log_mel(wv, mel_cfg, precision="high")
                   .astype(compute))(waveform)
    enc0 = wm.encode_jit(params["whisper"], w, mel0, attn_impl="auto")

    prod_topk = wbeam._stable_top_k
    prod_lsm = jax.nn.log_softmax

    def stub_topk(x, k):
        b = x.shape[0]
        return x[:, :k], jnp.broadcast_to(
            jnp.arange(k, dtype=jnp.int32)[None, :], (b, k))

    def ident_lsm(x, axis=-1):
        return x

    # name -> (dcfg overrides, topk fn, log_softmax fn, length offset)
    proc = dict(repetition_penalty=1.15, no_repeat_ngram_size=3)
    nop = dict(repetition_penalty=1.0, no_repeat_ngram_size=0)
    pen = dict(repetition_penalty=1.15, no_repeat_ngram_size=0)
    ngr = dict(repetition_penalty=1.0, no_repeat_ngram_size=3)
    variants = {
        "full": (proc, prod_topk, prod_lsm, 0),
        "pen_only": (pen, prod_topk, prod_lsm, 8),
        "ngram_only": (ngr, prod_topk, prod_lsm, 10),
        "noproc": (nop, prod_topk, prod_lsm, 2),
        "nosel": (nop, stub_topk, prod_lsm, 4),
        "base": (nop, stub_topk, ident_lsm, 6),
    }

    def run(over, topk, lsm, length):
        wbeam._stable_top_k = topk
        jax.nn.log_softmax = lsm
        try:
            dcfg = DecodeConfig(max_new_tokens=length, num_beams=4, **over)
            prompt = wdecode.build_prompt(w, dcfg)
            return wbeam.generate_beam(params["whisper"], w, dcfg, enc0,
                                       prompt=prompt, max_len=length)
        finally:
            wbeam._stable_top_k = prod_topk
            jax.nn.log_softmax = prod_lsm

    for name, (over, topk, lsm, off) in variants.items():
        for length in (L_hi - off, L_lo - off):
            out = run(over, topk, lsm, length)
            int(np.asarray(out["lengths"][0]))
        print(f"compiled {name}", flush=True)

    best = {}
    for _ in range(args.rounds):
        for name, (over, topk, lsm, off) in variants.items():
            for length in (L_hi - off, L_lo - off):
                t0 = time.perf_counter()
                for _ in range(REPS):
                    out = run(over, topk, lsm, length)
                int(np.asarray(out["lengths"][0]))
                k = (name, length)
                best[k] = min(best.get(k, float("inf")),
                              (time.perf_counter() - t0) / REPS)

    ms = {}
    for name, (over, topk, lsm, off) in variants.items():
        hi, lo = best[(name, L_hi - off)], best[(name, L_lo - off)]
        ms[name] = (hi - lo) / (L_hi - L_lo) * 1e3
        print(f"{name:8s} marginal {ms[name]:7.3f} ms/step "
              f"(totals {hi * 1e3:.0f} / {lo * 1e3:.0f} ms)", flush=True)
    print(f"processors {ms['full'] - ms['noproc']:+.3f} "
          f"(pen {ms['pen_only'] - ms['noproc']:+.3f}, "
          f"ngram {ms['ngram_only'] - ms['noproc']:+.3f})  "
          f"selection {ms['noproc'] - ms['nosel']:+.3f}  "
          f"log_softmax {ms['nosel'] - ms['base']:+.3f}  "
          f"fwd+reorder {ms['base']:.3f}", flush=True)


if __name__ == "__main__":
    main()
