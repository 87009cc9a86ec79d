"""A/B the beam-search candidate selection on chip.

BENCH r4 validation measured decode_ms_per_step_b128_beam4 at 66.2
ms/step — ~35x greedy, not the ~2.5x PARITY claims. The suspect:
jax.lax.top_k over the flattened (B, N*V) candidate row lowers to a
full variadic sort on TPU (26.5M elements/step at B=128, N=4,
V=51865). The replacement (_stable_top_k) runs 2N masked argmax
passes — exact, same stable tie order.

Variants (distinct max_new_tokens => distinct jit cache entries;
the selection fn is monkeypatched before trace):

  sort_topk    jax.lax.top_k (the original selection; skipped unless
               --include-sort — it costs ~60 ms/step to re-measure)
  argmax_topk  _masked_argmax_top_k (2k full passes; the r4 first fix)
  bucket_topk  _stable_top_k (production: bucketized two-level — one
               max-reduction pass + top-k buckets + small-union finish)

Full beam decodes at b128/N=4, differenced over two lengths per
variant to cancel dispatch + the final teacher-forced pass.
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
    p.add_argument("--include-sort", action="store_true")
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

    prod = wbeam._stable_top_k
    variants = {
        "argmax_topk": (wbeam._masked_argmax_top_k, 2),
        "bucket_topk": (prod, 4),
    }
    if args.include_sort:
        variants["sort_topk"] = (lambda x, k: jax.lax.top_k(x, k), 0)

    def run(sel, length):
        wbeam._stable_top_k = sel
        dcfg = DecodeConfig(max_new_tokens=length, num_beams=4,
                            repetition_penalty=1.15,
                            no_repeat_ngram_size=3)
        prompt = wdecode.build_prompt(w, dcfg)
        out = wbeam.generate_beam(params["whisper"], w, dcfg, enc0,
                                  prompt=prompt, max_len=length)
        return out

    # NOTE: no cross-variant token assert here — the two variants MUST
    # run at different max_len (same static args + a monkeypatched body
    # would silently reuse the first-compiled program, CLAUDE.md), and
    # different budgets legitimately change the winning hypothesis'
    # tail (the finalize offer fires at different steps). Selection
    # parity is proven same-length on the CPU mesh:
    # tests/test_beam.py::TestStableTopK + TestBeamHFParity.
    for name, (sel, off) in variants.items():
        for length in (L_hi - off, L_lo - off):
            out = run(sel, length)
            int(np.asarray(out["lengths"][0]))
        print(f"compiled {name}", flush=True)

    best = {}
    for _ in range(args.rounds):
        for name, (sel, off) in variants.items():
            for length in (L_hi - off, L_lo - off):
                t0 = time.perf_counter()
                for _ in range(REPS):
                    out = run(sel, length)
                int(np.asarray(out["lengths"][0]))
                k = (name, length)
                best[k] = min(best.get(k, float("inf")),
                              (time.perf_counter() - t0) / REPS)
    wbeam._stable_top_k = prod

    for name, (sel, off) in variants.items():
        hi, lo = best[(name, L_hi - off)], best[(name, L_lo - off)]
        ms = (hi - lo) / (L_hi - L_lo) * 1e3
        print(f"{name:12s} marginal {ms:7.3f} ms/step "
              f"(totals {hi * 1e3:.0f} / {lo * 1e3:.0f} ms)", flush=True)


if __name__ == "__main__":
    main()
