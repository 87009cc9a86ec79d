"""Measure int4-KV decode in its claimed regimes (VERDICT r3 next #4).

Round 3 established that int8 beats int4 at the headline shape (b128,
64-token budget: 1.140 vs 1.229 ms/step — the nibble-unpack VPU passes
outweigh the halved K/V read). int4's remaining claim is "the
memory-capacity option (halves KV cache for longer contexts / bigger
batches)". This script tests whether a SPEED regime exists at all by
measuring the marginal per-step cost at:

  - b128, 448-token budget (whisper's full decode budget: the self-KV
    read is ~7x the headline geometry's, where int4 self... note decode
    routes int4 self-KV to int8, so the self side is identical — only
    the cross read differs);
  - b256, 256-token budget (2x the cross-KV bytes per step);

and quantifies the CAPACITY claim directly: the decode-state bytes
(cross K/V + self cache + encoder states) per quant mode, i.e. how much
batch/context headroom int4 actually buys on a 16 GB v5e.

Method: full fixed-buffer decodes (random weights never EOS every row)
at two max_len values per variant; min over rounds PER LENGTH, then
difference the mins (CLAUDE.md: min-of-difference goes negative under
tunnel jitter) — dispatch overhead and the preloop cancel in the
difference. Variants are interleaved round-robin in one process.

Usage: python scripts/int4_regime_ab.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--rounds", type=int, default=2)
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
    from audio_transformers_tpu.models.whisper import model as wmodel
    from audio_transformers_tpu.ops.mel import log_mel

    on_tpu = jax.default_backend() == "tpu"
    cfg = EmotionWhisperConfig()
    w = cfg.whisper
    mel_cfg = MelConfig.whisper()
    compute = jnp.bfloat16 if on_tpu else jnp.float32
    REPS = args.reps if on_tpu else 1

    params = emo.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)

    def make_enc(B):
        waveform = jnp.asarray(
            (rng.standard_normal((B, mel_cfg.sample_rate * 30)) * 0.1)
            .astype(np.float32))
        mel0 = jax.jit(lambda wv: log_mel(wv, mel_cfg, precision="high")
                       .astype(compute))(waveform)
        return wm.encode_jit(params["whisper"], w, mel0, attn_impl="auto")

    # --- capacity: decode-state bytes per quant mode (the int4 claim) ----
    enc_cap = make_enc(8)   # per-row bytes scale linearly; measure at b8
    print("decode-state bytes/row (cross K/V + scales, self cache L=448, "
          "enc states):")
    cap = {}
    for quant in ("none", "int8", "int4"):
        cross = wmodel.precompute_cross_attention(params["whisper"], w,
                                                  enc_cap, quant=quant)
        self_q = "int8" if quant == "int4" else quant  # decode's routing
        cache = wmodel.init_cache(w, 8, max_len=448, dtype=enc_cap.dtype,
                                  quant=self_q)
        nbytes = sum(x.nbytes for x in jax.tree.leaves((cross, cache)))
        cap[quant] = nbytes // 8
        print(f"  {quant:5s} {cap[quant]/1e6:8.2f} MB/row "
              f"(+enc {enc_cap.nbytes // 8 / 1e6:.2f})", flush=True)
    hbm = 16e9
    enc_row = enc_cap.nbytes // 8
    for quant in ("none", "int8", "int4"):
        print(f"  -> max decode batch on 16 GB (state only, excl. params/"
              f"workspace): {quant:5s} ~{int(hbm / (cap[quant] + enc_row))}")

    # --- speed: marginal ms/step at the claimed regimes ------------------
    # (label, batch, L_long, L_short, quant)
    regimes = []
    for quant in ("none", "int8", "int4"):
        regimes.append((f"b128_L448_{quant}", 128, 448, 320, quant))
    for quant in ("int8", "int4"):
        regimes.append((f"b256_L256_{quant}", 256, 256, 128, quant))
    if not on_tpu:
        regimes = [(n, 4, 24, 16, q) for n, _, _, _, q in regimes]

    encs = {}
    for _, B, _, _, _ in regimes:
        if B not in encs:
            encs[B] = make_enc(B)

    def run(B, max_len, quant):
        dcfg = DecodeConfig(max_new_tokens=max_len, kv_quant=quant,
                            repetition_penalty=1.1,
                            no_repeat_ngram_size=3)
        prompt = wdecode.build_prompt(w, dcfg)
        out = wdecode.generate(params["whisper"], w, dcfg, encs[B],
                               prompt=prompt, max_len=max_len)
        return out["lengths"]

    def timed(B, max_len, quant):
        int(np.asarray(run(B, max_len, quant)[0]))  # compiled already
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = run(B, max_len, quant)
        int(np.asarray(out[0]))
        return (time.perf_counter() - t0) / REPS

    for name, B, L, Ls, quant in regimes:
        run(B, L, quant)
        run(B, Ls, quant)
        print(f"compiled {name}", flush=True)

    best = {}
    for _ in range(args.rounds):
        for name, B, L, Ls, quant in regimes:
            for ln in (L, Ls):
                t = timed(B, ln, quant)
                k = (name, ln)
                best[k] = min(best.get(k, float("inf")), t)

    out = {}
    for name, B, L, Ls, quant in regimes:
        ms = (best[(name, L)] - best[(name, Ls)]) / (L - Ls) * 1e3
        out[name] = round(ms, 3)
        print(f"{name:18s} marginal {ms:6.3f} ms/step "
              f"({L - Ls} steps differenced)", flush=True)
    print(json.dumps({"marginal_ms_per_step": out,
                      "state_bytes_per_row": cap}))


if __name__ == "__main__":
    main()
