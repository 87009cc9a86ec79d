"""A/B the timestamp-rule cost in the greedy decode loop.

History (b128, L=268, bf16 chain, interleaved in-process, min over
rounds — the r4 attribution that motivated the fused form):

  base (no ts rule)                    2.627 ms/step
  full rule + argmax (old path)        2.815   (+0.188)
  masks only, no probability rule      2.696   (+0.069)
  probability rule only                2.753   (+0.126)

The probability rule dominated because it is inherently two-pass when
the output is a (B, V) array: the force-timestamps predicate depends on
reductions over the masked logits, so the final mask is a dependent
second traversal. The greedy token never needs that array —
`lp.whisper_timestamp_greedy_token` computes
`force ? argmax(ts half) : argmax(row)` with all reductions sharing one
read. This script measures the production fused path against the old
argmax-of-the-rule path and the no-timestamp base:

  base        return_timestamps=False (the `full` chain)
  fused       production greedy path (whisper_timestamp_greedy_token)
  rule2pass   greedy token via argmax(whisper_timestamp_rules(...))

Full decodes interleaved in one process, min over rounds, per-variant
unique max_new_tokens so each occupies its own jit cache entry
(CLAUDE.md: flipping monkeypatches does NOT re-trace identical static
args).
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

    from audio_transformers_tpu.core.profiling import (
        enable_compilation_cache)
    enable_compilation_cache()

    from audio_transformers_tpu.core.config import (DecodeConfig,
                                                    EmotionWhisperConfig,
                                                    MelConfig)
    from audio_transformers_tpu.models import whisper as wm
    from audio_transformers_tpu.models.whisper import decode as wdecode
    from audio_transformers_tpu.models.whisper import emotion as emo
    from audio_transformers_tpu.ops import logit_processors as lp
    from audio_transformers_tpu.ops.mel import log_mel

    on_tpu = jax.default_backend() == "tpu"
    cfg = EmotionWhisperConfig()
    w = cfg.whisper
    mel_cfg = MelConfig.whisper()
    compute = jnp.bfloat16 if on_tpu else jnp.float32
    B = args.batch if on_tpu else 4
    REPS = args.reps if on_tpu else 1
    L = 268 if on_tpu else 24

    rng = np.random.default_rng(0)
    waveform = jnp.asarray(
        (rng.standard_normal((B, mel_cfg.sample_rate * 30)) * 0.1)
        .astype(np.float32))
    params = emo.init(jax.random.PRNGKey(0), cfg)
    mel0 = jax.jit(lambda wv: log_mel(wv, mel_cfg, precision="high")
                   .astype(compute))(waveform)
    enc0 = wm.encode_jit(params["whisper"], w, mel0, attn_impl="auto")

    fused_token = lp.whisper_timestamp_greedy_token

    def rule2pass_token(logits, tokens, pos, **kw):
        return jnp.argmax(
            lp.whisper_timestamp_rules(logits, tokens, pos, **kw),
            axis=-1).astype(jnp.int32)

    variants = {
        "base": (fused_token, dict(), L),
        "fused": (fused_token, dict(return_timestamps=True), L - 1),
        "rule2pass": (rule2pass_token, dict(return_timestamps=True), L - 2),
    }

    # logits_impl pinned to "xla": this script attributes the XLA rule
    # forms; "auto" now routes timestamped greedy chains to the fused
    # Pallas kernel (which never calls whisper_timestamp_greedy_token,
    # making the monkeypatch inert) — scripts/ts_fused_kernel_ab.py is
    # the kernel-vs-XLA comparison.
    for name, (token_fn, kw, length) in variants.items():
        lp.whisper_timestamp_greedy_token = token_fn
        dcfg = DecodeConfig(max_new_tokens=length, kv_quant="none",
                            repetition_penalty=1.15, logits_impl="xla",
                            no_repeat_ngram_size=3, **kw)
        prompt = wdecode.build_prompt(w, dcfg)
        out = wdecode.generate(params["whisper"], w, dcfg, enc0,
                               prompt=prompt, max_len=length)
        int(np.asarray(out["lengths"][0]))
        print(f"compiled {name} (L={length})", flush=True)

    best = {name: float("inf") for name in variants}
    for _ in range(args.rounds):
        for name, (token_fn, kw, length) in variants.items():
            lp.whisper_timestamp_greedy_token = token_fn
            dcfg = DecodeConfig(max_new_tokens=length, kv_quant="none",
                                repetition_penalty=1.15, logits_impl="xla",
                                no_repeat_ngram_size=3, **kw)
            prompt = wdecode.build_prompt(w, dcfg)
            t0 = time.perf_counter()
            for _ in range(REPS):
                out = wdecode.generate(params["whisper"], w, dcfg, enc0,
                                       prompt=prompt, max_len=length)
            int(np.asarray(out["lengths"][0]))
            best[name] = min(best[name],
                             (time.perf_counter() - t0) / REPS)
    lp.whisper_timestamp_greedy_token = fused_token

    base_ms = best["base"] / (variants["base"][2] - 1) * 1e3
    print(f"\nbase {base_ms:.3f} ms/step")
    for name, (_, _, length) in variants.items():
        if name == "base":
            continue
        ms = best[name] / (length - 1) * 1e3
        print(f"{name:10s} {ms:6.3f} ms/step  delta vs base "
              f"{ms - base_ms:+.3f}", flush=True)


if __name__ == "__main__":
    main()
