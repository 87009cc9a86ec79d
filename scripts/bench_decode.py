"""Decode-step microbenchmark on the real chip.

Measures per-token decode cost at batch 128 (the pipeline bottleneck;
VERDICT round 1: ~3.9 ms/step vs ~0.9 ms bandwidth floor) by timing
`generate` at two different max_new_tokens and differencing — that
isolates the while_loop body from encode/prompt overheads.

Sync via host scalar fetch (axon tunnel: block_until_ready is a no-op).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(batch: int = 128, lo: int = 16, hi: int = 64, reps: int = 5):
    import jax
    import jax.numpy as jnp

    from audio_transformers_tpu.core.config import (DecodeConfig,
                                                    EmotionWhisperConfig,
                                                    MelConfig)
    from audio_transformers_tpu.models import whisper as wm
    from audio_transformers_tpu.models.whisper import decode as wdecode
    from audio_transformers_tpu.models.whisper import emotion as emo
    from audio_transformers_tpu.ops.mel import log_mel

    cfg = EmotionWhisperConfig()
    w = cfg.whisper
    mel_cfg = MelConfig.whisper()
    on_tpu = jax.default_backend() == "tpu"
    compute = jnp.bfloat16 if on_tpu else jnp.float32
    if not on_tpu:
        batch, reps = 2, 1

    rng = np.random.default_rng(0)
    waveform = jnp.asarray(
        (rng.standard_normal((batch, mel_cfg.sample_rate * 30)) * 0.1)
        .astype(np.float32))
    params = emo.init(jax.random.PRNGKey(0), cfg)

    mel = log_mel(waveform, mel_cfg).astype(compute)
    enc = wm.encode_jit(params["whisper"], w, mel, attn_impl="auto")
    enc = jax.device_put(enc)  # materialize

    def timed_generate(n_tokens: int) -> float:
        dcfg = DecodeConfig(max_new_tokens=n_tokens, no_repeat_ngram_size=3,
                            repetition_penalty=1.15)
        prompt = wdecode.build_prompt(w, dcfg)
        out = wdecode.generate(params["whisper"], w, dcfg, enc,
                               prompt=prompt)
        int(np.asarray(out["lengths"][0]))  # compile+warm sync
        t0 = time.perf_counter()
        for _ in range(reps):
            out = wdecode.generate(params["whisper"], w, dcfg, enc,
                                   prompt=prompt)
        int(np.asarray(out["lengths"][0]))  # fetch-sync on the last rep
        return (time.perf_counter() - t0) / reps

    t_lo = timed_generate(lo)
    t_hi = timed_generate(hi)
    per_step = (t_hi - t_lo) / (hi - lo)
    # HBM floor estimate (bf16): cross-KV + self-KV cache + step params +
    # embed table read per step.
    d, l_, ffn, v = w.d_model, w.decoder_layers, w.ffn_dim, w.vocab_size
    heads, hd = w.num_heads, w.head_dim
    enc_len = enc.shape[1]
    bpe = 2 if compute == jnp.bfloat16 else 4
    cross_kv = 2 * l_ * batch * heads * enc_len * hd * bpe
    self_kv = 2 * l_ * batch * heads * (hi + 8) * hd * bpe
    step_w = l_ * (3 * d * d + d * d + 2 * d * d + 2 * d * ffn) * bpe
    embed = v * d * bpe
    floor = (cross_kv + self_kv + step_w + embed) / 819e9  # v5e ~819 GB/s
    print(f"generate({lo} tok): {t_lo * 1e3:.2f} ms   "
          f"generate({hi} tok): {t_hi * 1e3:.2f} ms")
    print(f"per-step: {per_step * 1e3:.3f} ms @ batch {batch}  "
          f"(bandwidth floor est {floor * 1e3:.3f} ms, "
          f"{per_step / floor:.2f}x off)")


if __name__ == "__main__":
    main()
