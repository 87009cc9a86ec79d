"""Headline benchmark: whisper-tiny end-to-end inference throughput on one
TPU chip.

Pipeline measured per batch of 30 s clips: fused Pallas mel front-end ->
encoder -> KV-cached greedy decode (64 tokens, jit'd while_loop with the
full logit-processor stack the reference uses via HF generate).

Prints ONE JSON line:
  {"metric": "whisper_tiny_rtfx_30s", "value": <x realtime per chip>,
   "unit": "x_realtime", "vs_baseline": value / 20.0}

Baseline: the reference publishes no throughput number (BASELINE.md); the
driver's north star is >= 20x realtime per chip, so vs_baseline is the
ratio against that target.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

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
    dcfg = DecodeConfig(max_new_tokens=64, no_repeat_ngram_size=3,
                        repetition_penalty=1.15)

    batch = 128 if on_tpu else 2
    clip_secs = 30.0
    rng = np.random.default_rng(0)
    waveform = jnp.asarray(
        (rng.standard_normal((batch, int(mel_cfg.sample_rate * clip_secs)))
         * 0.1).astype(np.float32))

    params = emo.init(jax.random.PRNGKey(0), cfg)
    compute = jnp.bfloat16 if on_tpu else jnp.float32
    prompt = wdecode.build_prompt(w, dcfg)

    def pipeline(params, waveform):
        mel = log_mel(waveform, mel_cfg).astype(compute)
        enc = wm.encode(params["whisper"], w, mel, attn_impl="auto")
        out = wdecode.generate(params["whisper"], w, dcfg, enc,
                               prompt=prompt)
        emotion = emo.sequence_emotion_from_hiddens(
            params, out["hiddens"], out["lengths"])
        return out["tokens"], out["lengths"], emotion

    fn = jax.jit(pipeline)

    def sync(out):
        # On the axon tunnel block_until_ready returns before execution
        # finishes; a host fetch is the only true sync. The device executes
        # its queue in-order, so fetching from the last rep waits for all.
        return int(np.asarray(out[0][0, 0]))

    sync(fn(params, waveform))  # compile + warm

    reps = 10 if on_tpu else 2
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(params, waveform)
    sync(out)
    dt = (time.perf_counter() - t0) / reps

    audio_secs = batch * clip_secs
    rtfx = audio_secs / dt
    print(json.dumps({
        "metric": "whisper_tiny_rtfx_30s",
        "value": round(rtfx, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtfx / 20.0, 3),
    }))


if __name__ == "__main__":
    main()
