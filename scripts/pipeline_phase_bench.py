"""Stage-level attribution for the full inference pipeline at batch 128.

bench.py's pipeline (mel -> encode -> 64-token decode -> emotion head)
measures ~174 ms at b128/int8, but the component benches account for only
~154 (mel 13.4 + encoder 66 + 66 steps x 1.14). This script times each
pipeline STAGE with the scan-differencing methodology so the remaining
"misc" (cross-KV precompute + quantize, prepare_decode_params, buffer
setup, emotion head) is attributed instead of guessed at.

Stages (each chained inside one executable, two chain lengths differenced,
min per chain length over interleaved rounds — scripts/_ab.py):
  mel        log_mel (+ cast to compute dtype)
  encode     whisper encoder on the mel
  preloop    precompute_cross_attention(quant) + pad_cross_time +
             prepare_decode_params  (everything generate() does before
             its while_loop, minus cheap buffer zeroing)
  decode     full generate() on precomputed enc
  emotion    sequence_emotion_from_hiddens on a decode-shaped hiddens
  pipeline   the whole thing (bench.py's composition)

Usage: python scripts/pipeline_phase_bench.py [--batch 128] [--kv int8]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

from _ab import roundrobin_min  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--kv", default="int8")
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--lo", type=int, default=1)
    p.add_argument("--hi", type=int, default=5)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from audio_transformers_tpu.core.config import (DecodeConfig,
                                                    EmotionWhisperConfig,
                                                    MelConfig)
    from audio_transformers_tpu.core.profiling import (
        enable_compilation_cache)
    from audio_transformers_tpu.models import whisper as wm
    from audio_transformers_tpu.models.whisper import decode as wdecode
    from audio_transformers_tpu.models.whisper import emotion as emo
    from audio_transformers_tpu.ops.mel import log_mel, precision_for

    enable_compilation_cache()
    cfg = EmotionWhisperConfig()
    w = cfg.whisper
    mel_cfg = MelConfig.whisper()
    compute = jnp.bfloat16
    B = args.batch
    rng = np.random.default_rng(0)
    waveform = jnp.asarray(
        (rng.standard_normal((B, int(mel_cfg.sample_rate * 30.0))) * 0.1)
        .astype(np.float32))
    params = emo.init(jax.random.PRNGKey(0), cfg)
    dcfg = DecodeConfig(max_new_tokens=64, no_repeat_ngram_size=3,
                        repetition_penalty=1.15, kv_quant=args.kv)
    prompt = wdecode.build_prompt(w, dcfg)
    L = len(prompt) + dcfg.max_new_tokens

    mel0 = jax.jit(lambda wv: log_mel(
        wv, mel_cfg, precision=precision_for(compute)).astype(compute))(
            waveform)
    enc0 = wm.encode_jit(params["whisper"], w, mel0, attn_impl="auto")
    hid0 = jnp.zeros((B, L, w.d_model), compute)

    def mel_stage(wv, c):
        return log_mel(wv + c * 1e-30, mel_cfg,
                       precision=precision_for(compute)).astype(compute)

    def encode_stage(mel, c):
        return wm.encode(params["whisper"], w, mel + c.astype(compute),
                         attn_impl="auto")

    def preloop_stage(enc, c):
        cross = wm.precompute_cross_attention(
            params["whisper"], w, enc + c.astype(compute),
            quant=dcfg.kv_quant)
        from audio_transformers_tpu.models.whisper.model import (
            resolve_step_attn)
        if resolve_step_attn(dcfg.step_attn) == "fused":
            cross = wm.pad_cross_time(cross)
        sp = wm.prepare_decode_params(params["whisper"], w, dtype=compute)
        # cross may carry t_valid (a Python int) — arrays only
        leaves = [x.reshape(-1)[:1].astype(jnp.float32)
                  for x in jax.tree.leaves((cross, sp))
                  if hasattr(x, "reshape")]
        return jnp.concatenate(leaves).sum()

    def decode_stage(enc, c):
        out = wdecode.generate(params["whisper"], w, dcfg,
                               enc + c.astype(compute), prompt=prompt)
        return jnp.sum(out["lengths"]).astype(jnp.float32)

    def emotion_stage(hid, c):
        return emo.sequence_emotion_from_hiddens(
            params, hid + c.astype(compute))

    def pipeline_stage(wv, c):
        mel = mel_stage(wv, c)
        enc = wm.encode(params["whisper"], w, mel, attn_impl="auto")
        out = wdecode.generate(params["whisper"], w, dcfg, enc,
                               prompt=prompt)
        emotion = emo.sequence_emotion_from_hiddens(params, out["hiddens"])
        return (jnp.sum(out["lengths"]).astype(jnp.float32)
                + emotion.astype(jnp.float32).sum())

    stages = {
        "mel": (mel_stage, waveform),
        "encode": (encode_stage, mel0),
        "preloop": (preloop_stage, enc0),
        "decode": (decode_stage, enc0),
        "emotion": (emotion_stage, hid0),
        "pipeline": (pipeline_stage, waveform),
    }

    timed = {}
    for name, (fn, feed) in stages.items():
        for n in (args.lo, args.hi):
            @jax.jit
            def chained(feed, fn=fn, n=n):
                def body(c, _):
                    out = fn(feed, c)
                    return jnp.asarray(out, jnp.float32).reshape(-1)[0] \
                        * 1e-30, None
                c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
                return c

            float(chained(feed))  # compile + warm
            timed[(name, n)] = (lambda chained=chained, feed=feed:
                                float(chained(feed)))
        print(f"compiled {name}", flush=True)

    best = roundrobin_min(timed, args.rounds)
    span = args.hi - args.lo
    total = 0.0
    for name in stages:
        ms = (best[(name, args.hi)] - best[(name, args.lo)]) / span * 1e3
        if name != "pipeline":
            total += ms
        print(f"{name:9s} {ms:8.2f} ms")
    print(f"{'sum':9s} {total:8.2f} ms (stages, excl. pipeline)")


if __name__ == "__main__":
    main()
