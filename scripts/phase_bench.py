"""Phase-level device-time benchmark for the whisper inference pipeline.

Measures each pipeline phase (mel, encoder stem, encoder blocks, cross-K/V
precompute, decode per-step, train step) in STEADY-STATE DEVICE TIME using
the methodology every perf number in this repo is based on:

  - repetitions are chained inside ONE executable with `lax.scan` (a
    dispatched executable costs ~15-40 ms of tunnel RPC overhead on axon,
    and `jax.block_until_ready` does not wait on the tunnel);
  - two chain lengths are timed and differenced, cancelling both dispatch
    overhead and the final host-fetch latency;
  - each measurement is repeated in interleaved round-robin and the min
    taken, so slow drift (remote compiler / tunnel congestion) cannot bias
    an A/B comparison.

A scan iteration must consume its carry (here: a ~1e-30 perturbation of
the input) or XLA hoists the body out of the loop and the measurement
collapses. Beware dead code: timing a train step whose parameter update is
unused measures only the forward pass — XLA deletes the backward.

Usage:  python scripts/phase_bench.py [--batch 128] [--train-batch 16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

from _ab import roundrobin_min  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--train-batch", type=int, default=16)
    p.add_argument("--rounds", type=int, default=2)
    p.add_argument("--reps", type=int, default=2)
    p.add_argument("--lo", type=int, default=1)
    p.add_argument("--hi", type=int, default=5)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from audio_transformers_tpu.core.config import (DecodeConfig,
                                                    EmotionWhisperConfig,
                                                    MelConfig,
                                                    OptimizerConfig,
                                                    TrainConfig)
    from audio_transformers_tpu.models import whisper as wm
    from audio_transformers_tpu.models.whisper import decode as wdecode
    from audio_transformers_tpu.models.whisper import emotion as emo
    from audio_transformers_tpu.models.whisper import model as wmod
    from audio_transformers_tpu.ops import nn
    from audio_transformers_tpu.ops.mel import log_mel
    from audio_transformers_tpu.train.optim import build_optimizer
    from audio_transformers_tpu.train.whisper_emotion import make_steps

    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        args.batch, args.train_batch = 4, 2
        args.hi = 2
    cfg = EmotionWhisperConfig()
    w = cfg.whisper
    mel_cfg = MelConfig.whisper()
    compute = jnp.bfloat16 if on_tpu else jnp.float32
    B, LO, HI, REPS = args.batch, args.lo, args.hi, args.reps

    rng = np.random.default_rng(0)
    waveform = jnp.asarray(
        (rng.standard_normal((B, mel_cfg.sample_rate * 30)) * 0.1)
        .astype(np.float32))
    params = emo.init(jax.random.PRNGKey(0), cfg)
    mel0 = jax.jit(lambda wv: log_mel(wv, mel_cfg).astype(compute))(waveform)

    @jax.jit
    def stem_fn(params, m):
        pe = params["whisper"]["encoder"]
        x = nn.gelu(nn.conv1d(pe["conv1"], m, padding=1))
        x = nn.gelu(nn.conv1d(pe["conv2"], x, stride=2, padding=1))
        return x + pe["pos"][None, : x.shape[1], :].astype(x.dtype)

    x0 = stem_fn(params, mel0)

    def mel_body(params, feed, c):
        return log_mel(feed + c * 1e-30, mel_cfg).astype(compute)

    def stem_body(params, feed, c):
        pe = params["whisper"]["encoder"]
        m = feed + c * jnp.asarray(1e-30, feed.dtype)
        x = nn.gelu(nn.conv1d(pe["conv1"], m, padding=1))
        x = nn.gelu(nn.conv1d(pe["conv2"], x, stride=2, padding=1))
        return x + pe["pos"][None, : x.shape[1], :].astype(x.dtype)

    def blocks_body(params, feed, c):
        pe = params["whisper"]["encoder"]
        x = feed + c * jnp.asarray(1e-30, feed.dtype)
        for bp in pe["blocks"]:
            x = wmod._self_block(bp, x, w.num_heads, "xla")
        return nn.layer_norm(pe["ln"], x)

    def cross_body(params, feed, c):
        cr = wm.precompute_cross_attention(
            params["whisper"], w, feed + c * jnp.asarray(1e-30, feed.dtype))
        return jnp.stack([x[0, 0, 0] for x in cr["k"]])

    enc0 = jax.jit(lambda m: wm.encode(params["whisper"], w, m,
                                       attn_impl="xla"))(mel0)

    variants = {
        "mel": (mel_body, waveform),
        "encoder stem": (stem_body, mel0),
        "encoder blocks": (blocks_body, x0),
        "cross-KV precompute": (cross_body, enc0),
    }

    # params are CLOSED OVER (compile-time constants), not jit arguments:
    # passing the fp32 param tree as an argument into a scanned phase body
    # triggers an XLA layout/cast pathology that ~2.4x-es the blocks phase
    # (170 vs 71 ms measured) and does NOT reflect the cost inside the real
    # pipeline, where the same blocks run at the closure-measured speed.
    fns = {}
    for name, (body, feed) in variants.items():
        fns[name] = {}
        for n in (LO, HI):
            @jax.jit
            def fn(feed_, body=body, n=n):
                def sbody(c, _):
                    out = body(params, feed_, c)
                    return jnp.sum(out).astype(jnp.float32) * 1e-30, None
                c, _ = jax.lax.scan(sbody, jnp.float32(0), None, length=n)
                return c.reshape(1)
            float(np.asarray(fn(feed)[0], np.float32))
            fns[name][n] = (fn, feed)

    def rep_window(fn, feed):
        out = None
        for _ in range(REPS):
            out = fn(feed)
        float(np.asarray(out[0], np.float32))

    best = roundrobin_min(
        {(name, n): (lambda fn_feed=fns[name][n]: rep_window(*fn_feed))
         for name in variants for n in (LO, HI)},
        args.rounds)
    for name in variants:
        v = (best[(name, HI)] - best[(name, LO)]) / (HI - LO) / REPS * 1e3
        print(f"{name:24s} {v:8.2f} ms", flush=True)

    # decode per-step: difference two token budgets (overhead-free);
    # all kv variants interleaved in one round-robin
    def decode_once(kv_quant, ntok):
        dcfg = DecodeConfig(max_new_tokens=ntok, no_repeat_ngram_size=3,
                            repetition_penalty=1.15, kv_quant=kv_quant)
        prompt = wdecode.build_prompt(w, dcfg)
        out = wdecode.generate(params["whisper"], w, dcfg, enc0,
                               prompt=prompt)
        int(np.asarray(out["lengths"][0]))

    kvs = ("none", "int8", "int4")
    for kv_quant in kvs:      # compile + warm before any timing
        for ntok in (16, 64):
            decode_once(kv_quant, ntok)
    budget = roundrobin_min(
        {(kv, ntok): (lambda kv=kv, ntok=ntok: decode_once(kv, ntok))
         for kv in kvs for ntok in (16, 64)},
        max(args.rounds, 2) * 4)
    for kv_quant in kvs:
        per = (budget[(kv_quant, 64)] - budget[(kv_quant, 16)]) / 48 * 1e3
        print(f"decode/step kv={kv_quant:5s}   {per:8.3f} ms", flush=True)

    # full train step (scan-chained, carries params+opt so nothing is DCE'd)
    tb = args.train_batch
    tcfg = TrainConfig(batch_size=tb, compute_dtype=str(np.dtype(compute)),
                       optimizer=OptimizerConfig(name="adamw",
                                                 learning_rate=1e-4,
                                                 schedule="constant"))
    tx = build_optimizer(tcfg.optimizer)
    train_step, _ = make_steps(cfg, mel_cfg, tcfg, tx)
    labels = np.full((tb, 48), w.pad_token_id, np.int32)
    labels[:, 0] = w.decoder_start_token_id
    labels[:, 1:40] = rng.integers(100, 5000, (tb, 39))
    labels[:, 40] = w.eos_token_id
    tbatch = {
        "waveform": waveform[:tb],
        "labels": jnp.asarray(labels),
        "emotion_labels": jnp.asarray(
            rng.integers(0, cfg.num_emotion_classes, tb).astype(np.int32)),
        "valid": jnp.ones((tb,), bool),
    }
    ts = {}
    for n in (LO, HI):
        @jax.jit
        def fn(params, batch, n=n):
            opt_state = tx.init(params)
            def body(carry, _):
                p, s = carry
                p, s, m = train_step(p, s, dict(batch))
                return (p, s), m["loss"]
            (_, _), losses = jax.lax.scan(body, (params, opt_state), None,
                                          length=n)
            return losses[-1].reshape(1)
        float(np.asarray(fn(params, tbatch)[0], np.float32))
        best = None
        for _ in range(args.rounds):
            t0 = time.perf_counter()
            for _ in range(REPS):
                out = fn(params, tbatch)
            float(np.asarray(out[0], np.float32))
            dt = (time.perf_counter() - t0) / REPS
            best = dt if best is None else min(best, dt)
        ts[n] = best
    per = (ts[HI] - ts[LO]) / (HI - LO)
    print(f"train step b{tb}          {per*1e3:8.2f} ms "
          f"({tb/per:.0f} clips/s)", flush=True)


if __name__ == "__main__":
    main()
