"""Headline benchmark: whisper-tiny end-to-end inference throughput on one
TPU chip, plus MFU and train-step visibility.

Pipeline measured per batch of 30 s clips: fused Pallas mel front-end ->
encoder -> KV-cached greedy decode (64 tokens, jit'd while_loop with the
full logit-processor stack the reference uses via HF generate) -> emotion
head.

Prints ONE JSON line. Required fields:
  {"metric": "whisper_tiny_rtfx_30s", "value": <x realtime per chip>,
   "unit": "x_realtime", "vs_baseline": value / 20.0}
plus measured extras: mfu (pipeline FLOPs from XLA cost analysis over the
v5e bf16 peak), pipeline_ms, decode_ms_per_step_b128, train_step_ms_b16,
train_clips_per_sec.

Baseline: the reference publishes no throughput number (BASELINE.md); the
driver's north star is >= 20x realtime per chip, so vs_baseline is the
ratio against that target. NOTE: the headline decodes 64 new tokens per
clip; the reference eval protocol decodes up to 100-128 — per-token decode
cost is what transfers, reported separately.

Timing rule (axon tunnel): block_until_ready returns early; every timing
window ends with a host fetch of ONE scalar from the last rep's output.
"""

from __future__ import annotations

import json
import time

import numpy as np

V5E_PEAK_BF16 = 197e12  # FLOP/s, one v5e chip


def _sync_scalar(x) -> float:
    return float(np.asarray(x.reshape(-1)[0], np.float32))


def main():
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
    from audio_transformers_tpu.ops.mel import log_mel
    from audio_transformers_tpu.train.optim import build_optimizer
    from audio_transformers_tpu.train.whisper_emotion import make_steps

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

    # FLOP count for MFU from XLA's own cost model (counts the decode loop
    # body once per trip via the while-loop trip-count bound).
    flops_per_batch = None
    try:
        cost = fn.lower(params, waveform).compile().cost_analysis()
        if cost:
            cost = cost[0] if isinstance(cost, (list, tuple)) else cost
            flops_per_batch = float(cost.get("flops", 0.0)) or None
    except Exception:
        pass

    def sync(out):
        # device executes its queue in-order: fetch once from the last rep
        return int(np.asarray(out[1].reshape(-1)[0]))

    sync(fn(params, waveform))  # compile + warm

    reps = 10 if on_tpu else 2
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(params, waveform)
    sync(out)
    dt = (time.perf_counter() - t0) / reps

    audio_secs = batch * clip_secs
    rtfx = audio_secs / dt
    result = {
        "metric": "whisper_tiny_rtfx_30s",
        "value": round(rtfx, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtfx / 20.0, 3),
        "pipeline_ms": round(dt * 1e3, 2),
        "batch": batch,
    }
    if flops_per_batch:
        result["mfu"] = round(flops_per_batch / dt / V5E_PEAK_BF16, 4) \
            if on_tpu else None

    # --- decode per-step cost (differencing two token budgets) ----------
    def timed_generate(n_tokens: int, mel) -> float:
        d2 = dcfg.replace(max_new_tokens=n_tokens)
        enc = wm.encode_jit(params["whisper"], w, mel, attn_impl="auto")
        o = wdecode.generate(params["whisper"], w, d2, enc, prompt=prompt)
        _sync_scalar(o["lengths"])
        t0 = time.perf_counter()
        for _ in range(reps // 2 or 1):
            o = wdecode.generate(params["whisper"], w, d2, enc,
                                 prompt=prompt)
        _sync_scalar(o["lengths"])
        return (time.perf_counter() - t0) / (reps // 2 or 1)

    mel = log_mel(waveform, mel_cfg).astype(compute)
    t_lo, t_hi = timed_generate(16, mel), timed_generate(64, mel)
    result["decode_ms_per_step_b128"] = round((t_hi - t_lo) / 48 * 1e3, 3)

    # --- train step (dual-loss fine-tune, batch 16, flash attention) ----
    tb = 16 if on_tpu else 2
    tcfg = TrainConfig(batch_size=tb, compute_dtype=str(np.dtype(compute)),
                       optimizer=OptimizerConfig(name="adamw",
                                                 learning_rate=1e-4,
                                                 schedule="constant"))
    tx = build_optimizer(tcfg.optimizer)
    train_step, _ = make_steps(cfg, mel_cfg, tcfg, tx)
    tparams = emo.init(jax.random.PRNGKey(0), cfg)
    opt_state = tx.init(tparams)
    labels = np.full((tb, 48), w.pad_token_id, np.int32)
    labels[:, 0] = w.decoder_start_token_id
    labels[:, 1:40] = rng.integers(100, 5000, (tb, 39))
    labels[:, 40] = w.eos_token_id
    tbatch = {
        "waveform": jnp.asarray(waveform[:tb]),
        "labels": jnp.asarray(labels),
        "emotion_labels": jnp.asarray(
            rng.integers(0, cfg.num_emotion_classes, tb).astype(np.int32)),
        "valid": jnp.ones((tb,), bool),
    }
    tparams, opt_state, m = train_step(tparams, opt_state, dict(tbatch))
    _sync_scalar(m["loss"])  # compile + warm
    treps = 20 if on_tpu else 2
    t0 = time.perf_counter()
    for _ in range(treps):
        tparams, opt_state, m = train_step(tparams, opt_state, dict(tbatch))
    _sync_scalar(m["loss"])
    tdt = (time.perf_counter() - t0) / treps
    result["train_step_ms_b16"] = round(tdt * 1e3, 2)
    result["train_clips_per_sec"] = round(tb / tdt, 1)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
