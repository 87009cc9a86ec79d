"""Interleaved A/B of the whisper dual-loss train step at batch 16 vs 64.

bench.py times the two batches sequentially, which confounds the scaling
question with tunnel/compiler drift (cross-time absolute numbers move up
to 2.4x — CLAUDE.md). Here both variants are compiled first and then
timed round-robin in the same process, taking the min over rounds, so
the per-clip ratio is trustworthy. Each timing chains `reps` steps
inside one executable via lax.scan (params+opt_state carried, so the
backward pass stays live) and differences two chain lengths to cancel
dispatch and fetch latency.

Usage: python scripts/train_scale_ab.py [--rounds 3]
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
    p.add_argument("--rounds", type=int, default=3)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from audio_transformers_tpu.core.profiling import enable_compilation_cache
    enable_compilation_cache()

    from audio_transformers_tpu.core.config import (EmotionWhisperConfig,
                                                    MelConfig,
                                                    OptimizerConfig,
                                                    TrainConfig)
    from audio_transformers_tpu.models.whisper import emotion as emo
    from audio_transformers_tpu.train.whisper_emotion import (build_optimizer,
                                                              make_steps)

    on_tpu = jax.default_backend() == "tpu"
    cfg = EmotionWhisperConfig()
    w = cfg.whisper
    mel_cfg = MelConfig.whisper()
    compute = "bfloat16" if on_tpu else "float32"
    batches = (16, 64) if on_tpu else (2, 4)
    lo, hi = (2, 6) if on_tpu else (1, 2)
    rng = np.random.default_rng(0)

    params = emo.init(jax.random.PRNGKey(0), cfg)
    tcfg = TrainConfig(batch_size=batches[0], compute_dtype=compute,
                       optimizer=OptimizerConfig(name="adamw",
                                                 learning_rate=1e-4,
                                                 schedule="constant"))
    tx = build_optimizer(tcfg.optimizer)
    train_step, _ = make_steps(cfg, mel_cfg, tcfg, tx)

    def make_batch(tb: int) -> dict:
        labels = np.full((tb, 48), w.pad_token_id, np.int32)
        labels[:, 0] = w.decoder_start_token_id
        labels[:, 1:40] = rng.integers(100, 5000, (tb, 39))
        labels[:, 40] = w.eos_token_id
        return {
            "waveform": jnp.asarray(
                (rng.standard_normal((tb, mel_cfg.sample_rate * 30)) * 0.1)
                .astype(np.float32)),
            "labels": jnp.asarray(labels),
            "emotion_labels": jnp.asarray(
                rng.integers(0, cfg.num_emotion_classes, tb)
                .astype(np.int32)),
            "valid": jnp.ones((tb,), bool),
        }

    def sync(x):
        return float(np.asarray(x)[0])

    fns = {}
    for tb in batches:
        batch = make_batch(tb)
        for n in (lo, hi):
            @jax.jit
            def fn(params, batch, n=n):
                opt_state = tx.init(params)

                def body(carry, _):
                    p, s = carry
                    p, s, m = train_step(p, s, dict(batch))
                    return (p, s), m["loss"]

                (_, _), losses = jax.lax.scan(body, (params, opt_state),
                                              None, length=n)
                return losses[-1].reshape(1)
            sync(fn(params, batch))  # compile + warm
            fns[(tb, n)] = (fn, batch)
            print(f"compiled b{tb} n={n}", flush=True)

    chain = roundrobin_min(
        {(tb, n): (lambda fb=fns[(tb, n)]: sync(fb[0](params, fb[1])))
         for tb in batches for n in (lo, hi)},
        args.rounds,
        on_round=lambda r: print(f"round {r} done", flush=True))
    best = {tb: (chain[(tb, hi)] - chain[(tb, lo)]) / (hi - lo)
            for tb in batches}

    b_lo, b_hi = batches
    ms_lo, ms_hi = best[b_lo] * 1e3, best[b_hi] * 1e3
    print(f"\nbest b{b_lo}: {ms_lo:.2f} ms/step "
          f"({ms_lo / b_lo:.3f} ms/clip)")
    print(f"best b{b_hi}: {ms_hi:.2f} ms/step "
          f"({ms_hi / b_hi:.3f} ms/clip)")
    print(f"per-clip ratio b{b_hi}/b{b_lo}: "
          f"{(ms_hi / b_hi) / (ms_lo / b_lo):.3f} "
          f"(1.0 = perfectly linear scaling)")


if __name__ == "__main__":
    main()
