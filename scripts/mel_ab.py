"""Same-process A/B for the mel front-end: implementation x precision.

Also verifies that "high" (3-pass bf16) features are indistinguishable
from "highest" after the pipeline's bf16 cast (the basis for
mel.precision_for routing the whisper inference/train pipelines to
"high").

Usage: python scripts/mel_ab.py [--batch 128]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

from _ab import roundrobin_min  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--reps", type=int, default=2)
    p.add_argument("--lo", type=int, default=1)
    p.add_argument("--hi", type=int, default=5)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from audio_transformers_tpu.core.profiling import enable_compilation_cache
    enable_compilation_cache()

    from audio_transformers_tpu.core.config import MelConfig
    from audio_transformers_tpu.ops.mel import log_mel_xla
    from audio_transformers_tpu.ops.mel_pallas import log_mel_pallas

    on_tpu = jax.default_backend() == "tpu"
    cfg = MelConfig.whisper()
    B = args.batch if on_tpu else 4
    LO, HI, REPS = args.lo, args.hi, args.reps

    rng = np.random.default_rng(0)
    wav = jnp.asarray(
        (rng.standard_normal((B, cfg.sample_rate * 30)) * 0.1)
        .astype(np.float32))

    # --- numerics: high vs highest, after the bf16 consumer cast --------
    a = np.asarray(log_mel_xla(wav[:8], cfg, "highest"))
    b = np.asarray(log_mel_xla(wav[:8], cfg, "high"))
    diff = np.abs(a - b).max()
    mism = (a.astype(jnp.bfloat16) != b.astype(jnp.bfloat16)).mean()
    print(f"xla high-vs-highest: max|diff|={diff:.3e}  "
          f"bf16-cast mismatch frac={mism:.2e}", flush=True)

    variants = {
        "xla_highest": lambda w: log_mel_xla(w, cfg, "highest"),
        "xla_high": lambda w: log_mel_xla(w, cfg, "high"),
        "pallas_highest": lambda w: log_mel_pallas(w, cfg,
                                                   precision="highest"),
        "pallas_high": lambda w: log_mel_pallas(w, cfg, precision="high"),
        "pallas_high_t256": functools.partial(
            log_mel_pallas, cfg=cfg, precision="high", tile_t=256),
        "pallas_high_t512": functools.partial(
            log_mel_pallas, cfg=cfg, precision="high", tile_t=512),
    }

    fns = {}
    for name, body in variants.items():
        fns[name] = {}
        for n in (LO, HI):
            @jax.jit
            def fn(w, body=body, n=n):
                def sbody(c, _):
                    out = body(w + c * 1e-30)
                    # consume via a strided slice sum — a full-tensor sum
                    # would still be fine here (no dot to reassociate),
                    # but keep the pattern robust
                    return jnp.sum(out[:, ::7, ::3]).astype(jnp.float32) \
                        * 1e-30, None
                c, _ = jax.lax.scan(sbody, jnp.float32(0), None, length=n)
                return c.reshape(1)
            float(np.asarray(fn(wav)[0], np.float32))
            fns[name][n] = fn
        print(f"compiled {name}", flush=True)

    def rep_window(fn):
        out = None
        for _ in range(REPS):
            out = fn(wav)
        float(np.asarray(out[0], np.float32))

    best = roundrobin_min(
        {(name, n): (lambda fn=fns[name][n]: rep_window(fn))
         for name in variants for n in (LO, HI)},
        args.rounds)
    for name in variants:
        v = (best[(name, HI)] - best[(name, LO)]) / (HI - LO) / REPS * 1e3
        print(f"{name:18s} {v:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
