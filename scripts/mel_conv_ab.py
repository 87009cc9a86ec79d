"""A/B: conv-formulated mel front-end vs the gather+einsum XLA path.

The current XLA mel (ops/mel.log_mel_xla) materializes a (B, T, 400)
frames buffer via gather (614 MB at b128/30 s) and reads it twice (cos
and sin rDFT einsums). Framing + rDFT is exactly a strided conv: a
400-tap stride-160 conv with 402 filters (windowed cos||sin bases) —
XLA's TPU conv lowering streams the input through VMEM without an HBM
frames buffer. This script checks numerics vs the einsum path (and the
numpy golden) and times both with the scan-differencing methodology.

Usage: python scripts/mel_conv_ab.py [--batch 128]
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
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--lo", type=int, default=2)
    p.add_argument("--hi", type=int, default=10)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from audio_transformers_tpu.core.config import MelConfig
    from audio_transformers_tpu.core.profiling import (
        enable_compilation_cache)
    from audio_transformers_tpu.ops import mel as M

    enable_compilation_cache()
    cfg = MelConfig.whisper()
    B = args.batch
    rng = np.random.default_rng(0)
    wav = jnp.asarray(
        (rng.standard_normal((B, cfg.sample_rate * 30)) * 0.1)
        .astype(np.float32))

    def log_mel_conv(waveform, precision):
        hi = M._matmul_precision(precision)
        wcos, wsin, fb = (jnp.asarray(a) for a in M._windowed_bases(cfg))
        waveform = M._ensure_min_length(waveform.astype(jnp.float32), cfg)
        if cfg.center:
            pad = cfg.n_fft // 2
            waveform = jnp.pad(waveform, ((0, 0), (pad, pad)),
                               mode=cfg.pad_mode)
        kernel = jnp.concatenate([wcos, wsin], axis=1)[:, None, :]
        spec = jax.lax.conv_general_dilated(
            waveform[:, :, None], kernel,
            window_strides=(cfg.hop_length,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"), precision=hi)
        nf = cfg.n_freqs
        power = spec[..., :nf] ** 2 + spec[..., nf:] ** 2
        if cfg.power == 1.0:
            power = jnp.sqrt(power)
        mel = jnp.einsum("btf,fm->btm", power, fb, precision=hi,
                         preferred_element_type=jnp.float32)
        return M._log_epilogue(mel, cfg)

    # ---- parity
    for prec in ("highest", "high"):
        a = np.asarray(jax.jit(
            lambda w: M.log_mel_xla(w, cfg, prec))(wav[:4]))
        b = np.asarray(jax.jit(
            lambda w: log_mel_conv(w, prec))(wav[:4]))
        print(f"parity vs einsum ({prec}): max|d| = "
              f"{np.abs(a - b).max():.3e}", flush=True)
    golden = M.reference_log_mel(np.asarray(wav[0]), cfg)
    got = np.asarray(jax.jit(
        lambda w: log_mel_conv(w, "highest"))(wav[:1]))[0]
    print(f"parity vs numpy golden (highest): max|d| = "
          f"{np.abs(golden - got).max():.3e}", flush=True)

    # ---- timing
    variants = {
        "xla_high": lambda w: M.log_mel_xla(w, cfg, "high"),
        "conv_high": lambda w: log_mel_conv(w, "high"),
        "xla_highest": lambda w: M.log_mel_xla(w, cfg, "highest"),
        "conv_highest": lambda w: log_mel_conv(w, "highest"),
    }
    timed = {}
    for name, fn in variants.items():
        for n in (args.lo, args.hi):
            @jax.jit
            def chained(w, fn=fn, n=n):
                def body(c, _):
                    out = fn(w + c * 1e-30)
                    return out.reshape(-1)[0] * 1e-30, None
                c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
                return c
            float(chained(wav))
            timed[(name, n)] = (lambda chained=chained:
                                float(chained(wav)))
        print(f"compiled {name}", flush=True)
    best = roundrobin_min(timed, args.rounds)
    span = args.hi - args.lo
    for name in variants:
        ms = (best[(name, args.hi)] - best[(name, args.lo)]) / span * 1e3
        print(f"{name:13s} {ms:7.2f} ms @ b{B}")


if __name__ == "__main__":
    main()
