"""Interleaved fwd+bwd flash-attention block sweep at training shapes.

The default blocks (256/512) were tuned at batch 16; bench shows the b64
train step ~12% off linear per-clip scaling while XLA cost analysis says
flops scale exactly 4.0x — so the gap is achieved efficiency, and the
flash kernels are the largest single contributor to the step. This
sweeps (block_q, block_k) for value_and_grad at encoder shapes,
round-robin in one process (min over rounds), scan-chained so dispatch
cancels. The grad output is consumed through jnp.sum AFTER the pallas
bwd kernels — XLA cannot algebraically fold through a pallas_call, so
nothing is deleted (contrast: summing a plain XLA attention output
deletes its PV matmul — CLAUDE.md).

Usage: python scripts/flash_train_block_sweep.py [--batch 64]
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
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--lo", type=int, default=2)
    p.add_argument("--hi", type=int, default=8)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from audio_transformers_tpu.core.profiling import enable_compilation_cache
    enable_compilation_cache()

    from audio_transformers_tpu.ops.attention import flash_attention

    on_tpu = jax.default_backend() == "tpu"
    B = args.batch if on_tpu else 2
    H, T, D = 6, 1500, 64
    compute = jnp.bfloat16 if on_tpu else jnp.float32
    lo, hi = (args.lo, args.hi) if on_tpu else (1, 2)

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, T, D)), compute)
    k = jnp.asarray(rng.standard_normal((B, H, T, D)), compute)
    v = jnp.asarray(rng.standard_normal((B, H, T, D)), compute)

    configs = [(256, 512), (512, 512), (128, 512), (256, 256),
               (256, 1024), (512, 1536)]

    def make_fn(bq, bk, n):
        @jax.jit
        def fn(q, k, v):
            def loss(q, k, v):
                return jnp.sum(
                    flash_attention(q, k, v, block_q=bq, block_k=bk)
                    .astype(jnp.float32))

            g = jax.grad(loss, argnums=(0, 1, 2))

            def body(c, _):
                dq, dk, dv = g(q + c.astype(compute), k, v)
                return (jnp.sum(dq) * 1e-30).astype(jnp.float32), None

            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return c.reshape(1)
        return fn

    def sync(x):
        return float(np.asarray(x)[0])

    fns = {}
    for bq, bk in configs:
        try:
            pair = {}
            for n in (lo, hi):
                f = make_fn(bq, bk, n)
                sync(f(q, k, v))
                pair[n] = f
            fns[(bq, bk)] = pair
            print(f"compiled {bq}/{bk}", flush=True)
        except Exception as e:
            print(f"{bq}/{bk} failed to compile: {type(e).__name__}",
                  flush=True)

    chain = roundrobin_min(
        {(c, n): (lambda f=pair[n]: sync(f(q, k, v)))
         for c, pair in fns.items() for n in (lo, hi)},
        args.rounds)
    best = {c: (chain[(c, hi)] - chain[(c, lo)]) / (hi - lo) for c in fns}
    for (bq, bk), s in sorted(best.items(), key=lambda kv: kv[1]):
        print(f"block_q={bq:4d} block_k={bk:4d}  {s * 1e3:7.2f} ms "
              f"(fwd+bwd, B={B})", flush=True)


if __name__ == "__main__":
    main()
