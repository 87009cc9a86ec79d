"""Does lax.cond skip work inside a decode-style while_loop on TPU?

The beam cache reorder is L-proportional, but columns past the write
position are garbage — a chunked cache could wrap each tail chunk's
reorder in lax.cond(pos >= chunk_start, reorder, identity) and skip it
for the first half of the decode. That only helps if TPU XLA executes
the UNTAKEN branch as a true no-op (aliasing the carry through) rather
than lowering to a select or copying the buffer anyway.

Probe: a while_loop over T steps carrying 8 beam-shaped bf16 buffers
(rows=512, H=6, D=64, Lc=128 — one "chunk" of the L=256 cache), body
permutes the rows with the one-hot MXU matmul under three policies:

  always  permute every step
  half    lax.cond(i < T/2, permute, identity)
  never   lax.cond(i < 0,  permute, identity)  (same graph shape)

If cond executes conditionally, half ~= (always + never) / 2 and never
~= an empty loop; if it lowers to both-branches/select, all three tie.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from audio_transformers_tpu.core.profiling import (
        enable_compilation_cache)
    enable_compilation_cache()

    on_tpu = jax.default_backend() == "tpu"
    rows, H, D, Lc = (512, 6, 64, 128) if on_tpu else (16, 2, 8, 16)
    T = 128 if on_tpu else 8
    NBUF = 8
    REPS = 3 if on_tpu else 1

    rng = np.random.default_rng(0)
    bufs = [jnp.asarray(rng.standard_normal((rows, H, D, Lc))
                        .astype(np.float32)).astype(jnp.bfloat16)
            for _ in range(NBUF)]
    perm = jnp.asarray(rng.integers(0, rows, rows), jnp.int32)

    import functools

    @functools.partial(jax.jit, static_argnames=("policy", "t"))
    def run(bufs, policy: str, t: int):
        onehot = jax.nn.one_hot(perm, rows, dtype=jnp.bfloat16)

        def permute(bs):
            return [jnp.tensordot(onehot, a, axes=1).astype(a.dtype)
                    for a in bs]

        def ident(bs):
            return list(bs)

        def body(state):
            i, bs = state
            if policy == "always":
                bs = permute(bs)
            else:
                lim = t // 2 if policy == "half" else 0
                bs = jax.lax.cond(i < lim, permute, ident, bs)
            return (i + 1, bs)

        def cond(state):
            return state[0] < t

        _, bs = jax.lax.while_loop(cond, body, (jnp.int32(0), list(bufs)))
        return bs[0].reshape(-1)[:1].astype(jnp.float32)

    def sync(x):
        return float(np.asarray(x, np.float32)[0])

    policies = ("always", "half", "never")
    for p in policies:
        t0 = time.perf_counter()
        sync(run(bufs, policy=p, t=T))
        print(f"compiled {p} ({time.perf_counter()-t0:.1f}s)", flush=True)

    best = {}
    for r in range(3):
        for p in policies:
            for _ in range(REPS):
                t0 = time.perf_counter()
                sync(run(bufs, policy=p, t=T))
                best[p] = min(best.get(p, float("inf")),
                              time.perf_counter() - t0)
        print(f"round {r} done", flush=True)

    nbytes = sum(int(np.prod(a.shape)) * 2 for a in bufs)
    print(f"\n== {T} steps, {NBUF} x {bufs[0].shape} bf16 "
          f"({nbytes/1e6:.0f} MB logical r+w per permute) ==")
    for p in policies:
        print(f"{p:7s} {best[p]*1e3:8.1f} ms total   "
              f"{best[p]/T*1e3:7.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
