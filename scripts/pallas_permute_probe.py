"""Beam cache reorder: one-hot MXU matmul vs the Pallas gather-copy.

RESULT (v5e, 8 x (512, 6, 64, 68) bf16): pallas 2.13 ms/step — 428 MB
moved at ~200 GB/s, i.e. ~4 us per grid point of per-row DMA issue
overhead. The mm (0.08) and take (0.06) cells are NOT comparable: this
harness consumes only bufs[0][:1], and XLA dead-code-eliminates the
other 7 carried buffers for the transparent impls (CLAUDE.md "dead
code lies") — an opaque pallas_call cannot be DCE'd, so only its cell
is real. The production adjudication lives in
scripts/beam_reorder_pallas_ab.py (mm 5.9 vs pallas 13.3 ms/step —
pallas rejected; see ops/permute.py).

Also checks the kernel against jnp.take outside the loop (exact).
Harness matches scripts/cond_reorder_probe.py: carry 8 beam cache
buffers, permute every step, difference two chain lengths per policy,
min each length separately across interleaved rounds.
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from audio_transformers_tpu.core.profiling import enable_compilation_cache
    from audio_transformers_tpu.ops.permute import permute_rows_pallas
    enable_compilation_cache()

    on_tpu = jax.default_backend() == "tpu"
    rows, H, D, L = (512, 6, 64, 68) if on_tpu else (16, 2, 8, 16)
    T_LONG, T_SHORT = (128, 32) if on_tpu else (8, 2)
    NBUF = 8
    REPS = 2 if on_tpu else 1

    rng = np.random.default_rng(0)
    bufs = [jnp.asarray(rng.standard_normal((rows, H, D, L))
                        .astype(np.float32)).astype(jnp.bfloat16)
            for _ in range(NBUF)]

    # correctness: kernel == take, outside any loop
    perm0 = jnp.asarray(rng.permutation(rows).astype(np.int32))
    got = permute_rows_pallas(bufs, perm0, interpret=not on_tpu)
    want = [jnp.take(a, perm0, axis=0) for a in bufs]
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    print("kernel == take: OK", flush=True)

    @functools.partial(jax.jit, static_argnames=("policy", "t"))
    def run(bufs, policy: str, t: int):
        def body(state):
            i, bs = state
            # a step-dependent permutation (beam parents change per step)
            perm = (jnp.arange(rows, dtype=jnp.int32) + i) % rows
            if policy == "mm":
                onehot = jax.nn.one_hot(perm, rows, dtype=jnp.bfloat16)
                bs = [jnp.tensordot(onehot, a, axes=1).astype(a.dtype)
                      for a in bs]
            elif policy == "pallas":
                bs = permute_rows_pallas(bs, perm, interpret=not on_tpu)
            elif policy == "take":
                bs = [jnp.take(a, perm, axis=0) for a in bs]
            return (i + 1, bs)

        _, bs = jax.lax.while_loop(lambda s: s[0] < t, body,
                                   (jnp.int32(0), list(bufs)))
        return bs[0].reshape(-1)[:1].astype(jnp.float32)

    def sync(x):
        return float(np.asarray(x, np.float32)[0])

    policies = ("mm", "pallas", "take") if on_tpu else ("mm", "pallas")
    for p in policies:
        t0 = time.perf_counter()
        sync(run(bufs, policy=p, t=T_LONG))
        sync(run(bufs, policy=p, t=T_SHORT))
        print(f"compiled {p} ({time.perf_counter()-t0:.1f}s)", flush=True)

    best = {}
    for r in range(3):
        for p in policies:
            for t in (T_LONG, T_SHORT):
                for _ in range(REPS):
                    t0 = time.perf_counter()
                    sync(run(bufs, policy=p, t=t))
                    best[(p, t)] = min(best.get((p, t), float("inf")),
                                       time.perf_counter() - t0)
        print(f"round {r} done", flush=True)

    nbytes = sum(int(np.prod(a.shape)) * 2 for a in bufs)
    print(f"\n== {NBUF} x {bufs[0].shape} bf16 "
          f"({2*nbytes/1e6:.0f} MB r+w per permute), "
          f"chains {T_LONG}/{T_SHORT} ==")
    for p in policies:
        d = (best[(p, T_LONG)] - best[(p, T_SHORT)]) / (T_LONG - T_SHORT)
        print(f"{p:7s} {d*1e3:7.3f} ms/step   "
              f"(totals {best[(p, T_LONG)]*1e3:7.1f} / "
              f"{best[(p, T_SHORT)]*1e3:7.1f} ms)", flush=True)


if __name__ == "__main__":
    main()
