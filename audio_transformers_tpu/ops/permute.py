"""Row permutation of decode-cache buffers as a Pallas gather-copy.

Beam search reorders every self-KV cache buffer by the chosen parent
beams each step (HF `_reorder_cache`, reached from the reference's
`model.generate(num_beams=...)` call at
/root/reference/whisper_finetune/evaluate_simple.py:125-135). Inside a
decode `while_loop` XLA lowers a `jnp.take` row gather of carried
buffers pathologically (+12.1 ms/step at b128/N=4 — see
`models/whisper/beam.resolve_beam_reorder`), and the one-hot MXU
matmul workaround pays O(rows^2 * row_bytes) MXU FLOPs for what is
logically a copy. This kernel does the copy as a copy: grid = one
program per output row, the scalar-prefetched `perm` drives the INPUT
block's index map, so program i DMAs row `perm[i]` and writes row i;
all buffers of one permutation ride a single `pallas_call`.

REJECTED as the in-loop beam reorder, measured on chip twice
(scripts/beam_reorder_pallas_ab.py, scripts/pallas_permute_probe.py):

  - in production generate_beam it measures 13.3 ms/step vs the
    matmul's 5.9 at b128/N=4 — the opaque custom call defeats XLA's
    while-loop carry aliasing, so every carried buffer is copied
    around the kernel each step on top of the kernel's own work;
  - even isolated, 512 grid points of 16 x 52 kB row DMAs run at
    ~4 us/point (428 MB moved at ~200 GB/s, a quarter of HBM peak) —
    per-row DMA issue overhead dominates at this granularity.

It stays maintained as (a) the exact-copy oracle for reorder-impl
tests — being a pure copy it is bit-exact for every dtype, which is
how the mm path's f32 demotion bug was caught on chip (TPU
default-precision matmul rounds f32 operands to bf16; see
`beam._permute_rows_mxu`) — and (b) the building block for any future
OUT-of-loop batched row gather where XLA's lowering misbehaves.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _copy_kernel(n_bufs: int, perm_ref, *refs):
    del perm_ref  # consumed by the index maps
    for i in range(n_bufs):
        refs[n_bufs + i][...] = refs[i][...]


def _in_map(ndim: int):
    def m(i, perm_ref):
        return (perm_ref[i],) + (0,) * (ndim - 1)
    return m


def _out_map(ndim: int):
    def m(i, perm_ref):
        return (i,) + (0,) * (ndim - 1)
    return m


def permute_rows_pallas(bufs: Sequence[jax.Array],
                        perm: jax.Array,
                        *, interpret: Optional[bool] = None
                        ) -> List[jax.Array]:
    """out[j][i] = bufs[j][perm[i]] for every buffer, one fused kernel.

    `perm` is (rows,) int32; every buffer shares the same leading dim.
    Buffers may differ in rank/shape/dtype past the leading axis.
    Off-TPU the kernel runs in interpret mode (tests / CPU meshes).
    """
    import functools

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    rows = bufs[0].shape[0]
    assert all(a.shape[0] == rows for a in bufs)
    perm = perm.astype(jnp.int32)

    # Mosaic requires each block's last two dims divisible by (8, 128)
    # or equal to the array's — a 2D buffer's (1, X) block has neither,
    # so lift 2D to (rows, 1, X) where (1, X) equals the array dims.
    shapes = [a.shape for a in bufs]
    bufs = [a.reshape(rows, 1, -1) if a.ndim < 3 else a for a in bufs]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(rows,),
        in_specs=[pl.BlockSpec((1,) + a.shape[1:], _in_map(a.ndim))
                  for a in bufs],
        out_specs=[pl.BlockSpec((1,) + a.shape[1:], _out_map(a.ndim))
                   for a in bufs],
    )
    out = pl.pallas_call(
        functools.partial(_copy_kernel, len(bufs)),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(a.shape, a.dtype) for a in bufs],
        interpret=interpret,
    )(perm, *bufs)
    return [o.reshape(s) for o, s in zip(out, shapes)]
