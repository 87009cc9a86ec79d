"""Fused single-query (decode-step) attention Pallas kernel.

Profiling the decode while-loop showed XLA lowers the per-step
cross-attention einsums (q len 1 against 1500 encoder keys) to
multiply+reduce fusions running at ~25% of HBM bandwidth — and they
dominate the step. This kernel streams K/V blocks through the pallas
pipeline (grid dim 1) with the online-softmax recurrence carried in VMEM
scratch, so the cost approaches the unavoidable K/V read.

Used by `apply_decoder_step` for cross-attention (encoder keys: long T,
loop-invariant); self-attention caches are short and stay on the XLA path.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float(jnp.finfo(jnp.float32).min)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(q_ref, k_ref, v_ref, out_ref, acc_ref, stats_ref, *,
            block_t: int, t_valid: int, scale: float):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        stats_ref[0] = jnp.full_like(stats_ref[0], _NEG_INF)  # running max
        stats_ref[1] = jnp.zeros_like(stats_ref[1])           # running sum

    q = q_ref[0].astype(jnp.float32)          # (block_bh, d)
    k = k_ref[0].astype(jnp.float32)          # (block_bh, block_t, d)
    v = v_ref[0].astype(jnp.float32)

    s = jnp.sum(q[:, None, :] * k, axis=-1) * scale  # (block_bh, block_t)
    t_pos = j * block_t + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(t_pos < t_valid, s, _NEG_INF)

    m_old = stats_ref[0][:, :1]                # (block_bh, 1)
    l_old = stats_ref[1][:, :1]
    m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
    alpha = jnp.exp(m_old - m_new)
    p = jnp.exp(s - m_new)
    l_new = l_old * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jnp.sum(p[:, :, None] * v, axis=1)
    stats_ref[0] = jnp.broadcast_to(m_new, stats_ref[0].shape)
    stats_ref[1] = jnp.broadcast_to(l_new, stats_ref[1].shape)

    @pl.when(j == nj - 1)
    def _():
        l = stats_ref[1][:, :1]
        out_ref[0] = (acc_ref[:] / jnp.maximum(l, 1e-30)) \
            .astype(out_ref.dtype)


def decode_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                     scale: float | None = None, block_bh: int = 8,
                     block_t: int = 512,
                     interpret: bool | None = None) -> jax.Array:
    """q (B,H,D), k/v (B,H,T,D) -> (B,H,D). Softmax attention over T.

    The T padding is loop-invariant when k/v are (XLA hoists it out of a
    surrounding while_loop), so per-decode-step HBM traffic is just K+V.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, d = q.shape
    t = k.shape[2]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)

    bh = b * h
    # q/out blocks need an 8-divisible (or full) second-to-last dim
    if bh % 8:
        pad_bh = _round_up(bh, 8) - bh
        q = q.reshape(bh, d)
        q = jnp.pad(q, ((0, pad_bh), (0, 0)))
        k = jnp.pad(k.reshape(bh, t, d), ((0, pad_bh), (0, 0), (0, 0)))
        v = jnp.pad(v.reshape(bh, t, d), ((0, pad_bh), (0, 0), (0, 0)))
        bh_pad = bh + pad_bh
    else:
        q, k, v = q.reshape(bh, d), k.reshape(bh, t, d), v.reshape(bh, t, d)
        bh_pad = bh
    t_pad = _round_up(t, block_t)
    if t_pad != t:
        k = jnp.pad(k, ((0, 0), (0, t_pad - t), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, t_pad - t), (0, 0)))

    kernel = functools.partial(_kernel, block_t=block_t, t_valid=t,
                               scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(bh_pad // block_bh, t_pad // block_t),
        in_specs=[
            pl.BlockSpec((1, block_bh, d), lambda i, j: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_bh, block_t, d),
                         lambda i, j: (0, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_bh, block_t, d),
                         lambda i, j: (0, i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_bh, d), lambda i, j: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, bh_pad, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_bh, d), jnp.float32),      # acc
            pltpu.VMEM((2, block_bh, 128), jnp.float32),  # running max/sum
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * t * d,
            bytes_accessed=(k.size + v.size) * k.dtype.itemsize,
            transcendentals=bh_pad * t_pad,
        ),
        interpret=interpret,
    )(q[None], k[None], v[None])
    return out[0, :bh].reshape(b, h, d)


def decode_attention_reference(q, k, v, *, scale=None) -> jax.Array:
    """XLA oracle with identical semantics."""
    d = q.shape[-1]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    s = jnp.einsum("bhd,bhtd->bht", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bht,bhtd->bhd", p,
                      v.astype(jnp.float32)).astype(q.dtype)
