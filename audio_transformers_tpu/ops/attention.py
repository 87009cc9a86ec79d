"""Fused (flash) attention Pallas kernel for TPU.

The XLA attention path materializes the (B, H, Tq, Tk) probability tensor
in HBM — for the whisper encoder (Tk = 1500) that is gigabytes of traffic
per layer and dominates encoder time. This kernel computes attention with
the online-softmax recurrence entirely in VMEM: per (batch*head, q-block)
grid cell it streams K/V blocks, keeping running max/denominator, so HBM
traffic is just q/k/v/out.

Forward-only (used on the inference/serving path); training uses the XLA
path, whose backward XLA generates itself. The reference's equivalent tier
is cuDNN attention inside HF Whisper (SURVEY.md §2b).
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


def _flash_kernel(q_ref, k_ref, v_ref, out_ref, *, block_q: int,
                  block_k: int, t_k: int, scale: float, causal: bool):
    iq = pl.program_id(1)
    # keep the MXU inputs in the storage dtype (bf16 runs 4x the f32 rate);
    # accumulation is fp32 via preferred_element_type
    q = q_ref[0]  # (block_q, d)
    d = q.shape[-1]
    num_kb = k_ref.shape[1] // block_k

    acc = jnp.zeros((block_q, d), jnp.float32)
    m = jnp.full((block_q, 1), _NEG_INF, jnp.float32)
    l = jnp.zeros((block_q, 1), jnp.float32)

    q_pos = iq * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 0)

    for kb in range(num_kb):
        k = k_ref[0, kb * block_k:(kb + 1) * block_k, :]
        v = v_ref[0, kb * block_k:(kb + 1) * block_k, :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (bq, bk) f32
        k_pos = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        mask = k_pos < t_k
        if causal:
            mask &= k_pos <= q_pos
        s = jnp.where(mask, s, _NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        m = m_new

    out_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(out_ref.dtype)


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                    causal: bool = False, scale: float | None = None,
                    block_q: int = 512, block_k: int = 512,
                    interpret: bool | None = None) -> jax.Array:
    """q (B,H,Tq,D), k/v (B,H,Tk,D) -> (B,H,Tq,D). Forward only."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, t_q, d = q.shape
    t_k = k.shape[2]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)

    t_q_pad = _round_up(t_q, block_q)
    t_k_pad = _round_up(t_k, block_k)

    def pad(x, t_pad):
        t = x.shape[2]
        if t == t_pad:
            return x
        return jnp.pad(x, ((0, 0), (0, 0), (0, t_pad - t), (0, 0)))

    qf = pad(q, t_q_pad).reshape(b * h, t_q_pad, d)
    kf = pad(k, t_k_pad).reshape(b * h, t_k_pad, d)
    vf = pad(v, t_k_pad).reshape(b * h, t_k_pad, d)

    kernel = functools.partial(_flash_kernel, block_q=block_q,
                               block_k=block_k, t_k=t_k, scale=scale,
                               causal=causal)
    grid = (b * h, t_q_pad // block_q)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_k_pad, d), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_k_pad, d), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, i: (bh, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, t_q_pad, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * t_q * t_k * d,
            bytes_accessed=(qf.size + kf.size + vf.size) * q.dtype.itemsize
            + b * h * t_q_pad * d * q.dtype.itemsize,
            transcendentals=b * h * t_q_pad * t_k_pad,
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, h, t_q_pad, d)[:, :, :t_q, :]


def attention_reference(q, k, v, *, causal: bool = False,
                        scale: float | None = None) -> jax.Array:
    """Unfused XLA attention with identical semantics (test oracle)."""
    d = q.shape[-1]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if causal:
        t_q, t_k = q.shape[2], k.shape[2]
        mask = (jnp.arange(t_k)[None, :] <= jnp.arange(t_q)[:, None])
        s = jnp.where(mask[None, None], s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)
