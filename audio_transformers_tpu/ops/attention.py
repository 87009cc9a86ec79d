"""Fused (flash) attention Pallas kernels for TPU (forward + backward).

The XLA attention path materializes the (B, H, Tq, Tk) probability tensor
in HBM — for the whisper encoder (Tk = 1500) that is gigabytes of traffic
per layer, dominates encoder time, and (since XLA saves it as a backward
residual) caps the training batch size. These kernels compute attention
with the online-softmax recurrence entirely in VMEM; the backward pass
recomputes probabilities from q/k + the saved per-row logsumexp instead of
storing them (the standard flash-attention VJP), so residual memory is
O(B*H*Tq) instead of O(B*H*Tq*Tk).

`flash_attention` is differentiable via jax.custom_vjp and is the fused
equivalent of the cuDNN attention the reference gets inside HF Whisper
(SURVEY.md §2b).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float(jnp.finfo(jnp.float32).min)


from audio_transformers_tpu.ops._tile import round_up as _round_up


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, out_ref, lse_ref, *, block_q: int,
                block_k: int, t_q: int, t_k: int, scale: float,
                causal: bool):
    iq = pl.program_id(1)
    q = q_ref[0]  # (block_q, d) — storage dtype feeds the MXU (bf16 4x f32)
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
            preferred_element_type=jnp.float32) * scale
        # Build the mask only where it can matter — the padded tail
        # block, or anywhere under causality (two (block_q, block_k)
        # iotas + compares + select per k-block otherwise).
        pad_tail = kb == num_kb - 1 and (kb + 1) * block_k > t_k
        if causal or pad_tail:
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
    # logsumexp per row; padded q rows get 0 so the backward recompute
    # stays finite (their cotangent is zero anyway)
    row = iq * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
    lse = m + jnp.log(jnp.maximum(l, 1e-30))
    lse_ref[0] = jnp.where(row < t_q, lse, 0.0)


def _fwd_impl(q, k, v, *, causal, scale, block_q, block_k, interpret):
    b, h, t_q, d = q.shape
    t_k = k.shape[2]
    t_q_pad = _round_up(t_q, block_q)
    t_k_pad = _round_up(t_k, block_k)

    def pad(x, t_pad):
        t = x.shape[2]
        return x if t == t_pad else jnp.pad(
            x, ((0, 0), (0, 0), (0, t_pad - t), (0, 0)))

    qf = pad(q, t_q_pad).reshape(b * h, t_q_pad, d)
    kf = pad(k, t_k_pad).reshape(b * h, t_k_pad, d)
    vf = pad(v, t_k_pad).reshape(b * h, t_k_pad, d)

    kernel = functools.partial(_fwd_kernel, block_q=block_q,
                               block_k=block_k, t_q=t_q, t_k=t_k,
                               scale=scale, causal=causal)
    out, lse = pl.pallas_call(
        kernel,
        grid=(b * h, t_q_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_k_pad, d), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_k_pad, d), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            # trailing singleton keeps the block shape legal: the last
            # block dim equals the array dim (1), the middle is 8-divisible
            pl.BlockSpec((1, block_q, 1), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, t_q_pad, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, t_q_pad, 1), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * t_q * t_k * d,
            bytes_accessed=(qf.size + 2 * kf.size) * q.dtype.itemsize,
            transcendentals=b * h * t_q_pad * t_k_pad,
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return out, lse, (qf, kf, vf)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
                   *, block_q: int, block_k: int, t_q: int, t_k: int,
                   scale: float, causal: bool):
    iq = pl.program_id(1)
    q = q_ref[0]
    do = do_ref[0]
    lse = lse_ref[0]          # (block_q, 1) f32
    delta = delta_ref[0]
    d = q.shape[-1]
    num_kb = k_ref.shape[1] // block_k

    q_pos = iq * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 0)
    dq = jnp.zeros((block_q, d), jnp.float32)
    for kb in range(num_kb):
        k = k_ref[0, kb * block_k:(kb + 1) * block_k, :]
        v = v_ref[0, kb * block_k:(kb + 1) * block_k, :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if causal:
            k_pos = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            mask = (k_pos < t_k) & (q_pos < t_q) & (k_pos <= q_pos)
            p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        else:
            # zero padding makes masks unnecessary: padded k rows are
            # zero (s=0, and dq += ds.k contributes 0) and padded q rows
            # carry do=0 (ds=0). Mask construction otherwise costs two
            # (block_q, block_k) iotas + compares per k-block.
            p = jnp.exp(s - lse)
        dov = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (bq, bk)
        ds = p * (dov - delta)
        dq += jax.lax.dot(ds.astype(k.dtype), k,
                          preferred_element_type=jnp.float32)
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, *, block_q: int, block_k: int,
                    t_q: int, t_k: int, scale: float, causal: bool):
    jk = pl.program_id(1)
    k = k_ref[0]   # (block_k, d)
    v = v_ref[0]
    d = k.shape[-1]
    num_qb = q_ref.shape[1] // block_q

    k_pos = jk * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 1)
    dk = jnp.zeros((block_k, d), jnp.float32)
    dv = jnp.zeros((block_k, d), jnp.float32)
    for qb in range(num_qb):
        q = q_ref[0, qb * block_q:(qb + 1) * block_q, :]
        do = do_ref[0, qb * block_q:(qb + 1) * block_q, :]
        lse = lse_ref[0, qb * block_q:(qb + 1) * block_q, :]
        delta = delta_ref[0, qb * block_q:(qb + 1) * block_q, :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (bq, bk)
        if causal:
            q_pos = qb * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            mask = (k_pos < t_k) & (q_pos < t_q) & (k_pos <= q_pos)
            p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        else:
            # see _bwd_dq_kernel: zero padding zeroes every masked
            # contribution (padded dk/dv rows are sliced off by the
            # caller), so the masks only cost VPU work here
            p = jnp.exp(s - lse)
        # dv_j = sum_i p_ij * do_i
        dv += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dov = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dov - delta)
        # dk_j = sum_i ds_ij * q_i
        dk += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                    causal: bool = False, scale: float | None = None,
                    block_q: int = 512, block_k: int = 512,
                    interpret: bool | None = None) -> jax.Array:
    """q (B,H,Tq,D), k/v (B,H,Tk,D) -> (B,H,Tq,D). Differentiable.

    Default blocks from same-process interleaved fwd+bwd sweeps on v5e
    (whisper-tiny encoder shape H=6, T=1500, d=64 —
    scripts/flash_train_block_sweep.py, min over rounds): 512/512 wins at
    BOTH training batches (b16: 1.83 ms vs 2.06 for 256/512; b64: 7.86 vs
    10.09, a 22% gap). An earlier noisier train-step sweep had picked
    256/512. Larger q blocks OOM the dkv kernel's VMEM scratch at
    block_k 1536."""
    if interpret is None:
        interpret = _interpret_default()
    d = q.shape[-1]
    # Clamp blocks to the (128-aligned) sequence lengths: the encoder
    # wants big 512 blocks, but a short-sequence caller (classifier
    # T~173, decoder self-attention T=48) would otherwise pad the whole
    # grid up to the block and burn 2-3x the tiles on masked rows.
    block_q = min(block_q, _round_up(q.shape[2], 128))
    block_k = min(block_k, _round_up(k.shape[2], 128))
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    # Fold the softmax scale into q (one pass over q) instead of scaling
    # every (block_q, block_k) logit tile inside the kernel — at encoder
    # shapes the s-tile multiply is ~1.8 G VPU ops per layer. Outside the
    # custom_vjp boundary, so autodiff chains it for free.
    q = q * jnp.asarray(scale, q.dtype)
    return _flash(q, k, v, causal, 1.0, block_q, block_k, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash(q, k, v, causal, scale, block_q, block_k, interpret):
    out, _, _ = _fwd_impl(q, k, v, causal=causal, scale=scale,
                          block_q=block_q, block_k=block_k,
                          interpret=interpret)
    b, h, t_q, d = q.shape
    return out.reshape(b, h, -1, d)[:, :, :t_q, :]


def _flash_fwd(q, k, v, causal, scale, block_q, block_k, interpret):
    out, lse, (qf, kf, vf) = _fwd_impl(
        q, k, v, causal=causal, scale=scale, block_q=block_q,
        block_k=block_k, interpret=interpret)
    b, h, t_q, d = q.shape
    t_k = k.shape[2]
    res = (qf, kf, vf, out, lse, (b, h, t_q, t_k))
    return out.reshape(b, h, -1, d)[:, :, :t_q, :], res


def _flash_bwd(causal, scale, block_q, block_k, interpret, res, g):
    qf, kf, vf, outf, lse, (b, h, t_q, t_k) = res
    bh, t_q_pad, d = qf.shape
    t_k_pad = kf.shape[1]

    gf = g.astype(qf.dtype)
    if t_q_pad != t_q:
        gf = jnp.pad(gf, ((0, 0), (0, 0), (0, t_q_pad - t_q), (0, 0)))
    gf = gf.reshape(bh, t_q_pad, d)

    # delta_i = rowsum(dout_i * out_i), fp32 (tiny; plain XLA)
    delta = jnp.sum(gf.astype(jnp.float32) * outf.astype(jnp.float32),
                    axis=-1, keepdims=True)  # (bh, t_q_pad, 1)

    dq_kernel = functools.partial(_bwd_dq_kernel, block_q=block_q,
                                  block_k=block_k, t_q=t_q, t_k=t_k,
                                  scale=scale, causal=causal)
    dq = pl.pallas_call(
        dq_kernel,
        grid=(bh, t_q_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh_, i: (bh_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_k_pad, d), lambda bh_, i: (bh_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_k_pad, d), lambda bh_, i: (bh_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda bh_, i: (bh_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda bh_, i: (bh_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda bh_, i: (bh_, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh_, i: (bh_, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, t_q_pad, d), qf.dtype),
        interpret=interpret,
    )(qf, kf, vf, gf, lse, delta)

    dkv_kernel = functools.partial(_bwd_dkv_kernel, block_q=block_q,
                                   block_k=block_k, t_q=t_q, t_k=t_k,
                                   scale=scale, causal=causal)
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(bh, t_k_pad // block_k),
        in_specs=[
            pl.BlockSpec((1, t_q_pad, d), lambda bh_, j: (bh_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda bh_, j: (bh_, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda bh_, j: (bh_, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_q_pad, d), lambda bh_, j: (bh_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_q_pad, 1), lambda bh_, j: (bh_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_q_pad, 1), lambda bh_, j: (bh_, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_k, d), lambda bh_, j: (bh_, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda bh_, j: (bh_, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, t_k_pad, d), kf.dtype),
            jax.ShapeDtypeStruct((bh, t_k_pad, d), vf.dtype),
        ),
        interpret=interpret,
    )(qf, kf, vf, gf, lse, delta)

    dq = dq.reshape(-1, h, t_q_pad, d)[:, :, :t_q, :]
    dk = dk.reshape(-1, h, t_k_pad, d)[:, :, :t_k, :]
    dv = dv.reshape(-1, h, t_k_pad, d)[:, :, :t_k, :]
    return dq, dk, dv


_flash.defvjp(_flash_fwd, _flash_bwd)


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
