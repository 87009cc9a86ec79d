"""Fused single-query (decode-step) cross-attention Pallas kernel.

Decode-phase attribution (scripts/decode_phase_bench.py, v5e batch 128)
shows the per-step cross-attention IS the decode step: 1.41 ms of the
1.48 ms int8 step (self-attn 0.05, processors 0.20). The contraction is
a batched matvec — the MXU cannot amortize weight loads at M=1, so the
VPU is the right engine and the bound is VPU throughput plus the K/V
read. The XLA int8 lowering spends extra full-width passes quantizing q
and the probabilities and runs ~2x off that bound.

Kernel design (per grid step: 8 (b,h) pairs x one T block, both K and V
in the production (bh, head_dim, T) layout — no relayouts anywhere):
  - QK: q broadcast over lanes, multiply into K (8, hd, bt), reduce hd
    on the SUBLANE axis -> s (8, bt)
  - online-softmax stats kept as (8, 128) VMEM rows (lane-broadcast
    scalars, the one Mosaic-friendly shape for running max/sum)
  - PV: p broadcast over the sublane (d) axis, multiply into V
    (8, hd, bt), reduce t on the LANE axis -> (8, hd)
  - int8: scales fold at the edges (k_scale multiplies the s row,
    v_scale the final output row); q and p are NEVER quantized — fewer
    VPU passes than the XLA int8 path AND better accuracy.

Per-step HBM traffic is exactly one K + V read (online-softmax carries
the running stats in scratch across T blocks).

Reference equivalent: the per-token attention inside HF's generate
(whisper_finetune/evaluate_simple.py:125-135 drives it); there it is a
cuDNN call per step.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float(jnp.finfo(jnp.float32).min)


from audio_transformers_tpu.ops._tile import round_up as _round_up


def pack_int4(x: jax.Array) -> jax.Array:
    """Pack an int32/int8 array of 4-bit values in [-8, 7] along the minor
    (time) axis: byte t holds position 2t in the LOW nibble and 2t+1 in
    the HIGH nibble. The minor axis must be even. Returns int8 of half
    the minor length."""
    lo = x[..., 0::2].astype(jnp.int32) & 0xF
    hi = x[..., 1::2].astype(jnp.int32) & 0xF
    return ((hi << 4) | lo).astype(jnp.int8)


def unpack_int4(x: jax.Array) -> jax.Array:
    """Inverse of pack_int4: int8 packed bytes -> int32 values, minor axis
    doubled (..., 2T), sign-extended from 4 bits."""
    b = x.astype(jnp.int32) & 0xFF
    lo = ((b & 0xF) ^ 8) - 8
    hi = ((b >> 4) ^ 8) - 8
    return jnp.stack([lo, hi], axis=-1).reshape(*x.shape[:-1],
                                                2 * x.shape[-1])


def preferred_block_t(t: int) -> int:
    """The kernel's preferred time-block for a given key count."""
    return min(768, _round_up(t, 128))


def default_block_bh(itemsize: int, block_t: int, int4: bool) -> int:
    """Default (b,h)-block, from the on-chip sweeps (v5e, b128, T=1500).

    int8/bf16: big blocks reach the K+V-read floor ((64,768) 0.77 ms vs
    (8,512) 1.21 for int8); scale down by dtype so the double-buffered
    K+V blocks stay ~12.6 MB of VMEM. int4's VMEM cost is NOT the packed
    bytes: the in-kernel unpack materializes kb (int32) + k_lo/k_hi
    (f32) temporaries, ~12 B per packed element — at block_bh=128 Mosaic's
    16 MB scoped-VMEM stack overflows (28.7 MB measured; compile FAIL).
    The chip sweep (scripts/int4_chip_check.py stage 2) picks 64:
    0.187 ms/layer vs 0.234 at 32.
    """
    eff_itemsize = 1 if int4 else itemsize
    return max(int(64 // eff_itemsize) // max(block_t // 768, 1), 8)


def pad_time_for_decode_kernel(x: jax.Array, t: int) -> jax.Array:
    """Zero-pad the minor (time) axis to the kernel's block multiple.
    Call ONCE outside the decode loop (see t_valid in
    decode_cross_attention)."""
    t_pad = _round_up(t, preferred_block_t(t))
    if t_pad == x.shape[-1]:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, t_pad - x.shape[-1])]
    return jnp.pad(x, pad)


def _kernel(q_ref, k_ref, v_ref, ks_ref, vs_ref, out_ref, acc_ref,
            stats_ref, *, block_t: int, t_valid: int, scale: float,
            quant: str, block_bh: int):
    """Grid (bh/block_bh, T/block_t). Blocks:
      q   (block_bh, hd)           f32/bf16
      k   (block_bh, hd, block_t)  storage dtype (bf16 or int8);
                                   int4: (block_bh, hd, block_t/2) packed
      v   (block_bh, hd, block_t)  (int4: packed, like k)
      ks  (block_bh, 1, block_t)   f32 (int8; dummy for "none");
                                   int4: (block_bh, 2, block_t/2),
                                   row 0 = even positions, row 1 = odd
      vs  (block_bh, hd)           f32 (int8/int4 only)
      out (block_bh, hd)
    Scratch: acc (block_bh, hd) f32; stats (2, block_bh, 128) f32.

    int4 never unpacks to an interleaved (bh, bt) row: the low/high
    nibbles are treated as two independent half-blocks ("even"/"odd"
    time positions) that each update the same online-softmax stats —
    order within a block is irrelevant to softmax, and only the
    t_valid mask needs the true position (base + 2*i / base + 2*i + 1).
    """
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        stats_ref[0] = jnp.full_like(stats_ref[0], _NEG_INF)
        stats_ref[1] = jnp.zeros_like(stats_ref[1])

    q = q_ref[:].astype(jnp.float32)                   # (bh8, hd)
    m_old = stats_ref[0][:, :1]                        # (bh8, 1)
    l_old = stats_ref[1][:, :1]

    if quant == "int4":
        kb = k_ref[:].astype(jnp.int32) & 0xFF         # (bh8, hd, bt/2)
        k_lo = (((kb & 0xF) ^ 8) - 8).astype(jnp.float32)
        k_hi = (((kb >> 4) ^ 8) - 8).astype(jnp.float32)
        q3 = q[:, :, None]
        s_e = jnp.sum(q3 * k_lo, axis=1) * ks_ref[:, 0, :] * scale
        s_o = jnp.sum(q3 * k_hi, axis=1) * ks_ref[:, 1, :] * scale
        it = jax.lax.broadcasted_iota(jnp.int32, s_e.shape, 1)
        base = j * block_t
        s_e = jnp.where(base + 2 * it < t_valid, s_e, _NEG_INF)
        s_o = jnp.where(base + 2 * it + 1 < t_valid, s_o, _NEG_INF)
        m_new = jnp.maximum(
            m_old, jnp.maximum(jnp.max(s_e, axis=1, keepdims=True),
                               jnp.max(s_o, axis=1, keepdims=True)))
        alpha = jnp.exp(m_old - m_new)
        p_e = jnp.exp(s_e - m_new)
        p_o = jnp.exp(s_o - m_new)
        l_new = (l_old * alpha + jnp.sum(p_e, axis=1, keepdims=True)
                 + jnp.sum(p_o, axis=1, keepdims=True))
        vb = v_ref[:].astype(jnp.int32) & 0xFF
        v_lo = (((vb & 0xF) ^ 8) - 8).astype(jnp.float32)
        v_hi = (((vb >> 4) ^ 8) - 8).astype(jnp.float32)
        pv = (jnp.sum(p_e[:, None, :] * v_lo, axis=2)
              + jnp.sum(p_o[:, None, :] * v_hi, axis=2))  # (bh8, hd)
    else:
        k = k_ref[:]                                   # (bh8, hd, bt)
        # QK: multiply q (lane-broadcast) into K, reduce hd on sublanes.
        s = jnp.sum(q[:, :, None] * k.astype(jnp.float32), axis=1)
        if quant == "int8":
            s = s * ks_ref[:, 0, :]
        s = s * scale
        t_pos = j * block_t + jax.lax.broadcasted_iota(jnp.int32, s.shape,
                                                       1)
        s = jnp.where(t_pos < t_valid, s, _NEG_INF)

        m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_old - m_new)
        p = jnp.exp(s - m_new)                         # (bh8, bt)
        l_new = l_old * alpha + jnp.sum(p, axis=1, keepdims=True)

        v = v_ref[:]                                   # (bh8, hd, bt)
        # PV: p broadcast over the sublane (d) axis, reduce t on lanes.
        pv = jnp.sum(p[:, None, :] * v.astype(jnp.float32), axis=2)

    acc_ref[:] = acc_ref[:] * alpha + pv
    stats_ref[0] = jnp.broadcast_to(m_new, stats_ref[0].shape)
    stats_ref[1] = jnp.broadcast_to(l_new, stats_ref[1].shape)

    @pl.when(j == nj - 1)
    def _():
        l = stats_ref[1][:, :1]
        o = acc_ref[:] / jnp.maximum(l, 1e-30)
        if quant != "none":
            o = o * vs_ref[:]                          # per-channel scales
        out_ref[:] = o.astype(out_ref.dtype)


def decode_cross_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                           k_scale: Optional[jax.Array] = None,
                           v_scale: Optional[jax.Array] = None,
                           scale: float | None = None,
                           block_bh: Optional[int] = None,
                           block_t: Optional[int] = None,
                           t_valid: Optional[int] = None,
                           interpret: bool | None = None) -> jax.Array:
    """Single-query attention over precomputed keys/values.

    q (B, H, hd); k AND v (B, H, hd, T) — the production time-minor
    layout. For int8 k/v pass k_scale (B, H, T) and v_scale (B, H, hd)
    (both f32). For int4, k/v are nibble-packed along time (B, H, hd,
    T/2) int8 (pack_int4) with k_scale split even/odd as (B, H, 2, T/2)
    — the scale rank is what selects the int4 path. Returns (B, H, hd)
    in q's dtype.

    `t_valid`: when the caller has ALREADY padded the time axis to a
    block_t multiple (pad_time_for_decode_kernel), pass the true key
    count here — crucial inside a decode loop, where an internal
    jnp.pad of the loop-invariant K/V would otherwise copy the whole
    cache every step (measured +3.3 ms/step at batch 128).

    Default blocks come from a same-process sweep at whisper-tiny batch
    128, T=1500 on v5e (int8: (8,512) 1.21 / (16,1536) 0.96 / (64,768)
    0.77 ms per 4-layer pass — the big bh block is what reaches the
    0.72 ms K+V-read floor), scaled down by dtype so the double-buffered
    K+V blocks stay ~12.6 MB of VMEM.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, hd = q.shape
    scale = scale if scale is not None else 1.0 / math.sqrt(hd)
    # int4 is structurally inferred: its per-position K scales are split
    # even/odd as (B, H, 2, T/2), vs (B, H, T) for int8.
    if k_scale is None:
        quant = "none"
    elif k_scale.ndim == 4:
        quant = "int4"
    else:
        quant = "int8"
    int4 = quant == "int4"
    t = 2 * k.shape[3] if int4 else k.shape[3]  # true key count capacity
    bh = b * h
    if block_t is None:
        block_t = preferred_block_t(t_valid or t)
    if int4 and block_t % 256:
        # the packed K/V block's lane extent is block_t//2 and Mosaic
        # needs it 128-aligned, so the (true) time block must be a
        # multiple of 256
        block_t = _round_up(block_t, 256)
    if block_bh is None:
        block_bh = default_block_bh(k.dtype.itemsize, block_t, int4)
    block_bh = min(block_bh, _round_up(bh, 8))
    bh_pad = _round_up(bh, block_bh)
    t_pad = _round_up(t, block_t)
    if t_valid is None:
        t_valid = t
    elif t % block_t:
        raise ValueError(f"t_valid given but T={t} is not a multiple of "
                         f"block_t={block_t}")

    def pad_bh(x):
        return x if x.shape[0] == bh_pad else jnp.pad(
            x, ((0, bh_pad - bh),) + ((0, 0),) * (x.ndim - 1))

    def pad_t(x, tp):
        return x if x.shape[-1] == tp else jnp.pad(
            x, ((0, 0),) * (x.ndim - 1) + ((0, tp - x.shape[-1]),))

    t_store = t_pad // 2 if int4 else t_pad   # minor-axis length in storage
    qf = pad_bh(q.reshape(bh, hd))
    kf = pad_t(pad_bh(k.reshape(bh, hd, k.shape[3])), t_store)
    vf = pad_t(pad_bh(v.reshape(bh, hd, v.shape[3])), t_store)
    if int4:
        ksf = pad_t(pad_bh(k_scale.reshape(bh, 2, k_scale.shape[3])
                           .astype(jnp.float32)), t_store)
        vsf = pad_bh(v_scale.reshape(bh, hd).astype(jnp.float32))
        ks_spec = pl.BlockSpec((block_bh, 2, block_t // 2),
                               lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM)
    elif quant == "int8":
        ksf = pad_t(pad_bh(k_scale.reshape(bh, 1, k_scale.shape[2])
                           .astype(jnp.float32)), t_store)
        vsf = pad_bh(v_scale.reshape(bh, hd).astype(jnp.float32))
        ks_spec = pl.BlockSpec((block_bh, 1, block_t),
                               lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM)
    else:
        # dummy operands keep the call signature static
        ksf = jnp.ones((bh_pad, 1, 128), jnp.float32)
        vsf = jnp.ones((bh_pad, hd), jnp.float32)
        ks_spec = pl.BlockSpec((block_bh, 1, 128), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM)

    kv_block = block_t // 2 if int4 else block_t
    kernel = functools.partial(_kernel, block_t=block_t, t_valid=t_valid,
                               scale=scale, quant=quant, block_bh=block_bh)
    out = pl.pallas_call(
        kernel,
        grid=(bh_pad // block_bh, t_pad // block_t),
        in_specs=[
            pl.BlockSpec((block_bh, hd), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_bh, hd, kv_block), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_bh, hd, kv_block), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            ks_spec,
            pl.BlockSpec((block_bh, hd), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_bh, hd), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh_pad, hd), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_bh, hd), jnp.float32),
            pltpu.VMEM((2, block_bh, 128), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * t * hd,
            bytes_accessed=(kf.size + vf.size) * kf.dtype.itemsize,
            transcendentals=bh_pad * t_pad,
        ),
        interpret=interpret,
    )(qf, kf, vf, ksf, vsf)
    return out[:bh].reshape(b, h, hd)


def decode_cross_attention_reference(q, k, v, *, k_scale=None, v_scale=None,
                                     scale=None) -> jax.Array:
    """XLA oracle with identical semantics (k and v (B,H,hd,T); int4
    operands in the packed layout decode_cross_attention expects)."""
    hd = q.shape[-1]
    scale = scale if scale is not None else 1.0 / math.sqrt(hd)
    if k_scale is not None and k_scale.ndim == 4:      # int4 packed
        k = unpack_int4(k)
        v = unpack_int4(v)
        # (B, H, 2, T/2) even/odd scales -> interleaved (B, H, T)
        k_scale = k_scale.transpose(0, 1, 3, 2).reshape(
            *k_scale.shape[:2], -1)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    if k_scale is not None:
        kf = kf * k_scale[:, :, None, :].astype(jnp.float32)
        vf = vf * v_scale[:, :, :, None].astype(jnp.float32)
    s = jnp.einsum("bhd,bhdt->bht", q.astype(jnp.float32), kf) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bht,bhdt->bhd", p, vf).astype(q.dtype)
