"""Fused vocabulary projection + logit processors + argmax for greedy decode.

The decode loop's per-step tail is HBM-bound bookkeeping on a (B, V)
fp32 buffer that only exists to pick ONE token per row: the tied
projection writes 26.5 MB (batch 128, vocab 51865), then the repetition
penalty, suppress masks and no-repeat-ngram ban each read+write it, and
argmax reads it once more — ~0.17-0.20 ms/step of pure traffic at the
headline geometry (scripts/decode_step_ab.py). None of that buffer is
ever needed off-chip.

This kernel computes the projection tile-by-tile over the vocab on the
MXU ((B, D) x (D, block_v) per grid step), applies the processor chain
in-register (additive suppress vector, seen-mask repetition penalty,
ngram ban mask), and carries a running (max, argmax) in VMEM scratch —
the (B, V) logits never reach HBM. Per-step traffic drops to the
irreducible reads: the bf16 table (~40 MB) plus two int8 masks (~13 MB).

Measured scope (v5e, B=128, V=51865, in the production decode loop):
the kernel wins (a) the penalty-without-ngram chain (1.042 vs 1.073
ms/step — the penalty's (B, V) elementwise passes force the XLA path
to materialize the logits) and (b) every timestamped greedy chain
(eval-serving config, int8 KV + penalty + ngram + timestamps, L=260:
1.485 vs 1.826 — the rules' reduction passes don't fuse in XLA but
ride this kernel's single traversal; tie at B=8, so no batch gate).
Without processors XLA fuses dot+argmax into one consumer and keeps
the bf16 table VMEM-resident across while-loop steps, beating the
kernel's per-call HBM re-stream (0.986 vs 1.024); with ngram banning
but no timestamps the int8 ban-mask build + read outweighs the fused
pass (1.124 vs 1.158). resolve_logits_impl encodes exactly that scope
for "auto". Standalone (outside the loop, where nothing is
VMEM-resident) the full chain is 0.083 vs 0.128 ms/step in the
kernel's favor — scripts/decode_step_ab.py for the methodology,
scripts/ts_fused_kernel_ab.py for the timestamped numbers.

Semantics match the XLA chain in models/whisper/decode._process_logits
followed by argmax, token-for-token: suppress/begin are applied before
the penalty (a suppressed logit saturates to ~finfo.min either way and
can never win the argmax), the penalty divides positive / multiplies
negative seen logits in f32, the ban mask is applied last, and ties
resolve to the lowest index (in-tile first-match via an iota-min, across
tiles via a strict-greater update).

Greedy only: temperature sampling needs the full distribution and stays
on the XLA path. Timestamped decodes ARE supported (`ts_bounds` +
`timestamp_begin`): the pre-probability whisper timestamp rules compress
to three per-row interval bounds (lp.timestamp_row_bounds) applied as
iota compares in registers, and the probability rule's global row
statistics (logsumexp of the timestamp half, max of the text half, and
both region argmaxes) accumulate online across the vocab tiles — the
exact semantics of lp.whisper_timestamp_greedy_token, in the same
single pass that computes the projection.

Reference equivalent: the LogitsProcessor list + argmax inside HF
generate (driven by whisper_finetune/evaluate_simple.py:125-135); there
each processor is a separate CUDA kernel over the full (B, V) buffer.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# the fused/XLA token-parity proof depends on using the SAME sentinel as
# the XLA processor chain — import, don't redefine
from audio_transformers_tpu.ops._tile import round_up as _round_up
from audio_transformers_tpu.ops.logit_processors import NEG_INF

_INT_MAX = jnp.iinfo(jnp.int32).max


def pad_vocab(v: int, block_v: int = 1024) -> int:
    """The padded vocab size the fused step expects its (.., V) operands
    (transposed table, additive vector, seen/ban masks) to carry."""
    return _round_up(v, block_v)


def _kernel(h_ref, t_ref, add_ref, seen_ref, ban_ref, *refs,
            block_v: int, penalty: float,
            use_seen: bool, use_ban: bool, tb: Optional[int]):
    use_ts = tb is not None
    if use_ts:
        (tlo_ref, thi_ref, tcap_ref, out_ref, m_ref, i_ref,
         mts_ref, its_ref, mtx_ref, sts_ref) = refs
    else:
        out_ref, m_ref, i_ref = refs
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        i_ref[:] = jnp.zeros_like(i_ref)
        if use_ts:
            mts_ref[:] = jnp.full_like(mts_ref, -jnp.inf)
            its_ref[:] = jnp.full_like(its_ref, tb)
            mtx_ref[:] = jnp.full_like(mtx_ref, -jnp.inf)
            sts_ref[:] = jnp.zeros_like(sts_ref)

    l = jax.lax.dot_general(
        h_ref[:], t_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (bb, bv) f32
    l = l + add_ref[:]                               # suppress/begin/pad
    if use_seen:
        s = seen_ref[:] != 0
        l = jnp.where(s & (l > 0), l / penalty,
                      jnp.where(s, l * penalty, l))
    if use_ban:
        l = jnp.where(ban_ref[:] != 0, NEG_INF, l)

    lanes = jax.lax.broadcasted_iota(jnp.int32, l.shape, 1)
    if use_ts:
        # pre-probability timestamp rules as three per-row interval
        # compares against the global vocab id (timestamp_row_bounds) —
        # register work, no (B, V) memory
        g = lanes + j * block_v
        l = jnp.where((g < tlo_ref[:, :1])
                      | ((g >= tb) & (g < thi_ref[:, :1]))
                      | (g > tcap_ref[:, :1]), NEG_INF, l)

    tm = jnp.max(l, axis=1, keepdims=True)           # (bb, 1)
    ti = jnp.min(jnp.where(l == tm, lanes, _INT_MAX), axis=1,
                 keepdims=True) + j * block_v        # first max in tile
    upd = tm > m_ref[:, :1]
    m_new = jnp.where(upd, tm, m_ref[:, :1])
    i_new = jnp.where(upd, ti, i_ref[:, :1])
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    i_ref[:] = jnp.broadcast_to(i_new, i_ref.shape)

    if use_ts:
        g = lanes + j * block_v

        # probability-rule statistics. Only tiles overlapping the
        # timestamp region pay the exp (2 of 51 at the real vocab);
        # only tiles overlapping the text region update its max.
        @pl.when((j + 1) * block_v > tb)
        def _():
            is_ts = g >= tb
            l_ts = jnp.where(is_ts, l, -jnp.inf)
            tm_ts = jnp.max(l_ts, axis=1, keepdims=True)  # finite: the
            # tile has ts lanes and masked values saturate at NEG_INF
            ti_ts = jnp.min(
                jnp.where((l_ts == tm_ts) & is_ts, lanes, _INT_MAX),
                axis=1, keepdims=True) + j * block_v
            m_old = mts_ref[:, :1]
            m_run = jnp.maximum(m_old, tm_ts)
            # online logsumexp: rescale the carried sum, add this tile
            # (non-ts lanes contribute exp(-inf)=0; all-masked rows sum
            # exp(0)=1 per lane, matching the XLA twin's logsumexp over
            # NEG_INF values — force_ts is false either way there)
            s_blk = jnp.sum(jnp.exp(l_ts - m_run), axis=1, keepdims=True)
            sts_ref[:] = jnp.broadcast_to(
                sts_ref[:, :1] * jnp.exp(m_old - m_run) + s_blk,
                sts_ref.shape)
            upd_ts = tm_ts > m_old
            its_ref[:] = jnp.broadcast_to(
                jnp.where(upd_ts, ti_ts, its_ref[:, :1]), its_ref.shape)
            mts_ref[:] = jnp.broadcast_to(m_run, mts_ref.shape)

        @pl.when(j * block_v < tb)
        def _():
            l_tx = jnp.where(g < tb, l, -jnp.inf)
            mtx_ref[:] = jnp.broadcast_to(
                jnp.maximum(mtx_ref[:, :1],
                            jnp.max(l_tx, axis=1, keepdims=True)),
                mtx_ref.shape)

    @pl.when(j == nj - 1)
    def _():
        if use_ts:
            # force-timestamps: compare lse(ts half) against max(text
            # half) in raw-logit space (identical to the XLA twin,
            # lp.whisper_timestamp_greedy_token) and pick the region
            # argmax accordingly — s >= 1 (the running-max lane
            # contributes exp(0)), so the log is safe. The tile-wise
            # online sum orders the f32 additions differently from
            # jax.nn.logsumexp, so lse can differ from the twin by a few
            # ulp — the force predicate flips only if lse and max_text
            # tie within that (~1e-7 relative; the same caveat the twin
            # documents vs HF's log-softmax form). The exact-equality
            # parity tests accept this residual risk deliberately: a
            # tie that fine is measure-zero for real logits, and the
            # asserts double as detectors for any REAL semantic break.
            lse = mts_ref[:, :1] + jnp.log(sts_ref[:, :1])
            force = lse > mtx_ref[:, :1]
            tok = jnp.where(force, its_ref[:, :1], i_ref[:, :1])
            out_ref[:] = jnp.broadcast_to(tok, out_ref.shape)
        else:
            out_ref[:] = jnp.broadcast_to(i_ref[:, :1], out_ref.shape)


def fused_greedy_step(hidden: jax.Array, table_t: jax.Array,
                      add_vec: jax.Array, *,
                      seen: Optional[jax.Array] = None,
                      ban: Optional[jax.Array] = None,
                      penalty: float = 1.0,
                      ts_bounds=None,
                      timestamp_begin: Optional[int] = None,
                      block_v: int = 1024,
                      block_b: int = 128,
                      interpret: bool | None = None) -> jax.Array:
    """One greedy next-token step. Returns (B,) int32 argmax indices.

    hidden  (B, D)       compute dtype (bf16 on TPU)
    table_t (D, V_pad)   the TRANSPOSED tied embedding, vocab padded to
                         a block_v multiple (prepare_decode_params)
    add_vec (1, V_pad)   f32 additive mask: 0 everywhere except NEG_INF
                         at suppressed ids and the padded vocab tail
                         (plus NEG_INF at begin-suppress ids on the
                         first generated position — fold the position
                         flag in OUTSIDE, it is a (V,) op; timestamped
                         decodes also fold the static <|notimestamps|>
                         ban here)
    seen    (B, V_pad)   int8 0/1, ids present in the history (only when
                         penalty != 1.0)
    ban     (B, V_pad)   int8 0/1, no-repeat-ngram banned ids this step
    ts_bounds            (text_ban_below, ts_ban_below, cap_above) per-
                         row (B,) int32 from lp.timestamp_row_bounds;
                         with timestamp_begin, enables the whisper
                         timestamp rules INSIDE the kernel: the interval
                         masks are iota compares in registers and the
                         probability rule (logsumexp of the timestamp
                         half vs max text logit, then a region-switched
                         argmax) runs as online statistics across the
                         vocab tiles — semantics identical to
                         lp.whisper_timestamp_greedy_token, which the
                         XLA decode path uses and the tests oracle
                         against.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, d = hidden.shape
    v_pad = table_t.shape[1]
    if v_pad % block_v:
        raise ValueError(f"V_pad={v_pad} not a multiple of block_v={block_v}")
    use_seen = seen is not None
    use_ban = ban is not None
    use_ts = ts_bounds is not None
    if use_ts and timestamp_begin is None:
        raise ValueError("ts_bounds requires timestamp_begin")
    if timestamp_begin is not None and not use_ts:
        raise ValueError("timestamp_begin requires ts_bounds")
    if use_seen and penalty == 1.0:
        raise ValueError("seen mask given but penalty is 1.0")
    if penalty != 1.0 and not use_seen:
        # the inverse misuse must be loud too: silently skipping the
        # penalty would return tokens that diverge from the XLA chain
        # this kernel claims parity with
        raise ValueError("penalty != 1.0 requires the seen mask")
    if use_ts and not 0 < timestamp_begin < v_pad:
        raise ValueError(f"timestamp_begin {timestamp_begin} outside the "
                         f"padded vocab {v_pad}")
    block_b = min(block_b, _round_up(b, 8))
    b_pad = _round_up(b, block_b)

    def pad_b(x):
        return x if x.shape[0] == b_pad else jnp.pad(
            x, ((0, b_pad - b),) + ((0, 0),) * (x.ndim - 1))

    hf = pad_b(hidden)
    seen_f = pad_b(seen) if use_seen else jnp.zeros((b_pad, 128), jnp.int8)
    ban_f = pad_b(ban) if use_ban else jnp.zeros((b_pad, 128), jnp.int8)

    mask_spec = lambda on: pl.BlockSpec(
        (block_b, block_v if on else 128),
        (lambda i, j: (i, j)) if on else (lambda i, j: (i, 0)),
        memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((block_b, d), lambda i, j: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((d, block_v), lambda i, j: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_v), lambda i, j: (0, j),
                     memory_space=pltpu.VMEM),
        mask_spec(use_seen),
        mask_spec(use_ban),
    ]
    operands = [hf, table_t, add_vec.astype(jnp.float32), seen_f, ban_f]
    scratch = [
        pltpu.VMEM((block_b, 128), jnp.float32),
        pltpu.VMEM((block_b, 128), jnp.int32),
    ]
    if use_ts:
        row_spec = pl.BlockSpec((block_b, 128), lambda i, j: (i, 0),
                                memory_space=pltpu.VMEM)
        for bound in ts_bounds:
            operands.append(jnp.broadcast_to(
                pad_b(bound.astype(jnp.int32)[:, None]), (b_pad, 128)))
            in_specs.append(row_spec)
        scratch += [
            pltpu.VMEM((block_b, 128), jnp.float32),   # m_ts
            pltpu.VMEM((block_b, 128), jnp.int32),     # i_ts
            pltpu.VMEM((block_b, 128), jnp.float32),   # m_text
            pltpu.VMEM((block_b, 128), jnp.float32),   # s_ts
        ]

    kernel = functools.partial(
        _kernel, block_v=block_v, penalty=penalty,
        use_seen=use_seen, use_ban=use_ban,
        tb=int(timestamp_begin) if use_ts else None)
    out = pl.pallas_call(
        kernel,
        grid=(b_pad // block_b, v_pad // block_v),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_b, 128), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, 128), jnp.int32),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * d * v_pad,
            bytes_accessed=(table_t.size * table_t.dtype.itemsize
                            + (seen_f.size if use_seen else 0)
                            + (ban_f.size if use_ban else 0)),
            transcendentals=(b_pad * 2 * block_v) if use_ts else 0,
        ),
        interpret=interpret,
    )(*operands)
    return out[:b, 0]


def fused_greedy_step_reference(hidden, table_t, add_vec, *, seen=None,
                                ban=None, penalty=1.0, ts_bounds=None,
                                timestamp_begin=None) -> jax.Array:
    """XLA oracle with identical semantics (same padded operands)."""
    l = jnp.einsum("bd,dv->bv", hidden, table_t,
                   preferred_element_type=jnp.float32)
    l = l + add_vec.astype(jnp.float32)
    if seen is not None:
        s = seen != 0
        l = jnp.where(s & (l > 0), l / penalty,
                      jnp.where(s, l * penalty, l))
    if ban is not None:
        l = jnp.where(ban != 0, NEG_INF, l)
    if ts_bounds is None:
        return jnp.argmax(l, axis=-1).astype(jnp.int32)
    tlo, thi, tcap = (x.astype(jnp.int32)[:, None] for x in ts_bounds)
    g = jnp.arange(l.shape[1])[None, :]
    tb = int(timestamp_begin)
    l = jnp.where((g < tlo) | ((g >= tb) & (g < thi)) | (g > tcap),
                  NEG_INF, l)
    lse_ts = jax.nn.logsumexp(l[:, tb:], axis=-1)
    max_text = jnp.max(l[:, :tb], axis=-1)
    force = lse_ts > max_text
    arg_all = jnp.argmax(l, axis=-1)
    arg_ts = tb + jnp.argmax(l[:, tb:], axis=-1)
    return jnp.where(force, arg_ts, arg_all).astype(jnp.int32)
