"""Masked sequence pooling and timestamp-driven segment pooling, on device.

The reference's segment pooling is a per-sample Python loop over
data-dependent timestamp positions (reference: whisper_finetune/model.py:20-55,
with a crash bug in the no-segment fallback at model.py:51). The TPU
formulation (SURVEY.md §5 long-context): derive a segment id per token from
the timestamp structure, then do one masked segment-mean — static shapes,
no host sync, vmappable over the batch.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def masked_sequence_mean(hiddens: jax.Array, mask: jax.Array) -> jax.Array:
    """hiddens (B, L, D), mask (B, L) bool -> (B, D) mean over valid
    positions (all-False rows fall back to a full mean, mirroring the
    reference's global-pool fallback at model.py:49-51)."""
    m = mask.astype(jnp.float32)
    denom = jnp.sum(m, axis=1, keepdims=True)
    safe = jnp.where(denom > 0, denom, hiddens.shape[1])
    summed = jnp.einsum("bld,bl->bd", hiddens.astype(jnp.float32), m)
    fallback = jnp.mean(hiddens.astype(jnp.float32), axis=1)
    out = jnp.where(denom > 0, summed / safe, fallback)
    return out


def segment_ids_from_tokens(tokens: jax.Array, lengths: jax.Array, *,
                            prompt_len: int, timestamp_begin: int,
                            eos_token_id: int) -> Tuple[jax.Array, jax.Array]:
    """Derive per-token segment ids from whisper timestamp structure.

    tokens (B, L): decoded ids. Timestamps appear in pairs
    <start> text... <end>; the text between the 2nd timestamp of a pair and
    the next timestamp belongs to the next segment.

    Returns (seg_ids (B, L) int32, valid (B, L) bool) where valid marks
    text tokens (non-timestamp, non-EOS/pad, after the prompt, within
    `lengths`). seg_ids are 0-based; invalid positions keep their id but
    must be masked with `valid`.
    """
    b, length = tokens.shape
    positions = jnp.arange(length)[None, :]
    in_range = (positions >= prompt_len) & (positions < lengths[:, None])
    is_ts = (tokens >= timestamp_begin) & in_range
    # ordinal of each timestamp within the row (1-based)
    ts_ordinal = jnp.cumsum(is_ts.astype(jnp.int32), axis=1)
    is_end_ts = is_ts & (ts_ordinal % 2 == 0)
    # tokens after an end-timestamp belong to the next segment
    seg_ids = jnp.cumsum(is_end_ts.astype(jnp.int32), axis=1) \
        - is_end_ts.astype(jnp.int32)
    valid = in_range & ~is_ts & (tokens != eos_token_id)
    return seg_ids.astype(jnp.int32), valid


def segment_means(hiddens: jax.Array, seg_ids: jax.Array, valid: jax.Array,
                  num_segments: int) -> Tuple[jax.Array, jax.Array]:
    """hiddens (B, L, D) -> (means (B, S, D), counts (B, S)) via one-hot
    matmul (MXU-friendly; S is small)."""
    onehot = jax.nn.one_hot(seg_ids, num_segments, dtype=jnp.float32)
    onehot = onehot * valid.astype(jnp.float32)[:, :, None]  # (B, L, S)
    counts = jnp.sum(onehot, axis=1)  # (B, S)
    sums = jnp.einsum("bls,bld->bsd", onehot, hiddens.astype(jnp.float32))
    means = sums / jnp.maximum(counts, 1.0)[:, :, None]
    return means, counts
