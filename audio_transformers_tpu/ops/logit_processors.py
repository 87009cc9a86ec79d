"""On-device logit processors for autoregressive decoding.

jit-compatible (static shapes, traced positions) equivalents of the HF
processors the reference exercises through `generate`:
  - suppress / begin-suppress token lists
  - no_repeat_ngram_size (reference: evaluate_simple.py:131, evaluate.py:52,
    inference.py:162)
  - repetition_penalty (reference: evaluate_simple.py:132, inference.py:163)
  - Whisper timestamp rules (reference: evaluate.py:41-58 decodes with
    return_timestamps="generate")

All operate on fp32 logits (B, V) given the token buffer (B, L) and the
current generation position `pos` (number of tokens already in the buffer).
Length penalty is beam-search-only in HF semantics — the reference passes
length_penalty=-0.5 to greedy generate where it is a no-op
(evaluate_simple.py:134) — so it lives in beam scoring, not here.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

NEG_INF = float(jnp.finfo(jnp.float32).min)


def suppress_tokens(logits: jax.Array, token_ids: Sequence[int]) -> jax.Array:
    if not len(token_ids):
        return logits
    ids = jnp.asarray(list(token_ids), jnp.int32)
    mask = jnp.zeros((logits.shape[-1],), bool).at[ids].set(True)
    return jnp.where(mask[None, :], NEG_INF, logits)


def suppress_tokens_at(logits: jax.Array, token_ids: Sequence[int],
                       pos: jax.Array, at_pos: int) -> jax.Array:
    """Suppress `token_ids` only when generating position `at_pos`
    (HF begin_suppress_tokens)."""
    if not len(token_ids):
        return logits
    suppressed = suppress_tokens(logits, token_ids)
    return jnp.where(pos == at_pos, suppressed, logits)


def ngram_window_match(tokens: jax.Array, pos: jax.Array, n: int):
    """Shared no-repeat-ngram window-matching core. Every consumer of the
    rule (this module's mask, the decode loop's scatter targets, the
    fused kernel's int8 ban mask) builds on THIS function — their
    token-parity proofs depend on identical window selection, so the
    match logic must exist exactly once.

    Returns (flag, cont, starts) over the (B, L) buffer:
      flag   (B, W) bool — history windows whose (n-1)-gram equals the
             suffix ending at pos-1, lying fully inside tokens[:, :pos],
             and with a full (n-1)-gram of history available (pos >= n)
      cont   (B, W) int  — each window's continuation token id
      starts (W,)   int  — window-start iota (for top-K compaction)
    """
    b, length = tokens.shape
    # last (n-1)-gram ending at pos-1
    last = jax.lax.dynamic_slice(
        tokens, (0, jnp.maximum(pos - (n - 1), 0)), (b, n - 1))  # (B, n-1)
    num_windows = length - n + 1
    match = jnp.ones((b, num_windows), bool)
    for j in range(n - 1):
        match &= tokens[:, j: j + num_windows] == last[:, j: j + 1]
    starts = jnp.arange(num_windows)
    # window fully inside history: start + n - 1 < pos
    valid = (starts[None, :] + (n - 1)) < pos
    flag = match & valid & (pos >= n)
    cont = tokens[:, n - 1: n - 1 + num_windows]  # continuation tokens
    return flag, cont, starts


def ngram_banned_mask(tokens: jax.Array, pos: jax.Array, n: int,
                      vocab: int) -> jax.Array:
    """(B, V) bool: tokens that would complete an n-gram already present in
    tokens[:, :pos]. `tokens` is the fixed-size buffer (B, L)."""
    b = tokens.shape[0]
    flag, cont, _ = ngram_window_match(tokens, pos, n)
    # bool scatter: 4x less HBM traffic than an fp32 (B, V) buffer — the
    # processor chain runs inside the decode loop every step
    return jnp.zeros((b, vocab), bool).at[
        jnp.arange(b)[:, None], cont].max(flag)


def no_repeat_ngram(logits: jax.Array, tokens: jax.Array, pos: jax.Array,
                    n: int) -> jax.Array:
    """Ban tokens that would complete an n-gram already present in
    tokens[:, :pos]."""
    if n <= 0 or tokens.shape[1] < n:
        return logits
    banned = ngram_banned_mask(tokens, pos, n, logits.shape[-1])
    return jnp.where(banned, NEG_INF, logits)


def seen_mask(tokens: jax.Array, pos: jax.Array, vocab: int) -> jax.Array:
    """(B, V) bool: token ids occurring in tokens[:, :pos]."""
    b, length = tokens.shape
    in_history = jnp.arange(length)[None, :] < pos
    return jnp.zeros((b, vocab), bool).at[
        jnp.arange(b)[:, None], tokens].max(in_history)


def repetition_penalty(logits: jax.Array, tokens: jax.Array, pos: jax.Array,
                       penalty: float) -> jax.Array:
    """HF CTRL-style penalty over tokens seen in tokens[:, :pos]."""
    if penalty == 1.0:
        return logits
    seen = seen_mask(tokens, pos, logits.shape[-1])
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, penalized, logits)


def _timestamp_row_scalars(tokens: jax.Array, pos: jax.Array, *,
                           begin_index: int, timestamp_begin: int):
    """The per-row scalars every timestamp rule derives from — O(B*L)
    work, trivial vs the (B, V) passes. Returns
    (mask_ts, mask_text, has_ts, floor, at_begin)."""
    b = tokens.shape[0]
    length = tokens.shape[1]
    last = jax.lax.dynamic_slice(
        tokens, (0, jnp.maximum(pos - 1, 0)), (b, 1))[:, 0]
    penult = jax.lax.dynamic_slice(
        tokens, (0, jnp.maximum(pos - 2, 0)), (b, 1))[:, 0]
    last_was_ts = (pos > begin_index) & (last >= timestamp_begin)
    penult_was_ts = (pos <= begin_index + 1) | (penult >= timestamp_begin)
    mask_ts = last_was_ts & penult_was_ts          # has to be non-timestamp
    mask_text = last_was_ts & ~penult_was_ts       # cannot be normal text

    # monotonicity: mask timestamps strictly below the LAST seen timestamp
    # (in sequence order), exclusive if mid-pair, else inclusive (+1).
    positions = jnp.arange(length)
    hist = (positions[None, :] >= begin_index) & (positions[None, :] < pos)
    is_ts_hist = hist & (tokens >= timestamp_begin)
    last_idx = jnp.max(jnp.where(is_ts_hist, positions[None, :], -1), axis=1)
    has_ts = last_idx >= 0
    last_ts = jnp.take_along_axis(
        tokens, jnp.maximum(last_idx, 0)[:, None], axis=1)[:, 0]
    floor = jnp.where(last_was_ts & ~penult_was_ts, last_ts, last_ts + 1)
    at_begin = pos == begin_index
    return mask_ts, mask_text, has_ts, floor, at_begin


def timestamp_row_bounds(tokens: jax.Array, pos: jax.Array, *,
                         begin_index: int, timestamp_begin: int,
                         eos_token_id: int,
                         max_initial_timestamp_index: Optional[int] = 50):
    """Interval encoding of every pre-probability timestamp rule EXCEPT
    the static <|notimestamps|> ban (position-independent — fold it into
    the additive suppress vector). For vocab id v, the rules mask
    exactly:

        v < text_ban_below
      | (timestamp_begin <= v < ts_ban_below)
      | v > cap_above

    Returns three (B,) int32 vectors:
      text_ban_below  timestamp_begin when only timestamps are allowed
                      (first generated position), eos_token_id after a
                      lone timestamp (no normal text — in the real
                      whisper vocab every text id is below eos), else 0
      ts_ban_below    INT32_MAX after a timestamp pair (no timestamps),
                      the monotonicity floor when the history has one,
                      else timestamp_begin (empty interval)
      cap_above       timestamp_begin + max_initial_timestamp_index at
                      the first generated position, else INT32_MAX

    This is `_timestamp_mask_cond` compressed to three per-row scalars
    so a vocab-blocked kernel can apply the rules from iota compares in
    registers (ops/decode_logits.py); equivalence with the predicate is
    asserted in tests/test_decode.py."""
    imax = jnp.int32(jnp.iinfo(jnp.int32).max)
    mask_ts, mask_text, has_ts, floor, at_begin = _timestamp_row_scalars(
        tokens, pos, begin_index=begin_index,
        timestamp_begin=timestamp_begin)
    text_ban_below = jnp.where(
        at_begin, timestamp_begin,
        jnp.where(mask_text, eos_token_id, 0)).astype(jnp.int32)
    ts_ban_below = jnp.where(
        mask_ts, imax,
        jnp.where(has_ts, floor, timestamp_begin)).astype(jnp.int32)
    # a mid-pair floor can exceed the vocab only via corrupt history;
    # clamp is unnecessary (the interval just saturates)
    if max_initial_timestamp_index is not None:
        # at_begin is a per-step scalar — broadcast to (B,)
        cap = jnp.int32(timestamp_begin + max_initial_timestamp_index)
        cap_above = (jnp.where(at_begin, cap, imax)
                     + jnp.zeros_like(text_ban_below))
    else:
        cap_above = jnp.full_like(text_ban_below, imax)
    return text_ban_below, ts_ban_below, cap_above


def _timestamp_mask_cond(
        tokens: jax.Array, pos: jax.Array, *, vocab: int,
        begin_index: int, timestamp_begin: int, eos_token_id: int,
        no_timestamps_token_id: int,
        max_initial_timestamp_index: Optional[int]) -> jax.Array:
    """(B, V) bool predicate of every timestamp rule EXCEPT the
    probability rule (which needs reductions over the masked logits).
    Built from per-row scalars broadcast against vocab iota — no (B, V)
    memory reads — so consumers fuse it into whatever pass reads the
    logits. Shared by `whisper_timestamp_rules` (full-distribution form,
    for sampling/beam) and `whisper_timestamp_greedy_token` (fused
    argmax form, for the greedy decode loop); their token parity rests
    on this single predicate implementation."""
    vocab_ids = jnp.arange(vocab)
    is_ts_vocab = vocab_ids >= timestamp_begin
    mask_ts, mask_text, has_ts, floor, at_begin = _timestamp_row_scalars(
        tokens, pos, begin_index=begin_index,
        timestamp_begin=timestamp_begin)

    # --- ONE combined pre-probability mask over (B, V) ------------------
    # Every rule before the probability rule masks-to-NEG_INF from
    # row-scalar conditions broadcast against vocab iota, and none reads
    # the logits another rule wrote — so they OR into one predicate.
    # Applying them as the original chain of sequential jnp.where passes
    # (plus the .at[no_timestamps].set copy) costs ~6 full (B, V) f32
    # traversals per decode step (+0.17 ms/step at b128, the largest
    # remaining processor line, VERDICT r3 next #5); this form is one
    # fused read into the reductions plus one masked write.
    cond = (vocab_ids == no_timestamps_token_id)[None, :]   # always
    cond = cond | (mask_ts[:, None] & is_ts_vocab[None, :])  # pair rule
    # (HF masks ids < eos for the "no normal text" branch — in the real
    # whisper vocab every text token id is below eos)
    cond = cond | (mask_text[:, None]
                   & (vocab_ids < eos_token_id)[None, :])
    cond = cond | (has_ts[:, None] & is_ts_vocab[None, :]
                   & (vocab_ids[None, :] < floor[:, None]))  # monotonic
    cond = cond | (at_begin & ~is_ts_vocab[None, :])         # begin: ts only
    if max_initial_timestamp_index is not None:
        cap = timestamp_begin + max_initial_timestamp_index
        cond = cond | (at_begin & (vocab_ids[None, :] > cap))
    return cond


def whisper_timestamp_rules(
        logits: jax.Array, tokens: jax.Array, pos: jax.Array, *,
        begin_index: int, timestamp_begin: int, eos_token_id: int,
        no_timestamps_token_id: int,
        max_initial_timestamp_index: Optional[int] = 50) -> jax.Array:
    """HF WhisperTimeStampLogitsProcessor semantics, vectorized:

      - <|notimestamps|> is always suppressed
      - timestamps come in pairs (except directly before EOS): after a
        single timestamp, text is suppressed; after a pair, timestamps are
      - timestamps are non-decreasing: earlier timestamps are masked
      - at the first generated position only timestamps are allowed,
        capped at max_initial_timestamp_index
      - if total timestamp probability exceeds the max text-token
        probability, text is suppressed

    Full-distribution form (sampling, beam scoring, HF parity tests).
    Greedy decode should use `whisper_timestamp_greedy_token` instead —
    it skips the dependent re-mask pass over (B, V).
    """
    b, vocab = logits.shape
    vocab_ids = jnp.arange(vocab)
    is_ts_vocab = vocab_ids >= timestamp_begin
    cond = _timestamp_mask_cond(
        tokens, pos, vocab=vocab, begin_index=begin_index,
        timestamp_begin=timestamp_begin, eos_token_id=eos_token_id,
        no_timestamps_token_id=no_timestamps_token_id,
        max_initial_timestamp_index=max_initial_timestamp_index)

    # `masked` feeds ONLY the two reductions below — the final output
    # re-applies `cond` to `logits` directly, so XLA fuses the masking
    # into the reduction reads and never materializes a (B, V) f32
    # intermediate. (Consuming `masked` in the final where instead
    # forces a 26.5 MB write + re-read per step at b128.)
    masked = jnp.where(cond, NEG_INF, logits)

    # probability rule: HF compares logsumexp(ts logprobs) against
    # max(text logprobs) AFTER the masks above; log_softmax subtracts the
    # same per-row constant from both sides, so it cancels — compare in
    # raw-logit space over the two contiguous vocab halves instead of
    # materializing a (B, V) logprobs buffer (saves ~3 full (B, V)
    # passes per decode step). Mathematically identical to HF; rounding
    # differs only when the two sides are within one ulp of each other
    # (full-geometry HF parity: tests/test_full_geometry_parity.py).
    tb = min(max(timestamp_begin, 0), vocab)
    if 0 < tb < vocab:
        lse_ts = jax.nn.logsumexp(masked[:, tb:], axis=-1)
        max_text = jnp.max(masked[:, :tb], axis=-1)
        force_ts = lse_ts > max_text
        cond = cond | (force_ts[:, None] & ~is_ts_vocab[None, :])
    return jnp.where(cond, NEG_INF, logits)


def whisper_timestamp_greedy_token(
        logits: jax.Array, tokens: jax.Array, pos: jax.Array, *,
        begin_index: int, timestamp_begin: int, eos_token_id: int,
        no_timestamps_token_id: int,
        max_initial_timestamp_index: Optional[int] = 50) -> jax.Array:
    """argmax(whisper_timestamp_rules(logits, ...)) in ONE fused pass.

    The probability rule makes the straightforward form inherently
    two-pass over (B, V): pass 1 reads the masked logits for the
    lse/max reductions, and only then can pass 2 re-mask and argmax
    (the force-timestamps predicate depends on the reductions). But the
    greedy token needs no re-masked array — forcing timestamps just
    means "argmax over the timestamp half instead of the full row":

        token = force_ts ? tb + argmax(masked[:, tb:]) : argmax(masked)

    All four row-reductions (lse_ts, max_text, and the two argmaxes)
    read the same `masked` values, so in principle one traversal
    suffices. Measured in-pipeline (scripts/ts_rule_ab.py, b128/L=268
    bf16): +0.180 ms/step vs +0.187 for argmax-of-the-rule — XLA does
    NOT multi-output-fuse the sibling reductions, so the win is
    structural only. The form still matters: it is the semantics the
    fused Pallas greedy kernel implements in one real pass
    (ops/decode_logits.py), and this is its XLA twin/oracle.

    Tie-break equivalence with argmax-of-the-rule: when force_ts holds,
    every text entry of the re-masked row is exactly NEG_INF while
    max(masked[ts]) > NEG_INF (if the whole timestamp half were masked,
    lse_ts ~= NEG_INF and force_ts could not hold), so the full-row
    argmax lands on the first timestamp maximum — exactly
    tb + argmax(masked[:, tb:]). When it doesn't hold, the re-masked
    row IS `masked`. jnp.argmax's first-maximum rule therefore picks
    the identical index on both paths (asserted against the
    full-distribution form in tests/test_decode.py, and end-to-end vs
    HF generate in tests/test_full_geometry_parity.py's timestamped
    case, which decodes through this path)."""
    b, vocab = logits.shape
    cond = _timestamp_mask_cond(
        tokens, pos, vocab=vocab, begin_index=begin_index,
        timestamp_begin=timestamp_begin, eos_token_id=eos_token_id,
        no_timestamps_token_id=no_timestamps_token_id,
        max_initial_timestamp_index=max_initial_timestamp_index)
    masked = jnp.where(cond, NEG_INF, logits)
    tb = min(max(timestamp_begin, 0), vocab)
    if not (0 < tb < vocab):
        return jnp.argmax(masked, axis=-1).astype(jnp.int32)
    lse_ts = jax.nn.logsumexp(masked[:, tb:], axis=-1)
    max_text = jnp.max(masked[:, :tb], axis=-1)
    force_ts = lse_ts > max_text
    arg_all = jnp.argmax(masked, axis=-1)
    arg_ts = tb + jnp.argmax(masked[:, tb:], axis=-1)
    return jnp.where(force_ts, arg_ts, arg_all).astype(jnp.int32)
