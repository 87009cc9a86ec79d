"""Hypothesis fuzz: on-device logit processors vs HF's processor classes.

The existing parity tests drive the processors through full decodes
(tests/test_decode.py, tests/test_full_geometry_parity.py), which only
reaches histories a decode actually produces. These tests fuzz the
processor FUNCTIONS directly against HF's torch implementations on
arbitrary (valid-shaped) histories — including buffer garbage past `pos`,
which ours must ignore because the decode loop operates on a fixed-size
token buffer (the HF oracle is sliced to input_ids = tokens[:, :pos]).

Oracles (the classes the reference's generate chain instantiates —
reference: whisper_finetune/evaluate_simple.py:125-135, evaluate.py:41-58):
  RepetitionPenaltyLogitsProcessor, NoRepeatNGramLogitsProcessor,
  WhisperTimeStampLogitsProcessor.

Masked entries compare as masks (ours writes finfo.min, HF -inf);
unmasked entries compare numerically.
"""

import numpy as np
import pytest
import torch
from hypothesis import assume, given, settings
from hypothesis import strategies as st

import jax.numpy as jnp

from audio_transformers_tpu.models.whisper import decode as wdecode
from audio_transformers_tpu.ops import logit_processors as lp

VOCAB = 24
MASK_CUT = lp.NEG_INF / 2  # anything below this counts as "masked"


def _masks_and_values(ours: np.ndarray, hf: np.ndarray):
    ours_masked = ours <= MASK_CUT
    hf_masked = np.isneginf(hf) | (hf <= MASK_CUT)
    np.testing.assert_array_equal(ours_masked, hf_masked)
    np.testing.assert_allclose(np.where(ours_masked, 0.0, ours),
                               np.where(hf_masked, 0.0, hf),
                               rtol=1e-5, atol=1e-6)


@st.composite
def history(draw, min_pos=1, vocab=VOCAB, max_b=3, max_len=14):
    b = draw(st.integers(1, max_b))
    length = draw(st.integers(max(min_pos, 2), max_len))
    pos = draw(st.integers(min_pos, length))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    # low-entropy histories so repeated n-grams actually occur
    tokens = rng.integers(0, vocab, (b, length)).astype(np.int32)
    if draw(st.booleans()):
        tokens = tokens % draw(st.integers(2, 6))
    logits = rng.standard_normal((b, vocab)).astype(np.float32) * 3.0
    return tokens, pos, logits


@settings(max_examples=60, deadline=None)
@given(history(), st.sampled_from([1.15, 0.7, 2.0]))
def test_repetition_penalty_matches_hf(h, penalty):
    from transformers.generation.logits_process import (
        RepetitionPenaltyLogitsProcessor)

    tokens, pos, logits = h
    ours = np.asarray(lp.repetition_penalty(
        jnp.asarray(logits), jnp.asarray(tokens), jnp.int32(pos), penalty))
    hf = RepetitionPenaltyLogitsProcessor(penalty)(
        torch.from_numpy(tokens[:, :pos].astype(np.int64)),
        torch.from_numpy(logits.copy())).numpy()
    _masks_and_values(ours, hf)


@settings(max_examples=60, deadline=None)
@given(history(), st.integers(2, 4))
def test_no_repeat_ngram_matches_hf(h, n):
    from transformers.generation.logits_process import (
        NoRepeatNGramLogitsProcessor)

    tokens, pos, logits = h
    assume(tokens.shape[1] >= n)
    ours = np.asarray(lp.no_repeat_ngram(
        jnp.asarray(logits), jnp.asarray(tokens), jnp.int32(pos), n))
    hf = NoRepeatNGramLogitsProcessor(n)(
        torch.from_numpy(tokens[:, :pos].astype(np.int64)),
        torch.from_numpy(logits.copy())).numpy()
    _masks_and_values(ours, hf)


@settings(max_examples=60, deadline=None)
@given(history(), st.integers(2, 4), st.booleans())
def test_ngram_compaction_equals_dense_mask(h, n, force_compact):
    """The top-K compacted scatter targets (_ngram_ban_targets long-buffer
    branch, overflow cond-fallback included) must ban exactly the same
    token set as the dense ngram_banned_mask, for ANY history — this is
    the equivalence the long-L decode path's parity rests on."""
    tokens, pos, logits = h
    assume(tokens.shape[1] >= n)
    tok_j = jnp.asarray(tokens)
    want = np.asarray(lp.ngram_banned_mask(tok_j, jnp.int32(pos), n, VOCAB))

    old = wdecode.NGRAM_SCATTER_MAX_LEN
    try:
        wdecode.NGRAM_SCATTER_MAX_LEN = 0 if force_compact else 128
        idx, overflow, (flag, cont) = wdecode._ngram_ban_targets(
            tok_j, jnp.int32(pos), n, VOCAB)
    finally:
        wdecode.NGRAM_SCATTER_MAX_LEN = old
    b = tokens.shape[0]
    if overflow is None or not bool(overflow):
        got = np.zeros((b, VOCAB + 1), bool)  # +1: the OOB drop slot
        np.put_along_axis(got, np.asarray(idx), True, axis=1)
        got = got[:, :VOCAB]
    else:
        got = np.asarray(jnp.zeros((b, VOCAB), bool).at[
            jnp.arange(b)[:, None], cont].max(flag))
    np.testing.assert_array_equal(got, want)


@st.composite
def ts_case(draw):
    ts_begin = 16
    b = draw(st.integers(1, 3))
    begin_index = draw(st.integers(1, 4))
    length = draw(st.integers(begin_index + 1, 14))
    pos = draw(st.integers(begin_index, length))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    # mix text and timestamp tokens so the pair/monotonic rules trigger
    tokens = rng.integers(0, VOCAB, (b, length)).astype(np.int32)
    ts_rows = rng.random((b, length)) < 0.5
    tokens = np.where(ts_rows,
                      rng.integers(ts_begin, VOCAB, (b, length)), tokens)
    logits = (rng.standard_normal((b, VOCAB)) * 3.0).astype(np.float32)
    return tokens.astype(np.int32), pos, begin_index, logits


@settings(max_examples=80, deadline=None)
@given(ts_case(), st.sampled_from([None, 3, 50]))
def test_timestamp_rules_match_hf(case, max_initial):
    from transformers import GenerationConfig
    from transformers.generation.logits_process import (
        WhisperTimeStampLogitsProcessor)

    ts_begin, no_ts, eos = 16, 15, 10
    tokens, pos, begin_index, logits = case

    # our probability rule compares raw logits where HF compares
    # log-softmax values — identical math, so only exact near-ties can
    # round differently; skip those draws
    masked = logits.copy()
    lse_ts = np.log(np.exp(
        masked[:, ts_begin:] - masked.max(1, keepdims=True)).sum(1))
    max_text = (masked[:, :ts_begin] - masked.max(1, keepdims=True)).max(1)
    assume(np.all(np.abs(lse_ts - max_text) > 1e-3))

    ours = np.asarray(lp.whisper_timestamp_rules(
        jnp.asarray(logits), jnp.asarray(tokens), jnp.int32(pos),
        begin_index=begin_index, timestamp_begin=ts_begin,
        eos_token_id=eos, no_timestamps_token_id=no_ts,
        max_initial_timestamp_index=max_initial))

    gc = GenerationConfig(no_timestamps_token_id=no_ts, eos_token_id=eos,
                          max_initial_timestamp_index=max_initial)
    proc = WhisperTimeStampLogitsProcessor(gc, begin_index=begin_index)
    hf = proc(torch.from_numpy(tokens[:, :pos].astype(np.int64)),
              torch.from_numpy(logits.copy())).numpy()
    _masks_and_values(ours, hf)

    # the decode loop's fused reductions+argmax form must pick HF's
    # greedy token (ties: both argmaxes take the first maximum, and the
    # fused form's selected index equals it — see
    # lp.whisper_timestamp_greedy_token's docstring)
    got_tok = np.asarray(lp.whisper_timestamp_greedy_token(
        jnp.asarray(logits), jnp.asarray(tokens), jnp.int32(pos),
        begin_index=begin_index, timestamp_begin=ts_begin,
        eos_token_id=eos, no_timestamps_token_id=no_ts,
        max_initial_timestamp_index=max_initial))
    np.testing.assert_array_equal(got_tok, hf.argmax(-1).astype(np.int32))


@settings(max_examples=40, deadline=None)
@given(history())
def test_seen_mask_matches_naive(h):
    tokens, pos, _ = h
    got = np.asarray(lp.seen_mask(jnp.asarray(tokens), jnp.int32(pos), VOCAB))
    want = np.zeros_like(got)
    for b in range(tokens.shape[0]):
        for t in tokens[b, :pos]:
            want[b, t] = True
    np.testing.assert_array_equal(got, want)
