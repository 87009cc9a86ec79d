"""Hypothesis fuzz: timestamp-segment pooling vs a per-row Python oracle.

The vectorized segment-id derivation (ops/segment_pool.py) replaces the
reference's per-sample Python loop over data-dependent timestamp positions
(reference: whisper_finetune/model.py:20-55, evaluate.py:60-94). The oracle
here walks each row the way the reference does: timestamps come in pairs,
the text between a pair's closing timestamp and the next timestamp belongs
to the next segment, timestamp/EOS/pad/prompt positions are never pooled.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

import jax.numpy as jnp

from audio_transformers_tpu.ops.segment_pool import (masked_sequence_mean,
                                                     segment_ids_from_tokens,
                                                     segment_means)

TS_BEGIN = 16
EOS = 10
VOCAB = 24


def _oracle_segments(row, length, prompt_len):
    """Per-row walk: returns {position: segment_id} for pooled positions."""
    out = {}
    seg = 0
    ts_seen = 0
    for p in range(prompt_len, length):
        t = int(row[p])
        if t >= TS_BEGIN:
            ts_seen += 1
            if ts_seen % 2 == 0:  # a pair just closed
                seg += 1
            continue
        if t == EOS:
            continue
        out[p] = seg
    return out


@st.composite
def rows(draw):
    b = draw(st.integers(1, 3))
    length = draw(st.integers(3, 16))
    prompt_len = draw(st.integers(1, min(3, length - 1)))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    tokens = rng.integers(0, VOCAB, (b, length)).astype(np.int32)
    # timestamp-dense rows so pairs and odd tails actually occur
    dense = rng.random((b, length)) < draw(st.sampled_from([0.2, 0.6]))
    tokens = np.where(dense, rng.integers(TS_BEGIN, VOCAB, (b, length)),
                      tokens)
    lengths = rng.integers(prompt_len, length + 1, (b,)).astype(np.int32)
    return tokens, lengths, prompt_len, seed


@settings(max_examples=80, deadline=None)
@given(rows())
def test_segment_ids_match_oracle(case):
    tokens, lengths, prompt_len, _ = case
    seg_ids, valid = segment_ids_from_tokens(
        jnp.asarray(tokens), jnp.asarray(lengths), prompt_len=prompt_len,
        timestamp_begin=TS_BEGIN, eos_token_id=EOS)
    seg_ids, valid = np.asarray(seg_ids), np.asarray(valid)
    for b in range(tokens.shape[0]):
        want = _oracle_segments(tokens[b], int(lengths[b]), prompt_len)
        got = {p: int(seg_ids[b, p])
               for p in range(tokens.shape[1]) if valid[b, p]}
        assert got == want, (b, tokens[b].tolist(), int(lengths[b]))


@settings(max_examples=40, deadline=None)
@given(rows())
def test_segment_means_match_oracle(case):
    tokens, lengths, prompt_len, seed = case
    rng = np.random.default_rng(seed + 1)
    b, length = tokens.shape
    hid = rng.standard_normal((b, length, 5)).astype(np.float32)
    seg_ids, valid = segment_ids_from_tokens(
        jnp.asarray(tokens), jnp.asarray(lengths), prompt_len=prompt_len,
        timestamp_begin=TS_BEGIN, eos_token_id=EOS)
    S = length // 2 + 1
    means, counts = segment_means(jnp.asarray(hid), seg_ids,
                                  valid, num_segments=S)
    means, counts = np.asarray(means), np.asarray(counts)
    for k in range(b):
        want = _oracle_segments(tokens[k], int(lengths[k]), prompt_len)
        by_seg = {}
        for p, s in want.items():
            by_seg.setdefault(s, []).append(hid[k, p])
        for s in range(S):
            if s in by_seg:
                np.testing.assert_allclose(
                    means[k, s], np.mean(by_seg[s], axis=0),
                    rtol=1e-5, atol=1e-5)
                assert counts[k, s] == len(by_seg[s])
            else:
                assert counts[k, s] == 0


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 2**31 - 1), st.integers(1, 8))
def test_masked_mean_matches_naive(seed, valid_count):
    rng = np.random.default_rng(seed)
    hid = rng.standard_normal((2, 8, 4)).astype(np.float32)
    mask = np.zeros((2, 8), bool)
    idx = rng.choice(8, size=min(valid_count, 8), replace=False)
    mask[0, idx] = True  # row 1 stays all-False -> full-mean fallback
    got = np.asarray(masked_sequence_mean(jnp.asarray(hid),
                                          jnp.asarray(mask)))
    np.testing.assert_allclose(got[0], hid[0][mask[0]].mean(0),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got[1], hid[1].mean(0), rtol=1e-5, atol=1e-6)
