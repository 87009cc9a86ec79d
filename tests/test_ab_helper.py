"""Unit tests for scripts/_ab.py — the shared A/B timing helper every
benchmark script's min-per-chain-length methodology rides on."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                "..", "scripts"))

import pytest  # noqa: E402

from _ab import roundrobin_min  # noqa: E402


def test_min_over_rounds_interleaved():
    seen = []
    times = {"a": iter([0.0, 0.0]), "b": iter([0.0, 0.0])}

    def make(key):
        def call():
            seen.append(key)
            next(times[key])
        return call

    best = roundrobin_min({k: make(k) for k in ("a", "b")}, rounds=2)
    # interleaved: every key once per round, not key-major
    assert seen == ["a", "b", "a", "b"]
    assert set(best) == {"a", "b"}
    assert all(v >= 0.0 and v < 60.0 for v in best.values())


def test_zero_rounds_is_an_error_not_nan():
    # rounds=0 used to leave every entry inf; the caller's difference then
    # printed NaN — refuse instead
    with pytest.raises(ValueError, match="rounds"):
        roundrobin_min({"a": lambda: None}, rounds=0)


def test_on_round_callback_fires_per_round():
    rounds_seen = []
    roundrobin_min({"a": lambda: None}, rounds=3,
                   on_round=rounds_seen.append)
    assert rounds_seen == [0, 1, 2]
