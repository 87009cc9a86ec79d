"""Hypothesis fuzz: the native polyphase resampler vs scipy.

The C++ resampler (native/audiodec, Kaiser-windowed polyphase — the
torchaudio-Resample equivalent, reference: urban_sounds/dataset.py:30-44)
is golden-tested at the production rate pairs in test_native_loader.py;
this fuzzes rate pairs drawn from the common audio-rate lattice and odd
input lengths, where gcd reduction, phase stepping, and tail handling can
go wrong, against scipy.signal.resample_poly with the same filter design.
"""

import numpy as np
import pytest
from hypothesis import assume, given, settings
from hypothesis import strategies as st

from audio_transformers_tpu.data import native_loader as nl

pytestmark = pytest.mark.skipif(
    not nl.available(), reason="libaudiodec not built (make -C native/audiodec)")

RATES = [8000, 11025, 16000, 22050, 24000, 32000, 44100, 48000]


@settings(max_examples=30, deadline=None)
@given(st.sampled_from(RATES), st.sampled_from(RATES),
       st.integers(37, 12000), st.integers(0, 2**31 - 1))
def test_resample_matches_scipy(in_rate, out_rate, n, seed):
    from scipy.signal import resample_poly

    assume(in_rate != out_rate)
    x = np.random.default_rng(seed).standard_normal(n).astype(np.float32)
    got = nl.resample(x, in_rate, out_rate)
    want = resample_poly(x.astype(np.float64), out_rate, in_rate)
    assert abs(len(got) - len(want)) <= 1, (len(got), len(want))
    m = min(len(got), len(want))
    assert m > 0
    np.testing.assert_allclose(got[:m], want[:m], atol=3e-4)
