"""Hypothesis fuzz: split invariants over arbitrary label multisets.

stratified_split replaces the reference's unseeded splitter
(reference: whisper_finetune/dataset.py:113-161); its invariants — exact
disjoint cover, determinism, >=1 of every class per split when a class has
>=3 samples, loud degradation below that — must hold for ANY labels, not
just the balanced fixtures in tests/test_pipeline.py.
"""

import warnings

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from audio_transformers_tpu.data.splits import random_split, stratified_split


@st.composite
def label_sets(draw):
    n_classes = draw(st.integers(1, 6))
    counts = [draw(st.integers(1, 12)) for _ in range(n_classes)]
    labels = [c for c, n in enumerate(counts) for _ in range(n)]
    rng = np.random.default_rng(draw(st.integers(0, 2**31 - 1)))
    rng.shuffle(labels)
    return labels


@settings(max_examples=80, deadline=None)
@given(label_sets(), st.integers(0, 2**31 - 1),
       st.sampled_from([0.1, 0.2, 0.34]))
def test_stratified_invariants(labels, seed, frac):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # <3-sample classes warn loudly
        tr, va, te = stratified_split(labels, test_size=frac, val_size=frac,
                                      seed=seed)
        again = stratified_split(labels, test_size=frac, val_size=frac,
                                 seed=seed)
    assert (tr, va, te) == again  # deterministic
    allidx = tr + va + te
    assert sorted(allidx) == list(range(len(labels)))  # exact disjoint cover
    for cls in set(labels):
        n_cls = labels.count(cls)
        in_tr = sum(labels[i] == cls for i in tr)
        in_va = sum(labels[i] == cls for i in va)
        in_te = sum(labels[i] == cls for i in te)
        assert in_tr >= 1  # train always gets one
        if n_cls >= 3:
            assert in_va >= 1 and in_te >= 1
        assert in_tr + in_va + in_te == n_cls


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 200), st.sampled_from([0.0, 0.1, 0.5]),
       st.integers(0, 2**31 - 1))
def test_random_split_invariants(n, frac, seed):
    tr, va = random_split(n, frac, seed=seed)
    assert sorted(tr + va) == list(range(n))
    assert len(va) == int(frac * n)
    assert random_split(n, frac, seed=seed) == (tr, va)
