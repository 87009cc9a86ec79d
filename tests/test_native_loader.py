"""Native audio loader (C++ libaudiodec) tests: wav decode parity with the
stdlib reader, resampler parity with scipy, prefetch pool ordering and
error delivery."""

import os

import numpy as np
import pytest

from audio_transformers_tpu.data import native_loader as nl
from audio_transformers_tpu.utils.audio import read_wav, synth_clip, write_wav

pytestmark = pytest.mark.skipif(
    not nl.available(), reason="libaudiodec not built (make -C native/audiodec)")


def test_decode_wav_matches_python_reader(tmp_path):
    wav = synth_clip(1.0, 22050, seed=3)
    path = str(tmp_path / "a.wav")
    write_wav(path, wav, 22050)
    with open(path, "rb") as f:
        data = f.read()
    got, sr = nl.decode_wav(data)
    want, sr2 = read_wav(path)
    assert sr == sr2 == 22050
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_resample_matches_scipy():
    from scipy.signal import resample_poly

    rng = np.random.default_rng(0)
    for in_rate, out_rate in [(44100, 22050), (48000, 16000),
                              (22050, 16000), (8000, 22050)]:
        x = rng.standard_normal(in_rate // 2).astype(np.float32)  # 0.5 s
        got = nl.resample(x, in_rate, out_rate)
        want = resample_poly(x.astype(np.float64), out_rate, in_rate)
        assert abs(len(got) - len(want)) <= 1, (len(got), len(want))
        n = min(len(got), len(want))
        # identical filter design => near bit-equal at fp32
        np.testing.assert_allclose(got[:n], want[:n], atol=2e-4)


def test_resample_identity():
    x = synth_clip(0.3, 16000)
    np.testing.assert_array_equal(nl.resample(x, 16000, 16000), x)


def test_prefetch_pool_order_and_errors(tmp_path):
    sr, dur = 16000, 0.5
    target_len = int(sr * dur)
    paths = []
    wavs = []
    for i in range(6):
        w = synth_clip(dur, 22050, freq=200.0 * (i + 1), seed=i)
        p = str(tmp_path / f"c{i}.wav")
        write_wav(p, w, 22050)
        paths.append(p)
        wavs.append(w)
    paths.insert(3, str(tmp_path / "missing.wav"))  # error case mid-stream

    results = list(nl.iter_clips(paths, target_rate=sr,
                                 target_len=target_len, num_threads=3))
    assert [r[0] for r in results] == list(range(7))  # submission order
    oks = [r[2] for r in results]
    assert oks[3] is False and sum(oks) == 6
    # decoded clips are resampled 22050 -> 16000, peak-normalized
    for tag, clip, ok in results:
        if not ok:
            continue
        assert clip.shape == (target_len,)
        assert 0.97 <= np.abs(clip).max() <= 1.0001


def test_pool_parity_with_python_path(tmp_path):
    from audio_transformers_tpu.utils.audio import preprocess_clip

    sr_out = 16000
    w = synth_clip(0.7, 44100, seed=9)
    p = str(tmp_path / "x.wav")
    write_wav(p, w, 44100)
    target_len = int(sr_out * 1.0)

    (tag, clip, ok), = list(nl.iter_clips([p], target_rate=sr_out,
                                          target_len=target_len))
    assert ok
    audio, sr = read_wav(p)
    want = preprocess_clip(audio, sr, target_sr=sr_out, duration=1.0)
    np.testing.assert_allclose(clip, want, atol=2e-3)


def test_local_source_native_matches_python(tmp_path):
    import csv

    from audio_transformers_tpu.data.urbansound import UrbanSoundLocalSource

    for i in range(3):
        write_wav(str(tmp_path / f"s{i}.wav"),
                  synth_clip(2.0, 44100, freq=300.0 + i * 100, seed=i), 44100)
    with open(tmp_path / "metadata.csv", "w", newline="") as f:
        w = csv.DictWriter(f, ["slice_file_name", "classID"])
        w.writeheader()
        for i in range(3):
            w.writerow({"slice_file_name": f"s{i}.wav", "classID": i % 2})

    nat = UrbanSoundLocalSource(str(tmp_path), use_native=True)
    py = UrbanSoundLocalSource(str(tmp_path), use_native=False)
    for i in range(3):
        a, b = nat(i), py(i)
        assert a["label"] == b["label"]
        np.testing.assert_allclose(a["waveform"], b["waveform"], atol=2e-3)


def test_truncated_fmt_chunk_is_a_clean_error():
    """A RIFF buffer whose fmt header sits at EOF (body missing) must
    error, not read past the buffer (ASan-confirmed OOB before the
    bounds check landed)."""
    evil = (b"RIFF" + (36).to_bytes(4, "little") + b"WAVE"
            + b"JUNK" + (16).to_bytes(4, "little") + b"\x00" * 16
            + b"fmt " + (16).to_bytes(4, "little"))  # no body
    with pytest.raises(ValueError):
        nl.decode_wav(evil)


def test_pool_survives_directory_and_missing_paths(tmp_path):
    """One bad row delivers rc=-1 with its tag (audiodec.h contract) —
    a directory path used to abort the whole process via an exception
    escaping the worker thread (std::terminate)."""
    good = str(tmp_path / "ok.wav")
    write_wav(good, synth_clip(0.5, 16000, seed=1), 16000)
    with nl.PrefetchPool(num_threads=2, target_rate=16000,
                         target_len=8000) as pool:
        pool.submit(str(tmp_path), tag=0)          # a directory
        pool.submit(str(tmp_path / "nope.wav"), 1)  # missing
        pool.submit(good, tag=2)
        results = {}
        for _ in range(3):
            clip, tag, ok = pool.pop()
            results[tag] = ok
    assert results == {0: False, 1: False, 2: True}


def test_closed_pool_raises_instead_of_segfaulting():
    pool = nl.PrefetchPool(num_threads=1, target_rate=16000,
                           target_len=100)
    pool.close()
    with pytest.raises(ValueError, match="closed"):
        pool.pending()
    with pytest.raises(ValueError, match="closed"):
        pool.submit("/tmp/x.wav")
    with pytest.raises(ValueError, match="closed"):
        pool.pop()
    pool.close()  # idempotent


def test_pool_multi_consumer_pops_are_distinct(tmp_path):
    """Two threads popping concurrently must claim distinct seqs (the
    loser used to wait forever on an already-consumed result)."""
    import threading

    paths = []
    for i in range(8):
        p = str(tmp_path / f"m{i}.wav")
        write_wav(p, synth_clip(0.3, 16000, seed=i), 16000)
        paths.append(p)
    with nl.PrefetchPool(num_threads=2, target_rate=16000,
                         target_len=4800) as pool:
        for i, p in enumerate(paths):
            assert pool.submit(p, tag=i)
        seen = []
        lock = threading.Lock()

        def consume(k):
            for _ in range(k):
                _, tag, ok = pool.pop()
                with lock:
                    seen.append((tag, ok))

        ts = [threading.Thread(target=consume, args=(4,)) for _ in range(2)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=60)
            assert not t.is_alive(), "pop deadlocked"
    assert sorted(t for t, _ in seen) == list(range(8))
    assert all(ok for _, ok in seen)
