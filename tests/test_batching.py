"""Unit tests for the serving micro-batcher (serve/batching.py): requests
arriving within a batch window ride one run_windows call; rows scatter
back in order; keys (decode configs) never mix; errors propagate."""

import threading
import time

import numpy as np

from audio_transformers_tpu.serve.batching import MicroBatcher


def _fake_run(calls, gate=None):
    def run(windows, *, max_new_tokens):
        if gate is not None:
            gate.wait(timeout=10)
        calls.append((windows.shape[0], max_new_tokens))
        texts = [f"t{max_new_tokens}:{float(windows[i, 0]):.0f}"
                 for i in range(windows.shape[0])]
        probs = windows[:, :2] * 1.0
        return texts, probs
    return run


def _windows(*row_ids):
    w = np.zeros((len(row_ids), 4), np.float32)
    for i, r in enumerate(row_ids):
        w[i, 0] = r
    return w


def test_concurrent_submits_coalesce_into_one_batch():
    calls = []
    b = MicroBatcher(_fake_run(calls), max_wait_ms=1000.0)
    try:
        # the worker picks up f1 and holds its batch window open for up
        # to 1 s — f2 lands in the same batch deterministically
        f1 = b.submit(_windows(1, 2), max_new_tokens=64)
        f2 = b.submit(_windows(3), max_new_tokens=64)
        t1, p1 = f1.result(timeout=10)
        t2, p2 = f2.result(timeout=10)
    finally:
        b.close()
    assert calls == [(3, 64)]           # ONE fused device call
    assert t1 == ["t64:1", "t64:2"] and t2 == ["t64:3"]
    assert p1.shape == (2, 2) and float(p2[0, 0]) == 3.0
    assert b.stats["batches"] == 1 and b.stats["requests"] == 2


def test_mixed_keys_never_share_a_device_call():
    calls = []
    b = MicroBatcher(_fake_run(calls), max_wait_ms=500.0)
    try:
        f1 = b.submit(_windows(1), max_new_tokens=64)
        f2 = b.submit(_windows(2), max_new_tokens=128)
        assert f1.result(timeout=10)[0] == ["t64:1"]
        assert f2.result(timeout=10)[0] == ["t128:2"]
    finally:
        b.close()
    assert sorted(calls) == [(1, 64), (1, 128)]


def test_max_rows_closes_the_window():
    calls = []
    gate = threading.Event()
    b = MicroBatcher(_fake_run(calls, gate), max_rows=2,
                     max_wait_ms=5000.0)
    try:
        futs = [b.submit(_windows(i), max_new_tokens=64) for i in range(3)]
        gate.set()
        for f in futs:
            f.result(timeout=10)
    finally:
        b.close()
    # 3 single-row requests with max_rows=2: first batch closes at 2 rows
    # without waiting out the 5 s window, the third runs alone
    assert calls == [(2, 64), (1, 64)]


def test_run_errors_propagate_to_every_waiter():
    def boom(windows, *, max_new_tokens):
        raise RuntimeError("device fell over")

    b = MicroBatcher(boom, max_wait_ms=200.0)
    try:
        f1 = b.submit(_windows(1), max_new_tokens=64)
        f2 = b.submit(_windows(2), max_new_tokens=64)
        for f in (f1, f2):
            try:
                f.result(timeout=10)
                raise AssertionError("expected the run error")
            except RuntimeError as e:
                assert "device fell over" in str(e)
    finally:
        b.close()


def test_malformed_submit_fails_fast_and_worker_survives():
    calls = []
    b = MicroBatcher(_fake_run(calls), max_wait_ms=50.0)
    try:
        # wrong ndim is rejected in the CALLER's thread — it must never
        # reach the worker, where concatenating it with other requests'
        # (n, W) windows would kill the loop and hang every future request
        try:
            b.submit(np.zeros(4, np.float32), max_new_tokens=64)
            raise AssertionError("expected ValueError")
        except ValueError as e:
            assert "(n, W)" in str(e)
        # the batcher still serves valid requests afterwards
        t, _ = b.submit(_windows(5), max_new_tokens=64).result(timeout=10)
        assert t == ["t64:5"]
    finally:
        b.close()


def test_short_run_result_is_an_error_not_truncation():
    def short_run(windows, *, max_new_tokens):
        # drops the last row — the scatter must refuse to hand a waiter
        # truncated results
        return ([f"r{i}" for i in range(windows.shape[0] - 1)],
                windows[:-1, :2])

    b = MicroBatcher(short_run, max_wait_ms=200.0)
    try:
        f1 = b.submit(_windows(1), max_new_tokens=64)
        f2 = b.submit(_windows(2), max_new_tokens=64)
        for f in (f1, f2):
            try:
                f.result(timeout=10)
                raise AssertionError("expected the length-mismatch error")
            except RuntimeError as e:
                assert "submitted rows" in str(e)
        # and the worker survives: the next submit is SERVED (it hits
        # short_run's error again promptly, rather than timing out on a
        # dead worker thread)
        f3 = b.submit(_windows(9), max_new_tokens=64)
        try:
            f3.result(timeout=10)
            raise AssertionError("expected the length-mismatch error")
        except RuntimeError:
            pass
    finally:
        b.close()


def test_lone_request_latency_bounded_by_window():
    calls = []
    b = MicroBatcher(_fake_run(calls), max_wait_ms=50.0)
    try:
        t0 = time.monotonic()
        b.submit(_windows(7), max_new_tokens=64).result(timeout=10)
        elapsed = time.monotonic() - t0
    finally:
        b.close()
    assert elapsed < 5.0  # window (50 ms) + scheduling, not unbounded
