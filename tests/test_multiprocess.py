"""Multi-process (multi-host) data slicing tests (VERDICT r2 missing #4).

Real multi-process JAX needs N processes; the slicing logic itself only
consumes `jax.process_count()` / `jax.process_index()`, so faking those
covers every pid in-process: disjoint exact cover, remainder handling,
and valid-count bookkeeping on wrap-padded eval batches.
"""

import numpy as np
import pytest

import jax

from audio_transformers_tpu.data.loader import Batcher
from audio_transformers_tpu.parallel.distributed import (
    global_batch_to_local, process_shard)


def _fake_procs(monkeypatch, n_proc: int, pid: int):
    monkeypatch.setattr(jax, "process_count", lambda: n_proc)
    monkeypatch.setattr(jax, "process_index", lambda: pid)


@pytest.mark.parametrize("n_proc", [2, 4, 8])
@pytest.mark.parametrize("num_samples", [64, 61])  # with + without remainder
def test_process_shard_disjoint_exact_cover(monkeypatch, n_proc,
                                            num_samples):
    shards = []
    for pid in range(n_proc):
        _fake_procs(monkeypatch, n_proc, pid)
        shards.append(list(process_shard(num_samples)))
    flat = [i for s in shards for i in s]
    assert flat == list(range(num_samples))  # contiguous, ordered, complete
    assert len(set(flat)) == num_samples     # disjoint
    # the remainder lands on the last process
    sizes = [len(s) for s in shards]
    assert all(sz == sizes[0] for sz in sizes[:-1])
    assert sizes[-1] >= sizes[0]


@pytest.mark.parametrize("n_proc", [2, 4, 8])
def test_local_slice_covers_batch_and_valid(monkeypatch, n_proc):
    b = Batcher(lambda i: {"x": np.asarray([i], np.float32)},
                num_samples=32, batch_size=16, process_sharded=True)
    idxs = list(range(100, 116))
    for valid in (16, 13, 5, 1):  # incl. wrap-padded eval batches
        got_idxs, got_valid = [], 0
        for pid in range(n_proc):
            _fake_procs(monkeypatch, n_proc, pid)
            li, lv = b._local_slice(idxs, valid)
            assert len(li) == 16 // n_proc
            # local valid rows are a prefix of the local slice
            assert 0 <= lv <= len(li)
            got_idxs.extend(li)
            got_valid += lv
        assert got_idxs == idxs      # exact cover, in order
        assert got_valid == valid    # no valid row lost or double-counted


@pytest.mark.parametrize("n_proc", [2, 4])
def test_eval_batches_reassemble_across_processes(monkeypatch, n_proc):
    """Concatenating each process's sharded eval stream reconstructs the
    single-process stream row-for-row, including the padded tail."""

    def source(i):
        return {"x": np.full((3,), i, np.float32)}

    kw = dict(num_samples=21, batch_size=8)
    _fake_procs(monkeypatch, 1, 0)
    want = list(Batcher(source, **kw).eval_batches())

    per_pid = []
    for pid in range(n_proc):
        _fake_procs(monkeypatch, n_proc, pid)
        per_pid.append(list(
            Batcher(source, process_sharded=True, **kw).eval_batches()))

    assert all(len(p) == len(want) for p in per_pid)
    for bi, wb in enumerate(want):
        x = np.concatenate([per_pid[pid][bi]["x"] for pid in range(n_proc)])
        v = np.concatenate([per_pid[pid][bi]["valid"]
                            for pid in range(n_proc)])
        np.testing.assert_array_equal(x, wb["x"])
        assert int(v.sum()) == int(wb["valid"].sum())


def test_local_slice_rejects_indivisible(monkeypatch):
    b = Batcher(lambda i: {"x": np.zeros(1, np.float32)},
                num_samples=10, batch_size=10, process_sharded=True)
    _fake_procs(monkeypatch, 4, 0)
    with pytest.raises(ValueError, match="not divisible"):
        b._local_slice(list(range(10)), 10)


def test_global_batch_to_local(monkeypatch):
    _fake_procs(monkeypatch, 4, 2)
    assert global_batch_to_local(32) == 8
    with pytest.raises(ValueError, match="not divisible"):
        global_batch_to_local(30)
