"""REAL multi-process execution of parallel/distributed.py (VERDICT r3
next #6): two OS processes, `jax.distributed.initialize` over a local
coordinator (CPU backend + gloo collectives), 2 local devices each -> a
4-device global DP mesh, one classifier train step fed through the
Batcher's process_sharded slicing and shard_batch's
make_array_from_process_local_data path. The updated params must equal a
single-process run of the same step — the multi-host story executed, not
monkeypatch-typed.

The reference has nothing here (no distributed backend at all,
SURVEY.md §5); this guards our own multi-host claim.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run(nproc: int, out: str, timeout: float = 900.0):
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(pid), str(nproc), str(port), out],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for pid in range(nproc)]
    outs = [p.communicate(timeout=timeout)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{o[-3000:]}"
    return outs


@pytest.mark.slow
def test_two_process_dp_step_matches_single_process(tmp_path):
    single = str(tmp_path / "single.npz")
    multi = str(tmp_path / "multi.npz")
    _run(1, single)
    _run(2, multi)
    a, b = np.load(single), np.load(multi)
    assert set(a.files) == set(b.files) and len(a.files) > 1
    np.testing.assert_allclose(a["loss"], b["loss"], rtol=1e-5, atol=1e-6)
    for k in a.files:
        np.testing.assert_allclose(a[k], b[k], rtol=1e-4, atol=1e-6,
                                   err_msg=k)
