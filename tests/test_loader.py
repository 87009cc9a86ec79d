"""Batcher prefetch/sharding tests: order preservation, true overlap,
per-process slicing, and the native C++ prefetch path."""

import time

import numpy as np
import pytest

from audio_transformers_tpu.data.loader import Batcher


def _source(i: int):
    return {"waveform": np.full(8, float(i), np.float32),
            "label": np.int32(i)}


def _collect(batcher, *, epoch=None):
    it = (batcher.train_epochs(epoch=epoch) if epoch is not None
          else batcher.eval_batches())
    return list(it)


class TestPrefetchOrder:
    @pytest.mark.parametrize("epoch", [0, 3])
    def test_train_order_matches_sync(self, epoch):
        sync = Batcher(_source, 37, 8, seed=7)
        pre = Batcher(_source, 37, 8, seed=7, num_workers=4)
        for a, b in zip(_collect(sync, epoch=epoch),
                        _collect(pre, epoch=epoch)):
            for k in a:
                np.testing.assert_array_equal(a[k], b[k])

    def test_eval_order_and_valid_mask(self):
        sync = Batcher(_source, 19, 8, seed=7)
        pre = Batcher(_source, 19, 8, seed=7, num_workers=3)
        got_a, got_b = _collect(sync), _collect(pre)
        assert len(got_a) == len(got_b) == 3
        for a, b in zip(got_a, got_b):
            for k in a:
                np.testing.assert_array_equal(a[k], b[k])
        assert got_b[-1]["valid"].sum() == 3  # 19 = 2*8 + 3


class TestPrefetchOverlap:
    def test_slow_source_overlaps(self):
        delay = 0.02
        n = 32

        def slow(i):
            time.sleep(delay)
            return _source(i)

        serial = n * delay
        b = Batcher(slow, n, 8, num_workers=8)
        t0 = time.perf_counter()
        batches = _collect(b, epoch=0)
        wall = time.perf_counter() - t0
        assert len(batches) == 4
        # 8 workers on a sleepy source: must be well under serial time
        assert wall < serial * 0.6, (wall, serial)


class TestProcessSharding:
    def test_slices_disjoint_and_cover(self, monkeypatch):
        import jax

        batches_by_pid = {}
        for pid in range(4):
            monkeypatch.setattr(jax, "process_count", lambda: 4)
            monkeypatch.setattr(jax, "process_index", lambda p=pid: p)
            b = Batcher(_source, 32, 16, seed=1, process_sharded=True)
            batches_by_pid[pid] = _collect(b, epoch=0)
        # per-process batch is global/4; same global order reassembles
        full = Batcher(_source, 32, 16, seed=1)
        for bi, ref in enumerate(_collect(full, epoch=0)):
            got = np.concatenate([batches_by_pid[p][bi]["label"]
                                  for p in range(4)])
            np.testing.assert_array_equal(got, ref["label"])

    def test_eval_valid_mask_per_process(self, monkeypatch):
        import jax

        # 10 samples, batch 8 -> second batch has valid=2 globally;
        # with 2 processes the wrap rows all live in process 1's slice
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        monkeypatch.setattr(jax, "process_index", lambda: 1)
        b = Batcher(_source, 10, 8, process_sharded=True)
        got = _collect(b)
        assert got[0]["valid"].sum() == 4   # rows 4-7, all real
        assert got[1]["valid"].sum() == 0   # rows 12-15: all wrap-padding

    def test_indivisible_batch_raises(self, monkeypatch):
        import jax

        monkeypatch.setattr(jax, "process_count", lambda: 3)
        monkeypatch.setattr(jax, "process_index", lambda: 0)
        b = Batcher(_source, 32, 16, process_sharded=True)
        with pytest.raises(ValueError):
            next(b.train_epochs(epoch=0))


class TestNativePrefetch:
    def test_local_source_native_stream_matches_call(self, tmp_path):
        from audio_transformers_tpu.data import native_loader
        from audio_transformers_tpu.data.urbansound import (
            UrbanSoundLocalSource)
        from audio_transformers_tpu.utils.audio import write_wav

        if not native_loader.available():
            pytest.skip("libaudiodec not built")

        rng = np.random.default_rng(0)
        rows = []
        for i in range(6):
            wav = (rng.standard_normal(int(22050 * 1.5)) * 0.3
                   ).astype(np.float32)
            name = f"clip{i}.wav"
            write_wav(str(tmp_path / name), wav, 22050)
            rows.append((name, i % 3))
        with open(tmp_path / "metadata.csv", "w") as f:
            f.write("slice_file_name,classID\n")
            for name, label in rows:
                f.write(f"{name},{label}\n")

        src = UrbanSoundLocalSource(str(tmp_path), use_native=True)
        sync = Batcher(src, 6, 2)
        pre = Batcher(src, 6, 2, num_workers=2)
        for a, b in zip(_collect(sync), _collect(pre)):
            np.testing.assert_allclose(a["waveform"], b["waveform"],
                                       atol=1e-6)
            np.testing.assert_array_equal(a["label"], b["label"])


class TestDistributedHelpers:
    """parallel/distributed.py index math on a faked process geometry."""

    def test_process_shard_disjoint_cover(self, monkeypatch):
        import jax

        from audio_transformers_tpu.parallel import distributed

        seen = []
        for pid in range(3):
            monkeypatch.setattr(jax, "process_count", lambda: 3)
            monkeypatch.setattr(jax, "process_index", lambda p=pid: p)
            seen.append(list(distributed.process_shard(10)))
        flat = [i for shard in seen for i in shard]
        assert sorted(flat) == list(range(10))          # covers everything
        assert len(set(flat)) == len(flat)              # disjoint
        assert seen[-1][-1] == 9                        # remainder -> last

    def test_global_batch_to_local(self, monkeypatch):
        import jax

        from audio_transformers_tpu.parallel import distributed

        monkeypatch.setattr(jax, "process_count", lambda: 4)
        assert distributed.global_batch_to_local(32) == 8
        with pytest.raises(ValueError):
            distributed.global_batch_to_local(30)

    def test_single_process_noop(self, monkeypatch):
        import os

        from audio_transformers_tpu.parallel import distributed

        monkeypatch.setattr(os, "environ", dict(os.environ))
        os.environ.pop("ATX_NUM_PROCESSES", None)
        assert distributed.initialize_if_multihost() is False
