"""Host-loader scaling benchmark: C++ prefetch pool clips/s vs threads.

The device side consumes ~5k clips/s (classifier train at batch 64); the
host pool must scale across threads to keep up (VERDICT r2 weak #5).

Usage: python scripts/loader_bench.py [--clips 256] [--threads 1 4 8 16]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--clips", type=int, default=256)
    p.add_argument("--threads", type=int, nargs="+", default=[1, 4, 8, 16])
    p.add_argument("--repeat", type=int, default=4)
    args = p.parse_args(argv)

    from audio_transformers_tpu.data import native_loader as nl
    from audio_transformers_tpu.utils.audio import synth_clip, write_wav

    if not nl.available():
        print("libaudiodec not built")
        return

    with tempfile.TemporaryDirectory() as td:
        paths = []
        for i in range(64):
            path = os.path.join(td, f"clip{i}.wav")
            write_wav(path, synth_clip(4.0, 22050, seed=i), 22050)
            paths.append(path)
        reps = max(args.clips // len(paths), 1)
        all_paths = paths * reps

        # warm page cache + filter cache
        list(nl.iter_clips(paths, target_rate=16000, target_len=16000 * 4,
                           num_threads=4))

        for nt in args.threads:
            best = 0.0
            for _ in range(args.repeat):
                t0 = time.perf_counter()
                n_ok = sum(1 for _, _, ok in nl.iter_clips(
                    all_paths, target_rate=16000, target_len=16000 * 4,
                    num_threads=nt) if ok)
                dt = time.perf_counter() - t0
                best = max(best, n_ok / dt)
            print(f"threads={nt:3d}  {best:8.1f} clips/s", flush=True)

        # decoded-waveform cache (data/cache.py): epoch 1 decodes fresh
        # and fills the cache; epochs >= 2 are mmap reads on ONE core —
        # the number that must beat the device demand (~5.7k clips/s,
        # BENCH_r04 classifier_clips_per_sec)
        from audio_transformers_tpu.data.cache import (CachedSource,
                                                       WaveformCache)

        class _WavSource:
            """Minimal path-list source with native prefetch."""

            num_samples = len(all_paths)

            def __call__(self, i):
                it = nl.iter_clips([all_paths[int(i)]], target_rate=16000,
                                   target_len=16000 * 4, num_threads=1)
                _, clip, _ = next(it)
                return {"waveform": clip, "label": np.int32(0)}

            def prefetch_iter(self, indices, *, num_threads=4):
                idx = [int(i) for i in indices]
                stream = nl.iter_clips([all_paths[i] for i in idx],
                                       target_rate=16000,
                                       target_len=16000 * 4,
                                       num_threads=num_threads)
                return ({"waveform": clip, "label": np.int32(0)}
                        for _, clip, _ in stream)

        for dtype in ("int16", "float32"):
            cache_dir = os.path.join(td, f"wavcache_{dtype}")
            # index-keyed (path_of=None): all_paths repeats 64 files, and
            # fingerprint keys would alias the repeats into same-epoch
            # hits — index keys make the cold pass decode every entry
            src = CachedSource(
                _WavSource(),
                WaveformCache(cache_dir, target_len=16000 * 4,
                              spec="bench", dtype=dtype))
            idxs = list(range(len(all_paths)))
            t0 = time.perf_counter()
            for s in src.prefetch_iter(idxs, num_threads=1):
                pass
            cold = len(idxs) / (time.perf_counter() - t0)
            best = 0.0
            for _ in range(args.repeat):
                t0 = time.perf_counter()
                n = sum(1 for _ in src.prefetch_iter(idxs, num_threads=1))
                best = max(best, n / (time.perf_counter() - t0))
            print(f"cache[{dtype:7s}] cold {cold:8.1f} clips/s   "
                  f"warm(1 core) {best:8.1f} clips/s", flush=True)


if __name__ == "__main__":
    main()
