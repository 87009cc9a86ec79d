"""UrbanSound8K data pipeline.

Capability-equivalent to the reference (reference:
urban_sounds/dataset.py:8-101): loads `danavery/urbansound8K` via HF
datasets (network/cache required; SyntheticClassification serves hub-less
environments), per-sample host preprocessing = mono mean -> resample to
22.05 kHz -> pad/trim to 4 s -> peak normalize, seeded 80/20 split, and
optional `limit_samples`. The mel transform runs on-device (ops/mel.py),
not here — the reference computes it per-sample in DataLoader workers
(dataset.py:55-56).

Also supports local-directory loading (wav files + a metadata csv with
`slice_file_name,classID` columns, the UrbanSound8K layout) so training
doesn't require the HF hub.
"""

from __future__ import annotations

import csv
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from audio_transformers_tpu.data.loader import Batcher
from audio_transformers_tpu.data.splits import random_split
from audio_transformers_tpu.utils.audio import preprocess_clip, read_audio

SAMPLE_RATE = 22050
DURATION = 4.0
NUM_CLASSES = 10


class UrbanSoundHFSource:
    def __init__(self, *, sample_rate: int = SAMPLE_RATE,
                 duration: float = DURATION,
                 limit_samples: Optional[int] = None,
                 cache_dir: Optional[str] = None):
        from datasets import load_dataset
        self.ds = load_dataset("danavery/urbansound8K", split="train",
                               cache_dir=cache_dir)
        self.sample_rate = sample_rate
        self.duration = duration
        self.n = min(limit_samples or len(self.ds), len(self.ds))

    @property
    def num_samples(self) -> int:
        return self.n

    def __len__(self) -> int:
        return self.n

    def __call__(self, i: int) -> Dict[str, np.ndarray]:
        row = self.ds[int(i)]
        wav = preprocess_clip(np.asarray(row["audio"]["array"]),
                              row["audio"]["sampling_rate"],
                              target_sr=self.sample_rate,
                              duration=self.duration)
        return {"waveform": wav, "label": np.int32(row["classID"])}


class UrbanSoundLocalSource:
    """wav-file directory + metadata csv (UrbanSound8K on-disk layout).

    Uses the native C++ loader (native/audiodec via data/native_loader) for
    decode+resample when built — the equivalent of the reference's C++
    DataLoader-worker tier — with a pure-numpy fallback."""

    def __init__(self, data_dir: str, metadata_csv: Optional[str] = None, *,
                 sample_rate: int = SAMPLE_RATE, duration: float = DURATION,
                 limit_samples: Optional[int] = None,
                 use_native: Optional[bool] = None):
        self.data_dir = data_dir
        meta = metadata_csv or os.path.join(data_dir, "metadata.csv")
        self.rows: List[Tuple[str, int]] = []
        with open(meta) as f:
            for row in csv.DictReader(f):
                name = row.get("slice_file_name") or row["file"]
                label = int(row.get("classID", row.get("label", 0)))
                self.rows.append((name, label))
        if limit_samples:
            self.rows = self.rows[:limit_samples]
        self.sample_rate = sample_rate
        self.duration = duration
        if use_native is None:
            from audio_transformers_tpu.data import native_loader
            use_native = native_loader.available()
        self.use_native = use_native

    @property
    def num_samples(self) -> int:
        return len(self.rows)

    def __len__(self) -> int:
        return len(self.rows)

    def __call__(self, i: int) -> Dict[str, np.ndarray]:
        name, label = self.rows[int(i)]
        path = os.path.join(self.data_dir, name)
        if self.use_native:
            from audio_transformers_tpu.data import native_loader as nl
            with open(path, "rb") as f:
                audio, sr = nl.decode_wav(f.read())
            if sr != self.sample_rate:
                audio = nl.resample(audio, sr, self.sample_rate)
            wav = np.zeros(int(self.sample_rate * self.duration), np.float32)
            n = min(len(audio), len(wav))
            wav[:n] = audio[:n]
            peak = np.abs(wav).max()
            if peak > 0:
                wav /= peak
        else:
            audio, sr = read_audio(path)
            wav = preprocess_clip(audio, sr, target_sr=self.sample_rate,
                                  duration=self.duration)
        return {"waveform": wav, "label": np.int32(label)}

    def prefetch_iter(self, indices, *, num_threads: int = 4):
        """Stream samples for `indices` (in order) from the C++ prefetch
        pool — decode/resample/pad/normalize run in native worker threads,
        overlapping the training step (the reference hides the same work in
        DataLoader worker processes, urban_sounds/dataset.py:98-99).
        Returns None when the native library isn't available so the caller
        can fall back to its generic thread-pool tier."""
        if not self.use_native:
            return None
        return self._native_stream(list(indices), num_threads)

    def _native_stream(self, indices, num_threads: int):
        from audio_transformers_tpu.data import native_loader as nl

        target_len = int(self.sample_rate * self.duration)
        with nl.PrefetchPool(num_threads=num_threads,
                             target_rate=self.sample_rate,
                             target_len=target_len, normalize=True) as pool:
            n = len(indices)
            submitted = popped = 0
            while popped < n:
                while submitted < n:
                    i = int(indices[submitted])
                    path = os.path.join(self.data_dir, self.rows[i][0])
                    if not pool.submit(path, i):
                        break  # queue full; drain one first
                    submitted += 1
                clip, tag, ok = pool.pop()
                popped += 1
                if ok:
                    yield {"waveform": clip,
                           "label": np.int32(self.rows[tag][1])}
                else:  # unreadable/corrupt file: python path decides
                    yield self(tag)


class _Subset:
    def __init__(self, base, indices):
        self.base, self.indices = base, indices

    @property
    def num_samples(self):
        return len(self.indices)

    def __len__(self):
        return len(self.indices)

    def __call__(self, i: int):
        return self.base(int(self.indices[i]))

    def prefetch_iter(self, indices, *, num_threads: int = 4):
        base_fn = getattr(self.base, "prefetch_iter", None)
        if base_fn is None:
            return None
        return base_fn([int(self.indices[i]) for i in indices],
                       num_threads=num_threads)

    def batcher(self, batch_size: int, seed: int = 42,
                num_workers: int = 0) -> Batcher:
        return Batcher(self, self.num_samples, batch_size, seed=seed,
                       num_workers=num_workers)


def get_batchers(source, *, batch_size: int = 32, val_split: float = 0.2,
                 seed: int = 42, num_workers: int = 0
                 ) -> Tuple[Batcher, Batcher]:
    """Seeded train/val split -> (train_batcher, val_batcher); the
    reference get_dataloaders contract (urban_sounds/dataset.py:73-101,
    incl. its num_workers=4 prefetch, dataset.py:98-99)."""
    tr, va = random_split(source.num_samples, val_split, seed=seed)
    return (_Subset(source, tr).batcher(batch_size, seed=seed,
                                        num_workers=num_workers),
            _Subset(source, va).batcher(batch_size, seed=seed,
                                        num_workers=num_workers))
