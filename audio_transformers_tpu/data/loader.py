"""Host-side batching over in-memory/lazy sample sources.

The TPU consumes fixed-shape batches; the host's job is decode/resample/
pad only (the mel front-end runs on device, unlike the reference which
does mel per-sample in DataLoader workers — urban_sounds/dataset.py:55-56,
:98-99). Training iterates seeded-shuffled full batches (drop_last, so the
jit'd step never recompiles); evaluation pads the final batch and carries a
validity mask so metrics are exact.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterator, Sequence

import numpy as np


class Batcher:
    """Batches a map-style source: `source(i) -> dict of numpy arrays`."""

    def __init__(self, source: Callable[[int], Dict[str, np.ndarray]],
                 num_samples: int, batch_size: int, *, seed: int = 42):
        self.source = source
        self.num_samples = num_samples
        self.batch_size = batch_size
        self.seed = seed

    def _collate(self, idxs: Sequence[int], valid: int) -> Dict[str, np.ndarray]:
        samples = [self.source(int(i)) for i in idxs]
        batch = {k: np.stack([s[k] for s in samples]) for k in samples[0]}
        mask = np.zeros(len(idxs), dtype=bool)
        mask[:valid] = True
        batch["valid"] = mask
        return batch

    def train_epochs(self, *, epoch: int) -> Iterator[Dict[str, np.ndarray]]:
        """Seeded shuffle per epoch; drops the final partial batch so batch
        shape is static under jit."""
        rng = np.random.default_rng(self.seed + epoch)
        order = rng.permutation(self.num_samples)
        n_full = self.num_samples // self.batch_size
        for b in range(n_full):
            idxs = order[b * self.batch_size: (b + 1) * self.batch_size]
            yield self._collate(idxs, valid=len(idxs))

    def eval_batches(self) -> Iterator[Dict[str, np.ndarray]]:
        """Sequential; final batch padded by wrapping, with `valid` mask."""
        for start in range(0, self.num_samples, self.batch_size):
            idxs = list(range(start, min(start + self.batch_size,
                                         self.num_samples)))
            valid = len(idxs)
            while len(idxs) < self.batch_size:
                idxs.append(idxs[-1])
            yield self._collate(idxs, valid=valid)

    @property
    def steps_per_epoch(self) -> int:
        return self.num_samples // self.batch_size
