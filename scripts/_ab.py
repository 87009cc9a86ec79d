"""Shared A/B timing helper for the benchmark scripts.

Encodes the two hard-won measurement rules every A/B script in this
directory must follow (CLAUDE.md "Measuring performance"):

- variants are interleaved round-robin within each round, so tunnel or
  compiler congestion hits all of them equally — only same-process,
  interleaved comparisons are trustworthy;
- each key's time is the MIN over rounds, taken PER CHAIN LENGTH before
  any differencing — a min over per-round differences goes negative
  under tunnel jitter.

Callers build `{key: zero-arg callable}` where each callable runs one
timed rep-window end-to-end (dispatch + host fetch of a small scalar)
and then difference the returned minima between chain lengths.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Hashable, Optional


def roundrobin_min(timed: Dict[Hashable, Callable[[], object]],
                   rounds: int,
                   on_round: Optional[Callable[[int], None]] = None,
                   ) -> Dict[Hashable, float]:
    """Min-over-rounds wall time per key, keys interleaved every round.

    `timed[key]()` must block until the device work is done (host fetch —
    block_until_ready does NOT wait on the axon tunnel). Raises on
    rounds < 1: with zero rounds every entry would stay inf and the
    caller's difference would silently print NaN.
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    best: Dict[Hashable, float] = {k: float("inf") for k in timed}
    for r in range(rounds):
        for key, call in timed.items():
            t0 = time.perf_counter()
            call()
            best[key] = min(best[key], time.perf_counter() - t0)
        if on_round is not None:
            on_round(r)
    return best
