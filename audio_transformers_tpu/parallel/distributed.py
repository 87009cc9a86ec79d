"""Multi-host initialization and per-host data sharding helpers.

The reference has no distributed backend at all (SURVEY.md §5: NCCL/MPI
never initialized). TPU-native equivalent: `jax.distributed.initialize` for
multi-host slices; collectives ride ICI/DCN via XLA from the shardings in
parallel/mesh.py. On a single host these helpers are no-ops, so the same
training script runs anywhere.
"""

from __future__ import annotations

import os
from typing import Optional


def initialize_if_multihost(coordinator: Optional[str] = None,
                            num_processes: Optional[int] = None,
                            process_id: Optional[int] = None) -> bool:
    """Call once at program start. Reads the standard JAX env vars when
    args are omitted; returns True if multi-host was initialized."""
    import jax

    num = num_processes or int(os.environ.get("ATX_NUM_PROCESSES", "1"))
    if num <= 1 and coordinator is None:
        return False
    # CPU backends need an explicit cross-process collective transport
    # (TPU slices get collectives natively over ICI/DCN); gloo is JAX's
    # built-in CPU implementation. Must be set before backend init.
    platforms = str(getattr(jax.config, "jax_platforms", None)
                    or os.environ.get("JAX_PLATFORMS", ""))
    if "cpu" in platforms:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coordinator
        or os.environ.get("ATX_COORDINATOR", "127.0.0.1:9911"),
        num_processes=num,
        process_id=process_id
        if process_id is not None
        else int(os.environ.get("ATX_PROCESS_ID", "0")),
    )
    return True


def process_shard(num_samples: int) -> range:
    """This host's contiguous shard of a dataset index space (Grain-style
    index sharding; each process feeds its local devices)."""
    import jax

    n_proc = jax.process_count()
    pid = jax.process_index()
    per = num_samples // n_proc
    start = pid * per
    end = start + per if pid < n_proc - 1 else num_samples
    return range(start, end)


def global_batch_to_local(global_batch_size: int) -> int:
    import jax

    n = jax.process_count()
    if global_batch_size % n:
        raise ValueError(f"global batch {global_batch_size} not divisible "
                         f"by {n} processes")
    return global_batch_size // n
