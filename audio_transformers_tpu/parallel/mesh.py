"""Device-mesh construction and sharding helpers.

The reference has no distribution at all (single RTX 3090; SURVEY.md §2c).
Here parallelism is a first-class substrate: a `jax.sharding.Mesh` over the
TPU slice, batch dims sharded over the "data" axis, and parameter pytrees
annotated with `NamedSharding`s so tensor parallelism is a mesh-axis change
rather than a rewrite. XLA inserts the ICI collectives (gradient psum etc.)
from the shardings — no hand-written NCCL-equivalents.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def build_mesh(shape: Sequence[Tuple[str, int]] = (("data", -1),),
               devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Create a mesh. One axis size may be -1 (all remaining devices).

    build_mesh()                         -> 1-D data-parallel mesh
    build_mesh((("data", -1), ("model", 2)))  -> DP x TP mesh
    """
    devices = list(devices if devices is not None else jax.devices())
    names = [n for n, _ in shape]
    sizes = [s for _, s in shape]
    if sizes.count(-1) > 1:
        raise ValueError("at most one mesh axis may be -1")
    known = int(np.prod([s for s in sizes if s != -1])) if sizes else 1
    if -1 in sizes:
        if len(devices) % known:
            raise ValueError(
                f"{len(devices)} devices not divisible by fixed axes {known}")
        sizes[sizes.index(-1)] = len(devices) // known
    total = int(np.prod(sizes))
    if total > len(devices):
        raise ValueError(f"mesh {dict(zip(names, sizes))} needs {total} "
                         f"devices, have {len(devices)}")
    dev_array = np.asarray(devices[:total]).reshape(sizes)
    return Mesh(dev_array, tuple(names))


def data_sharding(mesh: Mesh, ndim: int = 1,
                  axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over `axis`, replicate the rest."""
    spec = P(axis, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """device_put a pytree of host arrays with the batch dim sharded.

    Multi-process: each process holds only its LOCAL rows (the Batcher's
    process_sharded slice), so the global array is assembled from the
    per-process shards — `jax.device_put` would reject the local/global
    shape mismatch."""
    multiprocess = jax.process_count() > 1

    def _put(x):
        sharding = data_sharding(mesh, ndim=x.ndim, axis=axis)
        if multiprocess:
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x))
        return jax.device_put(x, sharding)

    return jax.tree.map(_put, batch)


def shard_params(params, mesh: Mesh, axes=None):
    """device_put a parameter pytree. `axes` is an optional pytree of
    PartitionSpecs (same structure); None leaves are replicated."""
    if axes is None:
        return jax.device_put(params, replicated(mesh))

    def _put(x, spec):
        spec = spec if spec is not None else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(_put, params, axes,
                        is_leaf=lambda x: x is None)
