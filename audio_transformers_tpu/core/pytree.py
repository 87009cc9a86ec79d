"""Parameter-pytree utilities.

Models in this framework are pure functions over nested-dict parameter
pytrees (no module classes, no tracing magic): `init(key, cfg) -> params`
and `apply(params, cfg, *inputs) -> outputs`. This keeps sharding
annotations, checkpointing, and KV-cache threading explicit and
jit-friendly.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


def param_count(params: Params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


def param_bytes(params: Params) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))


def cast_floating(tree: Params, dtype) -> Params:
    """Cast floating-point leaves to `dtype`, leave integer leaves alone."""

    def _cast(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree.map(_cast, tree)


def tree_paths(tree: Params):
    """Yield ("a/b/c", leaf) pairs."""
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    for path, leaf in flat:
        yield "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path), leaf


def map_with_path(fn: Callable[[str, Any], Any], tree: Params) -> Params:
    """tree.map where fn also receives the "a/b/c" path string."""

    def _fn(path, leaf):
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        return fn(name, leaf)

    return jax.tree_util.tree_map_with_path(_fn, tree)


def describe(params: Params, max_rows: int = 0) -> str:
    rows = [(name, tuple(x.shape), str(x.dtype)) for name, x in tree_paths(params)]
    if max_rows:
        rows = rows[:max_rows]
    width = max((len(r[0]) for r in rows), default=0)
    lines = [f"{name:<{width}}  {shape!s:<20} {dtype}" for name, shape, dtype in rows]
    lines.append(f"total params: {param_count(params):,}")
    return "\n".join(lines)


def split_keys(key: jax.Array, names) -> Dict[str, jax.Array]:
    keys = jax.random.split(key, len(names))
    return dict(zip(names, keys))
