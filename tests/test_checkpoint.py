"""Checkpointer round-trips, retention, label maps, metric logger."""

import json
import os

import numpy as np

import jax
import jax.numpy as jnp

from audio_transformers_tpu.core.checkpoint import (Checkpointer,
                                                    load_label_map,
                                                    save_label_map)
from audio_transformers_tpu.core.metrics import MetricLogger


def _tree(seed):
    k = jax.random.PRNGKey(seed)
    return {"a": jax.random.normal(k, (4, 8)),
            "b": {"c": jnp.arange(6, dtype=jnp.int32)}}


def test_save_restore_roundtrip(tmp_path):
    ck = Checkpointer(str(tmp_path), max_to_keep=2)
    tree = _tree(0)
    ck.save(1, tree, metadata={"epoch": 1, "note": "x"}, best_metric=0.5)
    got, meta, step = ck.restore(like=tree)
    assert step == 1 and meta["epoch"] == 1
    for (p1, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(tree),
            jax.tree_util.tree_leaves_with_path(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert a.dtype == b.dtype
    ck.close()


def test_retention_and_best(tmp_path):
    ck = Checkpointer(str(tmp_path), max_to_keep=2, best_mode="max")
    for step, metric in [(1, 0.3), (2, 0.9), (3, 0.5)]:
        ck.save(step, _tree(step), best_metric=metric)
    # max_to_keep=2 with best_fn keeps the best ones
    kept = sorted(int(d) for d in os.listdir(tmp_path) if d.isdigit())
    assert len(kept) == 2
    assert 2 in kept  # the best (0.9) survives
    assert ck.best_step() == 2
    ck.close()


def test_structure_mismatch_is_actionable(tmp_path):
    """Restoring into a template with a different pytree structure (e.g. a
    checkpoint written before an optimizer-chain change) must fail with an
    error that names the directory and says how to recover — not orbax's
    raw metadata-tree traceback."""
    import pytest

    ck = Checkpointer(str(tmp_path))
    ck.save(1, _tree(0))
    stale = {"a": jnp.zeros((4, 8)),
             "b": {"c": jnp.zeros(6, jnp.int32),
                   "extra": jnp.zeros(3)}}  # structure drift
    with pytest.raises(ValueError, match="older version|different pytree"):
        ck.restore(like=stale)
    ck.close()


def test_label_map_roundtrip(tmp_path):
    path = str(tmp_path / "style_to_id.txt")
    mapping = {"happy": 0, "sad": 1, "a: weird name": 2}
    save_label_map(path, mapping)
    got = load_label_map(path)
    assert got == mapping
    # reference format: "name: idx" lines (train.py:137-141)
    assert open(path).readline().strip() == "happy: 0"


def test_metric_logger_jsonl(tmp_path):
    log = MetricLogger(log_dir=str(tmp_path), console=False)
    log.log({"train/loss": 1.5, "epoch": 1}, step=10)
    log.log({"train/loss": jnp.float32(0.75), "epoch": 2}, step=20)
    log.finish()
    rows = [json.loads(line) for line in
            open(tmp_path / "metrics.jsonl")]
    assert len(rows) == 2
    assert rows[0]["train/loss"] == 1.5 and rows[0]["step"] == 10
    assert abs(rows[1]["train/loss"] - 0.75) < 1e-6
