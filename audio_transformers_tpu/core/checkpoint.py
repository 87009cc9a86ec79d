"""Orbax checkpointing: save/restore with retention and bundled metadata.

The reference only saves (never resumes): raw `torch.save(state_dict)` of
the best classifier (reference: urban_sounds/train_classifier.py:129-133)
and HF `save_pretrained` dirs per improvement for whisper (reference:
whisper_finetune/train.py:330-337,397-402), with the label map written as a
side file `style_to_id.txt` (train.py:137-141) and weight-tying silently
lost on reload (evaluate_simple.py:54-65). Here a checkpoint is one atomic
bundle: params + optimizer state + BN/loop state + step + JSON metadata
(config, label map, decode defaults), fully resumable; tying is canonical
because the tied projection simply has no weight of its own.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class Checkpointer:
    def __init__(self, directory: str, *, max_to_keep: int = 3,
                 best_mode: str = "min"):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                best_fn=(lambda m: m.get("best_metric", 0.0)),
                best_mode=best_mode,
                create=True,
            ),
        )

    def save(self, step: int, tree: dict, *, metadata: Optional[dict] = None,
             best_metric: Optional[float] = None):
        metrics = {"best_metric": float(best_metric)} \
            if best_metric is not None else None
        self._mgr.save(
            step,
            args=ocp.args.Composite(
                tree=ocp.args.StandardSave(tree),
                **({"metadata": ocp.args.JsonSave(metadata)}
                   if metadata is not None else {}),
            ),
            metrics=metrics,
        )
        self._mgr.wait_until_finished()

    def restore(self, step: Optional[int] = None,
                like: Optional[dict] = None) -> tuple[dict, Optional[dict], int]:
        """Returns (tree, metadata, step). `like` is an abstract/concrete
        pytree template for sharded/typed restore."""
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        restore_args = {}
        if like is not None:
            abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, like)
            restore_args["tree"] = ocp.args.StandardRestore(abstract)
        else:
            restore_args["tree"] = ocp.args.StandardRestore()
        try:
            result = self._mgr.restore(
                step, args=ocp.args.Composite(**restore_args))
        except ValueError as e:
            if "tree structures do not match" not in str(e):
                raise
            raise ValueError(
                f"checkpoint at {self.directory} step {step} has a different "
                f"pytree structure than the current code expects (it was "
                f"likely written by an older version of this package — e.g. "
                f"a different optimizer chain changes opt_state's shape). "
                f"Resume is only possible with matching code; start a fresh "
                f"run (point --output_dir/--resume elsewhere or delete the "
                f"stale checkpoints).\n  original error: {e}") from e
        tree = result["tree"]
        meta = None
        meta_path = os.path.join(self.directory, str(step), "metadata")
        if os.path.isdir(meta_path):
            result = self._mgr.restore(
                step, args=ocp.args.Composite(
                    metadata=ocp.args.JsonRestore()))
            meta = result["metadata"]
        return tree, meta, step

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def best_step(self) -> Optional[int]:
        return self._mgr.best_step()

    def close(self):
        self._mgr.close()


def save_label_map(path: str, label_to_idx: dict):
    """Write the reference-format label map file (reference:
    whisper_finetune/train.py:137-141 — lines of "style: idx")."""
    with open(path, "w") as f:
        for name, idx in label_to_idx.items():
            f.write(f"{name}: {idx}\n")


def load_label_map(path: str) -> dict:
    """Parse the reference-format label map (reference:
    whisper_finetune/inference.py:69-127)."""
    out: dict[str, int] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or ":" not in line:
                continue
            name, idx = line.rsplit(":", 1)
            out[name.strip()] = int(idx.strip())
    return out


def export_json(path: str, obj: Any):
    with open(path, "w") as f:
        json.dump(obj, f, indent=2, sort_keys=True)
