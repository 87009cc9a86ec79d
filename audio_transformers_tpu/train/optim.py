"""Optimizer/schedule construction from OptimizerConfig.

Covers the reference's two training setups:
  - Adam(lr 1e-3) + ReduceLROnPlateau(patience 5) + CE
    (reference: urban_sounds/train_classifier.py:88-99,113)
  - AdamW(3e-5) + linear warmup (10%) then linear decay
    (reference: whisper_finetune/train.py:159-167)

Plateau scheduling is host-driven (the reference steps it per epoch with
val loss); we expose the learning rate through `optax.inject_hyperparams`
so the loop can scale it between epochs without rebuilding opt state.
"""

from __future__ import annotations

from typing import Optional

import optax

from audio_transformers_tpu.core.config import OptimizerConfig


def frozen_leaf_decay_mask(params, *, frozen=(("whisper", "encoder",
                                               "pos"),)) -> dict:
    """adamw weight-decay mask excluding frozen leaves.

    The encoder positional table is non-trainable (stop_gradient in
    models/whisper/model.py — HF freezes WhisperEncoder.embed_positions
    the same way) but lives in the stateless whisper param tree; with
    weight_decay > 0 an unmasked adamw would decay it every step even
    though its grads are zero, silently corrupting imported positions.
    """
    import jax

    frozen = {tuple(f) for f in frozen}

    def mark(path, _leaf):
        keys = tuple(getattr(p, "key", getattr(p, "name", None))
                     for p in path)
        return keys not in frozen

    return jax.tree_util.tree_map_with_path(mark, params)


def build_optimizer(cfg: OptimizerConfig,
                    total_steps: Optional[int] = None,
                    decay_mask=None):
    """Returns an optax GradientTransformation.

    For schedule="linear_warmup_decay", `total_steps` is required.
    For schedule="reduce_on_plateau", use `set_learning_rate` between epochs.
    `decay_mask` (a pytree-of-bools or params->pytree callable) limits
    adamw weight decay to the marked leaves; see frozen_leaf_decay_mask.
    """
    if cfg.schedule == "linear_warmup_decay":
        if not total_steps:
            raise ValueError("linear_warmup_decay needs total_steps")
        warmup = max(1, int(cfg.warmup_fraction * total_steps))
        lr = optax.join_schedules(
            [optax.linear_schedule(0.0, cfg.learning_rate, warmup),
             optax.linear_schedule(cfg.learning_rate, 0.0,
                                   max(1, total_steps - warmup))],
            boundaries=[warmup],
        )
    else:  # constant / reduce_on_plateau (host-scaled)
        lr = cfg.learning_rate

    def _core(learning_rate):
        if cfg.name == "adamw":
            return optax.adamw(learning_rate, b1=cfg.b1, b2=cfg.b2,
                               eps=cfg.eps, weight_decay=cfg.weight_decay,
                               mask=decay_mask)
        if cfg.name == "adam":
            return optax.adam(learning_rate, b1=cfg.b1, b2=cfg.b2,
                              eps=cfg.eps)
        raise ValueError(f"unknown optimizer {cfg.name!r}")

    if cfg.schedule == "reduce_on_plateau":
        tx = optax.inject_hyperparams(_core)(learning_rate=lr)
    else:
        tx = _core(lr)

    if cfg.grad_clip_norm:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), tx)
    return tx


def set_learning_rate(opt_state, lr: float):
    """Update the injected learning rate (reduce_on_plateau schedule)."""

    import jax.numpy as jnp

    def _find(s):
        if hasattr(s, "hyperparams") and "learning_rate" in s.hyperparams:
            old = s.hyperparams["learning_rate"]
            s.hyperparams["learning_rate"] = jnp.asarray(
                lr, dtype=getattr(old, "dtype", jnp.float32))
            return True
        if isinstance(s, tuple):
            return any(_find(x) for x in s)
        return False

    if not _find(opt_state):
        raise ValueError("opt_state has no injected learning_rate")
    return opt_state


def get_learning_rate(opt_state) -> Optional[float]:
    def _find(s):
        if hasattr(s, "hyperparams") and "learning_rate" in s.hyperparams:
            return float(s.hyperparams["learning_rate"])
        if isinstance(s, tuple):
            for x in s:
                r = _find(x)
                if r is not None:
                    return r
        return None

    return _find(opt_state)


class PlateauScheduler:
    """Host-side ReduceLROnPlateau (min mode), matching torch semantics
    the reference relies on (reference: urban_sounds/train_classifier.py:97-99)."""

    def __init__(self, cfg: OptimizerConfig):
        self.patience = cfg.plateau_patience
        self.factor = cfg.plateau_factor
        self.lr = cfg.learning_rate
        self.best = float("inf")
        self.bad_epochs = 0

    def step(self, metric: float) -> float:
        """Feed the epoch's val metric; returns the (possibly reduced) lr."""
        if metric < self.best:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.lr *= self.factor
                self.bad_epochs = 0
        return self.lr
