"""UrbanSound classifier training: one jit'd step, data-parallel over a mesh.

Capability-equivalent to the reference trainer (reference:
urban_sounds/train_classifier.py:12-150 — Adam + ReduceLROnPlateau + CE,
best-by-val-accuracy checkpointing, wandb metrics), redesigned TPU-first:
the whole step (mel front-end -> model -> loss -> grads -> optimizer) is
one compiled program; the batch is sharded over the mesh "data" axis and
XLA inserts the gradient all-reduce (vs the reference's per-batch H2D
copies and `.item()` syncs, train_classifier.py:20,27).
"""

from __future__ import annotations

import functools
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from audio_transformers_tpu.core.checkpoint import Checkpointer
from audio_transformers_tpu.core.config import (MelConfig, TrainConfig,
                                                UrbanSoundConfig)
from audio_transformers_tpu.core.metrics import MetricLogger, StepTimer
from audio_transformers_tpu.models import urbansound
from audio_transformers_tpu.ops.mel import log_mel
from audio_transformers_tpu.parallel.mesh import (build_mesh, replicated,
                                                  shard_batch)
from audio_transformers_tpu.train.optim import (PlateauScheduler,
                                                build_optimizer,
                                                set_learning_rate)


def make_steps(model_cfg: UrbanSoundConfig, mel_cfg: MelConfig,
               train_cfg: TrainConfig, tx):
    compute_dtype = jnp.dtype(train_cfg.compute_dtype)

    def _forward(params, state, waveform, *, training, rng=None):
        mel = log_mel(waveform, mel_cfg)
        mel = mel.astype(compute_dtype)
        if train_cfg.spec_augment and training and rng is not None:
            from audio_transformers_tpu.ops.specaugment import spec_augment
            rng, sa_key = jax.random.split(rng)
            mel = spec_augment(sa_key, mel)
        return urbansound.apply(params, state, model_cfg, mel,
                                training=training, rng=rng)

    def _loss(params, state, batch, rng):
        logits, new_state = _forward(params, state, batch["waveform"],
                                     training=True, rng=rng)
        logits = logits.astype(jnp.float32)
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, batch["label"]).mean()
        acc = jnp.mean((jnp.argmax(logits, -1) == batch["label"])
                       .astype(jnp.float32))
        return loss, (new_state, {"loss": loss, "accuracy": acc})

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step(params, state, opt_state, batch, rng):
        grads, (new_state, metrics) = jax.grad(
            _loss, has_aux=True)(params, state, batch, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_state, opt_state, metrics

    @jax.jit
    def eval_step(params, state, batch):
        logits, _ = _forward(params, state, batch["waveform"],
                             training=False)
        logits = logits.astype(jnp.float32)
        per = optax.softmax_cross_entropy_with_integer_labels(
            logits, batch["label"])
        correct = (jnp.argmax(logits, -1) == batch["label"])
        valid = batch["valid"].astype(jnp.float32)
        return {
            "loss_sum": jnp.sum(per * valid),
            "correct": jnp.sum(correct.astype(jnp.float32) * valid),
            "count": jnp.sum(valid),
        }

    return train_step, eval_step


def evaluate(eval_step, params, state, batcher, mesh) -> Dict[str, float]:
    total = {"loss_sum": 0.0, "correct": 0.0, "count": 0.0}
    for batch in batcher.eval_batches():
        out = eval_step(params, state, shard_batch(batch, mesh))
        for k in total:
            total[k] += float(out[k])
    n = max(total["count"], 1.0)
    return {"loss": total["loss_sum"] / n, "accuracy": total["correct"] / n}


def train_classifier(model_cfg: UrbanSoundConfig, mel_cfg: MelConfig,
                     train_cfg: TrainConfig, train_batcher, val_batcher, *,
                     log_dir: Optional[str] = None,
                     wandb_project: Optional[str] = None,
                     logger: Optional[MetricLogger] = None) -> dict:
    mesh = build_mesh(train_cfg.mesh_shape)
    tx = build_optimizer(train_cfg.optimizer,
                         total_steps=train_batcher.steps_per_epoch
                         * train_cfg.num_epochs)
    rng = jax.random.PRNGKey(train_cfg.seed)
    rng, init_key = jax.random.split(rng)
    params, state = urbansound.init(init_key, model_cfg)
    params = jax.device_put(params, replicated(mesh))
    state = jax.device_put(state, replicated(mesh))
    opt_state = jax.device_put(tx.init(params), replicated(mesh))

    train_step, eval_step = make_steps(model_cfg, mel_cfg, train_cfg, tx)
    plateau = (PlateauScheduler(train_cfg.optimizer)
               if train_cfg.optimizer.schedule == "reduce_on_plateau"
               else None)
    ckpt = (Checkpointer(train_cfg.checkpoint_dir,
                         max_to_keep=train_cfg.keep_checkpoints,
                         best_mode="max")
            if train_cfg.checkpoint_dir else None)
    resume_ckpt = (Checkpointer(train_cfg.checkpoint_dir + "-resume",
                                max_to_keep=1)
                   if train_cfg.checkpoint_dir else None)
    log = logger or MetricLogger(log_dir=log_dir, wandb_project=wandb_project,
                                 config={"model": model_cfg.to_json(),
                                         "train": train_cfg.to_json()})

    best_val_acc, history = -1.0, []
    # host-side snapshot of the best-by-val-accuracy (params, state); the
    # live trees are donated into train_step every step, so the loop-exit
    # trees are the LAST epoch, not the best (reference keeps best_model.pt,
    # train_classifier.py:126-133)
    best_tree = None
    step = 0
    start_epoch = 0
    if resume_ckpt is not None and resume_ckpt.latest_step() is not None:
        tree, meta, rstep = resume_ckpt.restore(
            like={"params": params, "state": state, "opt_state": opt_state})
        params = jax.device_put(tree["params"], replicated(mesh))
        state = jax.device_put(tree["state"], replicated(mesh))
        opt_state = jax.device_put(tree["opt_state"], replicated(mesh))
        start_epoch = (meta or {}).get("epoch", 0)
        best_val_acc = (meta or {}).get("best_val_acc", -1.0)
        step = rstep
        if plateau is not None and meta:
            plateau.best = meta.get("plateau_best", plateau.best)
            plateau.lr = meta.get("plateau_lr", plateau.lr)
            # without bad_epochs a resume near the patience limit delays
            # the LR reduction by up to `patience` extra epochs vs the
            # uninterrupted run
            plateau.bad_epochs = meta.get("plateau_bad_epochs",
                                          plateau.bad_epochs)
            opt_state = set_learning_rate(opt_state, plateau.lr)
        if ckpt is not None and ckpt.best_step() is not None:
            btree, _, _ = ckpt.restore(
                step=ckpt.best_step(),
                like={"params": params, "state": state})
            best_tree = jax.device_get(btree)
        print(f"[train] resumed from epoch {start_epoch} (step {step})")

    timer = StepTimer()
    for epoch in range(start_epoch, train_cfg.num_epochs):
        # per-epoch key derived from (seed, epoch), NOT carried across
        # epochs: a resumed run replays the exact dropout/spec-augment
        # stream the uninterrupted run would have used
        rng = jax.random.fold_in(jax.random.PRNGKey(train_cfg.seed),
                                 epoch + 1)
        # device-side metric accumulation; one host fetch per epoch
        timer.reset()
        step_metrics = []
        n_batches = 0
        batches = train_batcher.train_epochs(epoch=epoch)
        while True:
            t0 = time.perf_counter()
            batch = next(batches, None)
            timer.data_tick(time.perf_counter() - t0)
            if batch is None:
                break
            rng, step_key = jax.random.split(rng)
            params, state, opt_state, m = train_step(
                params, state, opt_state, shard_batch(batch, mesh), step_key)
            step_metrics.append(m)
            n_batches += 1
            step += 1
            timer.tick(items=train_cfg.batch_size)
        # train-only rates: sync on the last step's metrics BEFORE eval
        rates = timer.rates(sync_tree=step_metrics[-1]
                            if step_metrics else None)
        ep_loss = float(sum(m["loss"] for m in step_metrics)) \
            if step_metrics else 0.0
        ep_acc = float(sum(m["accuracy"] for m in step_metrics)) \
            if step_metrics else 0.0

        val = evaluate(eval_step, params, state, val_batcher, mesh)
        if plateau is not None:
            lr = plateau.step(val["loss"])
            opt_state = set_learning_rate(opt_state, lr)
        else:
            lr = train_cfg.optimizer.learning_rate

        row = {
            "epoch": epoch + 1,
            "train/loss": ep_loss / max(n_batches, 1),
            "train/accuracy": ep_acc / max(n_batches, 1),
            "val/loss": val["loss"],
            "val/accuracy": val["accuracy"],
            "lr": lr,
            "clips_per_sec": rates.get("items_per_sec", 0.0),
            "data_wait_s": rates.get("data_wait_s", 0.0),
        }
        history.append(row)
        log.log(row, step=step)

        # Best-by-val-accuracy retention (reference keeps best_model.pt,
        # train_classifier.py:126-133).
        if val["accuracy"] > best_val_acc:
            best_val_acc = val["accuracy"]
            # one host fetch, shared with the checkpoint write below
            best_tree = jax.device_get({"params": params, "state": state})
            if ckpt is not None:
                ckpt.save(step, best_tree,
                          metadata={"model_cfg": model_cfg.to_json(),
                                    "mel_cfg": mel_cfg.to_json(),
                                    "epoch": epoch + 1,
                                    "val_accuracy": val["accuracy"]},
                          best_metric=val["accuracy"])
        if resume_ckpt is not None:
            resume_ckpt.save(
                step, {"params": params, "state": state,
                       "opt_state": opt_state},
                metadata={"epoch": epoch + 1,
                          "best_val_acc": best_val_acc,
                          **({"plateau_best": plateau.best,
                              "plateau_lr": plateau.lr,
                              "plateau_bad_epochs": plateau.bad_epochs}
                             if plateau is not None else {})})

    if ckpt is not None:
        ckpt.close()
    if resume_ckpt is not None:
        resume_ckpt.close()
    log.finish()
    if best_tree is None:  # no eval improved (e.g. zero epochs ran)
        best_tree = jax.device_get({"params": params, "state": state})
    return {"params": params, "state": state, "opt_state": opt_state,
            "best_params": best_tree["params"],
            "best_state": best_tree["state"],
            "history": history, "best_val_accuracy": best_val_acc}
