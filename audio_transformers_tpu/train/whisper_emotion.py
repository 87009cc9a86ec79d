"""Dual-loss whisper-emotion fine-tuning (transcription CE + emotion CE).

Capability-equivalent to the reference trainer (reference:
whisper_finetune/train.py:86-406): teacher-forced shifted cross-entropy
with pad ignored + weighted emotion cross-entropy over the mean-pooled
decoder states, AdamW + linear warmup/decay, best-by-val-loss
checkpointing, the reference's metric names, and the style_to_id.txt
label-map artifact. TPU-first: one jit'd step with the mel front-end
fused in, batch sharded over the mesh "data" axis.

Loss-masking note: the reference's `ignore_index=pad_token_id` also
excludes EOS from the transcription loss because whisper's pad IS
<|endoftext|> (reference train.py:154; SURVEY.md §2 defects). We keep that
exact semantic by default (`mask_mode="pad"`) for parity, and offer
`mask_mode="keep_first_eos"` which supervises the first EOS per row.
"""

from __future__ import annotations

import functools
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from audio_transformers_tpu.core.checkpoint import (Checkpointer,
                                                    save_label_map)
from audio_transformers_tpu.core.config import (EmotionWhisperConfig,
                                                MelConfig, TrainConfig)
from audio_transformers_tpu.core.metrics import MetricLogger, StepTimer
from audio_transformers_tpu.models.whisper import emotion as emo
from audio_transformers_tpu.ops.mel import log_mel
from audio_transformers_tpu.ops.mel import precision_for as mel_precision_for
from audio_transformers_tpu.parallel.mesh import (build_mesh, replicated,
                                                  shard_batch)
from audio_transformers_tpu.train.optim import (build_optimizer,
                                                frozen_leaf_decay_mask)


def dual_loss(logits: jax.Array, emotion_logits: jax.Array,
              labels: jax.Array, emotion_labels: jax.Array, *,
              pad_token_id: int, emotion_weight: float,
              mask_mode: str = "pad") -> Dict[str, jax.Array]:
    """labels (B, T+1): full sequences; teacher forcing uses labels[:, :-1]
    as inputs and labels[:, 1:] as targets (reference train.py:195-211).
    `logits` correspond to the shifted inputs, i.e. (B, T, V)."""
    targets = labels[:, 1:]
    mask = (targets != pad_token_id)
    if mask_mode == "keep_first_eos":
        # supervise the first pad/EOS position after real tokens
        prev_real = jnp.concatenate(
            [jnp.ones_like(mask[:, :1]), mask[:, :-1]], axis=1)
        mask = mask | (prev_real & ~mask)
    per_tok = optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), targets)
    m = mask.astype(jnp.float32)
    transcription = jnp.sum(per_tok * m) / jnp.maximum(jnp.sum(m), 1.0)
    emotion = optax.softmax_cross_entropy_with_integer_labels(
        emotion_logits.astype(jnp.float32), emotion_labels).mean()
    total = transcription + emotion_weight * emotion
    acc = jnp.mean((jnp.argmax(emotion_logits, -1) == emotion_labels)
                   .astype(jnp.float32))
    return {"loss": total, "transcription_loss": transcription,
            "emotion_loss": emotion, "emotion_accuracy": acc}


def make_steps(cfg: EmotionWhisperConfig, mel_cfg: MelConfig,
               train_cfg: TrainConfig, tx):
    compute_dtype = jnp.dtype(train_cfg.compute_dtype)
    pad = cfg.whisper.pad_token_id
    # training "auto" -> flash on TPU: the fused kernels + custom-VJP
    # backward beat XLA attention for fwd+bwd (44.6 vs 59.9 ms/step,
    # whisper-tiny batch 16 on v5e); pure inference forwards resolve
    # "auto" to XLA instead (models/whisper/model.py encode).
    attn_impl = train_cfg.attn_impl
    if attn_impl == "auto":
        attn_impl = "flash" if jax.default_backend() == "tpu" else "xla"
    # eval is forward-only, where XLA attention beats the flash kernel
    # (flash's win is the fused fwd+bwd; CLAUDE.md conventions) — only an
    # explicit non-auto attn_impl overrides this
    eval_attn = train_cfg.attn_impl if train_cfg.attn_impl != "auto" \
        else "xla"

    def _forward(params, batch, *, remat, rng=None, attn=None):
        mel = log_mel(batch["waveform"], mel_cfg,
                      precision=mel_precision_for(compute_dtype)
                      ).astype(compute_dtype)
        if train_cfg.spec_augment and rng is not None:
            from audio_transformers_tpu.ops.specaugment import spec_augment
            mel = spec_augment(rng, mel)
        dec_in = batch["labels"][:, :-1]
        return emo.forward_train(params, cfg, mel, dec_in, remat=remat,
                                 attn_impl=attn or attn_impl)

    def _loss(params, batch, rng=None):
        logits, emotion_logits = _forward(params, batch,
                                          remat=train_cfg.remat, rng=rng)
        out = dual_loss(logits, emotion_logits, batch["labels"],
                        batch["emotion_labels"], pad_token_id=pad,
                        emotion_weight=train_cfg.emotion_weight)
        return out["loss"], out

    if train_cfg.spec_augment:
        # augmented variant threads a per-step PRNG key for the masks
        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, batch, rng):
            grads, metrics = jax.grad(_loss, has_aux=True)(params, batch,
                                                           rng)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, metrics
    else:
        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, batch):
            grads, metrics = jax.grad(_loss, has_aux=True)(params, batch)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, metrics

    @jax.jit
    def eval_step(params, batch):
        """Masked SUMS (not per-batch means): wrap-padded duplicate rows in
        the final eval batch must not bias val loss — it drives
        best-checkpoint selection. The aggregation to means happens over
        true sample/token counts in `evaluate`."""
        logits, emotion_logits = _forward(params, batch, remat=False,
                                          attn=eval_attn)
        targets = batch["labels"][:, 1:]
        valid = batch["valid"].astype(jnp.float32)
        tok_mask = (targets != pad).astype(jnp.float32) * valid[:, None]
        per_tok = optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), targets)
        per_emo = optax.softmax_cross_entropy_with_integer_labels(
            emotion_logits.astype(jnp.float32), batch["emotion_labels"])
        correct = (jnp.argmax(emotion_logits, -1) == batch["emotion_labels"])
        return {
            "transcription_sum": jnp.sum(per_tok * tok_mask),
            "token_count": jnp.sum(tok_mask),
            "emotion_sum": jnp.sum(per_emo * valid),
            "correct": jnp.sum(correct.astype(jnp.float32) * valid),
            "count": jnp.sum(valid),
        }

    return train_step, eval_step


def evaluate(eval_step, params, batcher, mesh, *,
             emotion_weight: float = 0.5) -> Dict[str, float]:
    sums = {"transcription_sum": 0.0, "token_count": 0.0,
            "emotion_sum": 0.0, "correct": 0.0, "count": 0.0}
    for batch in batcher.eval_batches():
        out = eval_step(params, shard_batch(batch, mesh))
        for k in sums:
            sums[k] += float(out[k])
    transcription = sums["transcription_sum"] / max(sums["token_count"], 1.0)
    emotion = sums["emotion_sum"] / max(sums["count"], 1.0)
    return {"loss": transcription + emotion_weight * emotion,
            "transcription_loss": transcription,
            "emotion_loss": emotion,
            "emotion_accuracy": sums["correct"] / max(sums["count"], 1.0)}


def train_whisper_emotion(cfg: EmotionWhisperConfig, mel_cfg: MelConfig,
                          train_cfg: TrainConfig, train_batcher, val_batcher,
                          *, init_params: Optional[dict] = None,
                          style_to_idx: Optional[dict] = None,
                          output_dir: Optional[str] = None,
                          wandb_project: Optional[str] = None,
                          logger: Optional[MetricLogger] = None) -> dict:
    mesh = build_mesh(train_cfg.mesh_shape)
    total_steps = train_batcher.steps_per_epoch * train_cfg.num_epochs
    tx = build_optimizer(train_cfg.optimizer, total_steps=total_steps,
                         decay_mask=frozen_leaf_decay_mask)

    if init_params is None:
        init_params = emo.init(jax.random.PRNGKey(train_cfg.seed), cfg)
    params = jax.device_put(init_params, replicated(mesh))
    opt_state = jax.device_put(tx.init(params), replicated(mesh))
    train_step, eval_step = make_steps(cfg, mel_cfg, train_cfg, tx)

    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        if style_to_idx:
            # artifact parity with the reference (train.py:137-141)
            save_label_map(os.path.join(output_dir, "style_to_id.txt"),
                           style_to_idx)
    ckpt = (Checkpointer(os.path.join(output_dir, "checkpoints"),
                         max_to_keep=train_cfg.keep_checkpoints,
                         best_mode="min") if output_dir else None)
    # full training state for resume (the reference can only save, never
    # resume — SURVEY.md §5 checkpoint/resume)
    resume_ckpt = (Checkpointer(os.path.join(output_dir, "resume"),
                                max_to_keep=1) if output_dir else None)
    log = logger or MetricLogger(
        log_dir=output_dir, wandb_project=wandb_project,
        config={"cfg": cfg.to_json(), "train": train_cfg.to_json()})

    best_val_loss = float("inf")
    # host-side snapshot of the best-by-val-loss params; the live `params`
    # tree is donated into train_step every step, so the final tree is the
    # LAST epoch, not the best (reference keeps best via its checkpoint,
    # whisper_finetune/train.py:129-141)
    best_params = None
    history = []
    step = 0
    start_epoch = 0
    rng = jax.random.PRNGKey(train_cfg.seed + 1)  # spec-augment mask keys
    if resume_ckpt is not None and resume_ckpt.latest_step() is not None:
        tree, meta, rstep = resume_ckpt.restore(
            like={"params": params, "opt_state": opt_state})
        params, opt_state = tree["params"], tree["opt_state"]
        params = jax.device_put(params, replicated(mesh))
        opt_state = jax.device_put(opt_state, replicated(mesh))
        start_epoch = (meta or {}).get("epoch", 0)
        best_val_loss = (meta or {}).get("best_val_loss", float("inf"))
        step = rstep
        if ckpt is not None and ckpt.best_step() is not None:
            btree, _, _ = ckpt.restore(step=ckpt.best_step(),
                                       like={"params": params})
            best_params = jax.device_get(btree["params"])
        print(f"[train] resumed from epoch {start_epoch} (step {step})")

    timer = StepTimer()
    for epoch in range(start_epoch, train_cfg.num_epochs):
        # per-epoch key derived from (seed, epoch), NOT carried across
        # epochs: a resumed run replays the exact spec-augment stream the
        # uninterrupted run would have used
        rng = jax.random.fold_in(
            jax.random.PRNGKey(train_cfg.seed + 1), epoch + 1)
        # accumulate metrics as device scalars; fetch ONCE per epoch (a
        # per-step float() would force a host sync every step)
        timer.reset()
        step_metrics = []
        n = 0
        batches = train_batcher.train_epochs(epoch=epoch)
        while True:
            t0 = time.perf_counter()
            batch = next(batches, None)
            timer.data_tick(time.perf_counter() - t0)
            if batch is None:
                break
            if train_cfg.spec_augment:
                rng, step_key = jax.random.split(rng)
                params, opt_state, m = train_step(
                    params, opt_state, shard_batch(batch, mesh), step_key)
            else:
                params, opt_state, m = train_step(params, opt_state,
                                                  shard_batch(batch, mesh))
            step_metrics.append(m)
            n += 1
            step += 1
            timer.tick(items=train_cfg.batch_size)

        # train-only rates: sync on the last step's metrics BEFORE eval
        rates = timer.rates(sync_tree=step_metrics[-1]
                            if step_metrics else None)
        acc = {k: float(sum(m[k] for m in step_metrics))
               for k in step_metrics[0]} if step_metrics else {}
        val = evaluate(eval_step, params, val_batcher, mesh,
                       emotion_weight=train_cfg.emotion_weight)
        row = {
            "epoch": epoch + 1,
            **{f"train/{k}": v / max(n, 1) for k, v in acc.items()},
            **{f"val/{k}": v for k, v in val.items()},
            "clips_per_sec": rates.get("items_per_sec", 0.0),
            "data_wait_s": rates.get("data_wait_s", 0.0),
        }
        history.append(row)
        log.log(row, step=step)

        if val["loss"] < best_val_loss:
            best_val_loss = val["loss"]
            # one host fetch, shared with the checkpoint write below
            best_params = jax.device_get(params)
            if ckpt is not None:
                ckpt.save(step, {"params": best_params},
                          metadata={"cfg": cfg.to_json(),
                                    "mel_cfg": mel_cfg.to_json(),
                                    "epoch": epoch + 1,
                                    "val_loss": val["loss"],
                                    "style_to_idx": style_to_idx},
                          best_metric=val["loss"])
        if resume_ckpt is not None:
            resume_ckpt.save(step, {"params": params,
                                    "opt_state": opt_state},
                             metadata={"epoch": epoch + 1,
                                       "best_val_loss": best_val_loss})

    if ckpt is not None:
        ckpt.close()
    if resume_ckpt is not None:
        resume_ckpt.close()
    log.finish()
    if best_params is None:  # no eval improved (e.g. zero epochs ran)
        best_params = jax.device_get(params)
    return {"params": params, "best_params": best_params,
            "opt_state": opt_state, "history": history,
            "best_val_loss": best_val_loss}
