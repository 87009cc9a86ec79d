"""Training-infrastructure tests: checkpoint resume, specaugment,
profiling, optimizer schedules, distributed helpers."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_transformers_tpu.core.config import (MelConfig, OptimizerConfig,
                                                TrainConfig,
                                                UrbanSoundConfig)
from audio_transformers_tpu.data.synthetic import SyntheticClassification


SMALL = UrbanSoundConfig(n_mels=64, num_classes=4, conv_dim=24,
                         encoder_dim=24, num_encoder_blocks=1, num_heads=2,
                         dropout=0.0, cnn_dims=(24,))


def _cfgs(tmp, epochs):
    return TrainConfig(
        batch_size=8, num_epochs=epochs, compute_dtype="float32",
        optimizer=OptimizerConfig(name="adam", learning_rate=1e-3,
                                  schedule="constant"),
        checkpoint_dir=os.path.join(tmp, "ckpt"),
        mesh_shape=(("data", 1),))


def test_classifier_resume(tmp_path):
    from audio_transformers_tpu.train.classifier import train_classifier

    mel_cfg = MelConfig.urbansound()
    ds_t = SyntheticClassification(num_samples=16, num_classes=4,
                                   duration=1.0, seed=1)
    ds_v = SyntheticClassification(num_samples=8, num_classes=4,
                                   duration=1.0, seed=2)
    tmp = str(tmp_path)

    # run 2 epochs, then "crash"; resume run continues to 4
    out1 = train_classifier(SMALL, mel_cfg, _cfgs(tmp, 2),
                            ds_t.batcher(8), ds_v.batcher(8))
    out2 = train_classifier(SMALL, mel_cfg, _cfgs(tmp, 4),
                            ds_t.batcher(8), ds_v.batcher(8))
    # resumed run trained only epochs 3..4
    assert [r["epoch"] for r in out2["history"]] == [3, 4]

    # uninterrupted 4-epoch run from scratch must match the resumed one
    # exactly (same seeds, epoch-indexed shuffles)
    out3 = train_classifier(SMALL, mel_cfg, _cfgs(os.path.join(tmp, "b"), 4),
                            ds_t.batcher(8), ds_v.batcher(8))
    a = out2["history"][-1]
    b = out3["history"][-1]
    np.testing.assert_allclose(a["train/loss"], b["train/loss"], rtol=1e-4)
    np.testing.assert_allclose(a["val/loss"], b["val/loss"], rtol=1e-4)


def test_spec_augment_shapes_and_masking():
    from audio_transformers_tpu.ops.specaugment import spec_augment

    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((3, 100, 80)).astype(np.float32))
    out = spec_augment(jax.random.PRNGKey(0), mel, num_time_masks=2,
                       max_time_frac=0.2, num_freq_masks=2, max_freq=10)
    assert out.shape == mel.shape
    changed = np.asarray(out != mel)
    assert changed.any()          # something masked
    assert not changed.all()      # not everything
    # masked positions hold the per-sample mean
    b, t, f = np.nonzero(changed)
    mean0 = float(jnp.mean(mel[b[0]]))
    np.testing.assert_allclose(float(out[b[0], t[0], f[0]]), mean0,
                               rtol=1e-4)


def test_spec_augment_constant_fill():
    from audio_transformers_tpu.ops.specaugment import spec_augment

    mel = jnp.ones((2, 50, 64))
    out = spec_augment(jax.random.PRNGKey(1), mel, mask_value=0.0)
    vals = np.unique(np.asarray(out))
    assert set(np.round(vals, 6)).issubset({0.0, 1.0})


def test_timed_and_trace(tmp_path):
    from audio_transformers_tpu.core.profiling import timed, trace

    f = jax.jit(lambda x: x * 2 + 1)
    x = jnp.ones((128, 128))
    res = timed(f, x, reps=3)
    assert res["mean_s"] > 0
    with trace(str(tmp_path / "tb")):
        f(x)
    assert any(os.scandir(tmp_path / "tb"))


def test_process_shard_single_host():
    from audio_transformers_tpu.parallel.distributed import (
        global_batch_to_local, process_shard)

    assert list(process_shard(10)) == list(range(10))
    assert global_batch_to_local(32) == 32


def test_linear_warmup_decay_schedule():
    from audio_transformers_tpu.train.optim import build_optimizer
    import optax

    cfg = OptimizerConfig(name="adamw", learning_rate=1.0,
                          schedule="linear_warmup_decay",
                          warmup_fraction=0.1)
    tx = build_optimizer(cfg, total_steps=100)
    params = {"w": jnp.zeros(4)}
    opt_state = tx.init(params)
    grads = {"w": jnp.ones(4)}
    # step 1..10 warmup: updates grow; later decay
    mags = []
    for _ in range(30):
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        mags.append(float(jnp.abs(updates["w"][0])))
    assert mags[1] > mags[0]        # warming up
    assert mags[-1] < max(mags)     # decaying after peak


def test_classifier_returns_best_epoch_tree(tmp_path):
    """The returned best_params/best_state must be the best-by-val-accuracy
    snapshot, not the last epoch: the live trees are donated into the jit'd
    train_step, so the loop-exit trees are the final epoch (reference keeps
    best_model.pt, urban_sounds/train_classifier.py:126-133)."""
    from audio_transformers_tpu.core.checkpoint import Checkpointer
    from audio_transformers_tpu.parallel.mesh import build_mesh, replicated
    from audio_transformers_tpu.train.classifier import (evaluate, make_steps,
                                                         train_classifier)
    from audio_transformers_tpu.train.optim import build_optimizer

    mel_cfg = MelConfig.urbansound()
    ds_t = SyntheticClassification(num_samples=16, num_classes=4,
                                   duration=1.0, seed=1)
    ds_v = SyntheticClassification(num_samples=8, num_classes=4,
                                   duration=1.0, seed=2)
    tcfg = _cfgs(str(tmp_path), 3)
    out = train_classifier(SMALL, mel_cfg, tcfg,
                           ds_t.batcher(8), ds_v.batcher(8))

    assert out["best_val_accuracy"] == max(h["val/accuracy"]
                                           for h in out["history"])
    # a fresh eval of the returned best tree reproduces best_val_accuracy
    mesh = build_mesh(tcfg.mesh_shape)
    _, eval_step = make_steps(SMALL, mel_cfg, tcfg,
                              build_optimizer(tcfg.optimizer))
    val = evaluate(eval_step,
                   jax.device_put(out["best_params"], replicated(mesh)),
                   jax.device_put(out["best_state"], replicated(mesh)),
                   ds_v.batcher(8), mesh)
    np.testing.assert_allclose(val["accuracy"], out["best_val_accuracy"],
                               rtol=1e-6)
    # and it is exactly the tree the best checkpoint holds
    ck = Checkpointer(tcfg.checkpoint_dir, best_mode="max")
    btree, _, _ = ck.restore(step=ck.best_step(),
                             like={"params": out["best_params"],
                                   "state": out["best_state"]})
    ck.close()
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(btree["params"]),
            jax.tree_util.tree_leaves_with_path(out["best_params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(pa))


def test_whisper_returns_best_params_and_restores_on_resume(tmp_path):
    """Same invariant for the whisper trainer, plus: a resumed run that
    trains zero additional epochs must still return the best snapshot
    (restored from the best checkpoint, not the resume tree)."""
    from audio_transformers_tpu.core.config import (EmotionWhisperConfig,
                                                    WhisperConfig)
    from audio_transformers_tpu.data.synthetic import SyntheticSeq2Seq
    from audio_transformers_tpu.parallel.mesh import build_mesh, replicated
    from audio_transformers_tpu.train.optim import build_optimizer
    from audio_transformers_tpu.train.whisper_emotion import (
        evaluate, make_steps, train_whisper_emotion)

    cfg = EmotionWhisperConfig(whisper=WhisperConfig.test(),
                               num_emotion_classes=4)
    w = cfg.whisper
    mel_cfg = MelConfig.whisper()
    tcfg = _cfgs(str(tmp_path / "unused"), 3)
    dur = 2 * w.max_source_positions * mel_cfg.hop_length \
        / mel_cfg.sample_rate
    mk = lambda n, seed: SyntheticSeq2Seq(
        num_samples=n, num_classes=4, vocab_size=w.vocab_size,
        max_label_len=8, duration=dur, seed=seed,
        bos_id=w.decoder_start_token_id, eos_id=w.eos_token_id,
        pad_id=w.pad_token_id)
    ds_t, ds_v = mk(16, 1), mk(8, 2)
    run_dir = str(tmp_path / "run")
    out = train_whisper_emotion(cfg, mel_cfg, tcfg, ds_t.batcher(8),
                                ds_v.batcher(8), output_dir=run_dir)

    assert out["best_val_loss"] == min(h["val/loss"] for h in out["history"])
    mesh = build_mesh(tcfg.mesh_shape)
    _, eval_step = make_steps(cfg, mel_cfg, tcfg,
                              build_optimizer(tcfg.optimizer))
    val = evaluate(eval_step,
                   jax.device_put(out["best_params"], replicated(mesh)),
                   ds_v.batcher(8), mesh,
                   emotion_weight=tcfg.emotion_weight)
    np.testing.assert_allclose(val["loss"], out["best_val_loss"], rtol=1e-5)

    # resume with the same num_epochs: no epochs run, no improvement seen,
    # yet best_params must come back (from the best checkpoint on disk)
    out2 = train_whisper_emotion(cfg, mel_cfg, tcfg, ds_t.batcher(8),
                                 ds_v.batcher(8), output_dir=run_dir)
    assert out2["history"] == []
    assert out2["best_val_loss"] == out["best_val_loss"]
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(out2["best_params"]),
            jax.tree_util.tree_leaves_with_path(out["best_params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(pa))


class TestConfigKnobs:
    """Every TrainConfig/UrbanSoundConfig knob must turn something
    (round-1 finding: norm_type/spec_augment existed unread)."""

    def test_group_norm_trains_and_matches_dp(self):
        import jax
        import jax.numpy as jnp

        from audio_transformers_tpu.core.config import UrbanSoundConfig
        from audio_transformers_tpu.models import urbansound
        from audio_transformers_tpu.parallel.mesh import (build_mesh,
                                                          replicated,
                                                          shard_batch)

        cfg = UrbanSoundConfig(n_mels=8, conv_dim=16, encoder_dim=16,
                               num_encoder_blocks=1, num_heads=2,
                               cnn_dims=(16,), dropout=0.0,
                               norm_type="group")
        params, state = urbansound.init(jax.random.PRNGKey(0), cfg)
        assert state["bn1"] == {}  # group norm carries no running stats
        rng = np.random.default_rng(0)
        mel = jnp.asarray(rng.standard_normal((8, 20, 8)).astype(np.float32))

        # single-device forward == DP-sharded forward (group norm is
        # per-sample, so no cross-replica coupling at all)
        logits, _ = urbansound.apply(params, state, cfg, mel, training=True)
        mesh = build_mesh()
        with mesh:
            p = jax.device_put(params, replicated(mesh))
            s = jax.device_put(state, replicated(mesh))
            sharded, = shard_batch((mel,), mesh)
            dp_logits, _ = jax.jit(
                lambda p, s, m: urbansound.apply(p, s, cfg, m,
                                                 training=True))(p, s, sharded)
        np.testing.assert_allclose(np.asarray(logits),
                                   np.asarray(dp_logits), rtol=2e-5,
                                   atol=2e-5)

    def test_bad_norm_type_rejected(self):
        import jax
        import pytest as _pytest

        from audio_transformers_tpu.core.config import UrbanSoundConfig
        from audio_transformers_tpu.models import urbansound

        with _pytest.raises(ValueError):
            urbansound.init(jax.random.PRNGKey(0),
                            UrbanSoundConfig(norm_type="instance"))

    def test_spec_augment_train_path(self):
        """spec_augment=True threads a key through the jit'd whisper train
        step and still reduces loss on one repeated batch."""
        import jax

        from audio_transformers_tpu.core.config import (EmotionWhisperConfig,
                                                        MelConfig,
                                                        OptimizerConfig,
                                                        TrainConfig,
                                                        WhisperConfig)
        from audio_transformers_tpu.data.synthetic import SyntheticSeq2Seq
        from audio_transformers_tpu.models.whisper import emotion as emo
        from audio_transformers_tpu.train.optim import build_optimizer
        from audio_transformers_tpu.train.whisper_emotion import make_steps

        cfg = EmotionWhisperConfig(whisper=WhisperConfig.test(),
                                   num_emotion_classes=4)
        w = cfg.whisper
        mel_cfg = MelConfig.whisper()
        tcfg = TrainConfig(batch_size=4, compute_dtype="float32",
                           spec_augment=True,
                           optimizer=OptimizerConfig(learning_rate=3e-3,
                                                     schedule="constant"))
        dur = 2 * w.max_source_positions * mel_cfg.hop_length \
            / mel_cfg.sample_rate
        ds = SyntheticSeq2Seq(num_samples=4, num_classes=4,
                              vocab_size=w.vocab_size, max_label_len=8,
                              duration=dur, bos_id=w.decoder_start_token_id,
                              eos_id=w.eos_token_id, pad_id=w.pad_token_id)
        batch = next(ds.batcher(4).train_epochs(epoch=0))
        tx = build_optimizer(tcfg.optimizer)
        params = emo.init(jax.random.PRNGKey(0), cfg)
        opt_state = tx.init(params)
        train_step, _ = make_steps(cfg, mel_cfg, tcfg, tx)

        rng = jax.random.PRNGKey(1)
        losses = []
        for i in range(8):
            rng, k = jax.random.split(rng)
            params, opt_state, m = train_step(params, opt_state,
                                              dict(batch), k)
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]


def test_adamw_decay_mask_spares_frozen_encoder_positions():
    """weight_decay > 0 must never shrink the frozen encoder positional
    table (grads are stop_gradient'd to zero, but decoupled decay is
    applied regardless unless masked — it would silently corrupt imported
    HF positions)."""
    import optax

    from audio_transformers_tpu.core.config import (EmotionWhisperConfig,
                                                    WhisperConfig)
    from audio_transformers_tpu.models.whisper import emotion as emo
    from audio_transformers_tpu.train.optim import (build_optimizer,
                                                    frozen_leaf_decay_mask)

    cfg = EmotionWhisperConfig(whisper=WhisperConfig.test(),
                               num_emotion_classes=4)
    params = emo.init(jax.random.PRNGKey(0), cfg)
    tx = build_optimizer(
        OptimizerConfig(name="adamw", learning_rate=1e-2,
                        weight_decay=0.1, schedule="constant"),
        decay_mask=frozen_leaf_decay_mask)
    opt_state = tx.init(params)
    zeros = jax.tree.map(jnp.zeros_like, params)
    updates, _ = tx.update(zeros, opt_state, params)
    new = optax.apply_updates(params, updates)

    pos_before = np.asarray(params["whisper"]["encoder"]["pos"])
    pos_after = np.asarray(new["whisper"]["encoder"]["pos"])
    np.testing.assert_array_equal(pos_after, pos_before)
    # ...while a trainable leaf does decay under zero grads
    w_before = np.asarray(params["emotion_head"]["w"])
    w_after = np.asarray(new["emotion_head"]["w"])
    assert np.abs(w_after - w_before).max() > 0
