"""Dual-loss training + emotion pooling tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_transformers_tpu.core.config import (EmotionWhisperConfig,
                                                MelConfig, OptimizerConfig,
                                                TrainConfig, WhisperConfig)
from audio_transformers_tpu.data.synthetic import SyntheticSeq2Seq
from audio_transformers_tpu.models.whisper import emotion as emo
from audio_transformers_tpu.ops.segment_pool import (masked_sequence_mean,
                                                     segment_ids_from_tokens,
                                                     segment_means)
from audio_transformers_tpu.train.whisper_emotion import dual_loss, make_steps


TINY = EmotionWhisperConfig(whisper=WhisperConfig.test(),
                            num_emotion_classes=4)


def test_dual_loss_matches_torch_reference():
    """Exact parity with the reference's loss computation
    (whisper_finetune/train.py:195-227): CE(ignore_index=pad) over shifted
    labels + weight * emotion CE."""
    import torch

    rng = np.random.default_rng(0)
    b, t1, v, c = 4, 9, 50, 5
    pad = 0
    logits = rng.standard_normal((b, t1 - 1, v)).astype(np.float32)
    labels = rng.integers(1, v, (b, t1))
    labels[0, 5:] = pad
    labels[2, 3:] = pad
    emotion_logits = rng.standard_normal((b, c)).astype(np.float32)
    emotion_labels = rng.integers(0, c, b)

    got = dual_loss(jnp.asarray(logits), jnp.asarray(emotion_logits),
                    jnp.asarray(labels), jnp.asarray(emotion_labels),
                    pad_token_id=pad, emotion_weight=0.5)

    tl = torch.nn.CrossEntropyLoss(ignore_index=pad)(
        torch.from_numpy(logits).reshape(-1, v),
        torch.from_numpy(labels[:, 1:]).reshape(-1))
    el = torch.nn.CrossEntropyLoss()(
        torch.from_numpy(emotion_logits),
        torch.from_numpy(emotion_labels))
    want = tl + 0.5 * el
    np.testing.assert_allclose(float(got["transcription_loss"]),
                               float(tl), rtol=1e-5)
    np.testing.assert_allclose(float(got["loss"]), float(want), rtol=1e-5)


def test_segment_ids_and_means_vs_python_reference():
    ts_begin, eos, p_len = 100, 1, 2
    # row: [prompt, prompt, <ts100>, A, B, <ts101>, <ts102>, C, <ts103>, eos]
    tokens = np.array([[9, 9, 100, 7, 8, 101, 102, 6, 103, 1],
                       [9, 9, 5, 6, 7, 8, 1, 0, 0, 0]], np.int32)
    lengths = np.array([10, 7], np.int32)
    seg_ids, valid = segment_ids_from_tokens(
        jnp.asarray(tokens), jnp.asarray(lengths), prompt_len=p_len,
        timestamp_begin=ts_begin, eos_token_id=eos)
    seg_ids, valid = np.asarray(seg_ids), np.asarray(valid)
    # row 0: A,B in segment 0; C in segment 1
    assert valid[0].tolist() == [False, False, False, True, True, False,
                                 False, True, False, False]
    assert seg_ids[0, 3] == seg_ids[0, 4] == 0
    assert seg_ids[0, 7] == 1
    # row 1: no timestamps -> all text in segment 0
    assert valid[1, 2:6].all() and not valid[1, 6:].any()
    assert (seg_ids[1][valid[1]] == 0).all()

    rng = np.random.default_rng(0)
    hid = rng.standard_normal((2, 10, 8)).astype(np.float32)
    means, counts = segment_means(jnp.asarray(hid), jnp.asarray(seg_ids),
                                  jnp.asarray(valid), num_segments=4)
    np.testing.assert_allclose(np.asarray(means)[0, 0],
                               hid[0, [3, 4]].mean(0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(means)[0, 1], hid[0, 7],
                               rtol=1e-5)
    assert counts[0, 0] == 2 and counts[0, 1] == 1 and counts[0, 2] == 0
    assert counts[1, 0] == 4


def test_masked_sequence_mean_fallback():
    hid = jnp.asarray(np.random.default_rng(0)
                      .standard_normal((2, 5, 3)).astype(np.float32))
    mask = jnp.asarray(np.array([[1, 1, 0, 0, 0], [0, 0, 0, 0, 0]], bool))
    out = np.asarray(masked_sequence_mean(hid, mask))
    np.testing.assert_allclose(out[0], np.asarray(hid)[0, :2].mean(0),
                               rtol=1e-5)
    np.testing.assert_allclose(out[1], np.asarray(hid)[1].mean(0), rtol=1e-5)


def test_overfit_dual_loss():
    """Transcription + emotion losses both drive down on one tiny batch."""
    from audio_transformers_tpu.train.optim import build_optimizer
    from audio_transformers_tpu.parallel.mesh import (build_mesh, replicated,
                                                      shard_batch)

    cfg = TINY
    w = cfg.whisper
    mel_cfg = MelConfig.whisper()
    # test config: max_source_positions=64 -> 128 mel frames -> 1.28 s
    duration = (2 * w.max_source_positions) * mel_cfg.hop_length \
        / mel_cfg.sample_rate
    ds = SyntheticSeq2Seq(num_samples=4, num_classes=cfg.num_emotion_classes,
                          vocab_size=w.vocab_size, max_label_len=12,
                          duration=duration, bos_id=w.decoder_start_token_id,
                          eos_id=w.eos_token_id, pad_id=w.pad_token_id)
    batch = next(ds.batcher(4).train_epochs(epoch=0))

    tcfg = TrainConfig(batch_size=4, compute_dtype="float32",
                       emotion_weight=0.5,
                       optimizer=OptimizerConfig(name="adamw",
                                                 learning_rate=1e-3,
                                                 schedule="constant"))
    tx = build_optimizer(tcfg.optimizer)
    params = emo.init(jax.random.PRNGKey(0), cfg)
    opt_state = tx.init(params)
    train_step, eval_step = make_steps(cfg, mel_cfg, tcfg, tx)

    mesh = build_mesh((("data", 1),))  # batch 4 not divisible by 8 devices
    sb = shard_batch(batch, mesh)
    params = jax.device_put(params, replicated(mesh))
    opt_state = jax.device_put(opt_state, replicated(mesh))

    first = last = None
    for i in range(120):
        params, opt_state, m = train_step(params, opt_state, sb)
        if first is None:
            first = {k: float(v) for k, v in m.items()}
        last = {k: float(v) for k, v in m.items()}
    assert last["transcription_loss"] < 1.0, (first, last)
    assert last["emotion_loss"] < 0.3 * first["emotion_loss"], (first, last)
    assert last["emotion_accuracy"] == 1.0, last


def test_segment_emotion_from_decode_fallback():
    """A decode with no timestamps falls back to sequence-level segment 0."""
    cfg = TINY
    w = cfg.whisper
    params = emo.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    decode_out = {
        "tokens": jnp.asarray(rng.integers(10, 90, (2, 12)).astype(np.int32)),
        "hiddens": jnp.asarray(rng.standard_normal((2, 12, w.d_model))
                               .astype(np.float32)),
        "lengths": jnp.asarray(np.array([12, 8], np.int32)),
    }
    out = emo.segment_emotion_from_decode(params, cfg, decode_out,
                                          prompt_len=2, max_segments=4)
    assert out["segment_logits"].shape == (2, 4, cfg.num_emotion_classes)
    assert (np.asarray(out["num_segments"]) >= 1).all()


def test_segment_emotion_no_silent_cap():
    """>16 segments survive with the default (auto-sized) buffer — the old
    fixed cap of 16 one-hotted ids >= 16 to zero and dropped them silently
    (the reference is uncapped, whisper_finetune/evaluate.py:60-94)."""
    # test config's timestamp_begin_id=4 leaves no room for text ids; use a
    # raised timestamp base so text tokens (10+s) stay below it
    cfg = EmotionWhisperConfig(
        whisper=WhisperConfig.test().replace(timestamp_begin_id=200),
        num_emotion_classes=4)
    w = cfg.whisper
    ts = w.timestamp_begin_id
    p_len = 2
    n_seg = 24
    # row: prompt then n_seg segments of <ts> text <ts>
    row = [9] * p_len
    for s in range(n_seg):
        row += [ts + 2 * s, 10 + s, ts + 2 * s + 1]
    row.append(w.eos_token_id)
    tokens = np.asarray([row], np.int32)
    L = tokens.shape[1]
    rng = np.random.default_rng(1)
    decode_out = {
        "tokens": jnp.asarray(tokens),
        "hiddens": jnp.asarray(rng.standard_normal((1, L, w.d_model))
                               .astype(np.float32)),
        "lengths": jnp.asarray([L], np.int32),
    }
    out = emo.segment_emotion_from_decode(params := emo.init(
        jax.random.PRNGKey(0), cfg), cfg, decode_out, prompt_len=p_len)
    counts = np.asarray(out["segment_counts"])[0]
    assert int(out["num_segments"][0]) == n_seg
    assert (counts[:n_seg] == 1).all() and (counts[n_seg:] == 0).all()
    # the auto cap bounds the buffer by what the decode could ever emit
    assert out["segment_logits"].shape[1] == (L - p_len) // 2 + 1
