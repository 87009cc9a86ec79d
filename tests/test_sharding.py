"""Sharding/parallelism tests on the virtual 8-device CPU mesh:
tensor-parallel parameter placement, DP decode, bf16 training step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from audio_transformers_tpu.core.config import (DecodeConfig,
                                                EmotionWhisperConfig,
                                                MelConfig, OptimizerConfig,
                                                TrainConfig, WhisperConfig)
from audio_transformers_tpu.data.synthetic import SyntheticSeq2Seq
from audio_transformers_tpu.models import whisper as wm
from audio_transformers_tpu.models.whisper import decode as wdecode
from audio_transformers_tpu.models.whisper import emotion as emo
from audio_transformers_tpu.parallel.mesh import (build_mesh, replicated,
                                                  shard_batch)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 fake devices")

TINY = EmotionWhisperConfig(whisper=WhisperConfig.test(),
                            num_emotion_classes=4)


def test_tensor_parallel_forward_matches_replicated():
    """TP-sharded params (model axis) produce the same logits as
    replicated params — the sharding is a layout, not a semantic change."""
    mesh = build_mesh((("data", 4), ("model", 2)))
    params = emo.init(jax.random.PRNGKey(0), TINY)
    axes = emo.param_axes(params)
    w = TINY.whisper

    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal(
        (4, 2 * w.max_source_positions, w.n_mels)).astype(np.float32))
    toks = jnp.asarray(rng.integers(2, w.vocab_size, (4, 6)).astype(np.int32))

    def fwd(p, mel, toks):
        return emo.forward_train(p, TINY, mel, toks)[0]

    want = np.asarray(jax.jit(fwd)(params, mel, toks))

    with mesh:
        p_tp = jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            params, axes)
        mel_s = jax.device_put(mel, NamedSharding(mesh, P("data", None, None)))
        toks_s = jax.device_put(toks, NamedSharding(mesh, P("data", None)))
        got = np.asarray(jax.jit(fwd)(p_tp, mel_s, toks_s))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_decode_under_data_parallel_sharding():
    """Batched greedy decode with the batch sharded over 8 devices equals
    the single-device decode token-for-token."""
    mesh = build_mesh()
    w = TINY.whisper
    params = emo.init(jax.random.PRNGKey(1), TINY)["whisper"]
    rng = np.random.default_rng(1)
    mel = jnp.asarray(rng.standard_normal(
        (8, 2 * w.max_source_positions, w.n_mels)).astype(np.float32))
    dcfg = DecodeConfig(max_new_tokens=10, no_repeat_ngram_size=3)
    prompt = (w.decoder_start_token_id,)

    enc = wm.encode(params, w, mel)
    want = np.asarray(wdecode.generate(params, w, dcfg, enc, prompt=prompt,
                                       begin_suppress_ids=())["tokens"])

    enc_s = jax.device_put(enc, NamedSharding(mesh, P("data", None, None)))
    p_rep = jax.device_put(params, replicated(mesh))
    got = np.asarray(wdecode.generate(p_rep, w, dcfg, enc_s, prompt=prompt,
                                      begin_suppress_ids=())["tokens"])
    np.testing.assert_array_equal(got, want)


def test_decode_under_tensor_parallel_sharding():
    """KV-cached greedy decode with the PARAMS tensor-parallel over the
    model axis (and the batch over data) equals the replicated decode
    token-for-token — the serving layout end-to-end, including the fused
    step-param preparation (qkv concat) and the cross-KV precompute."""
    mesh = build_mesh((("data", 4), ("model", 2)))
    w = TINY.whisper
    full = emo.init(jax.random.PRNGKey(2), TINY)
    axes = emo.param_axes(full)
    params = full["whisper"]
    rng = np.random.default_rng(2)
    mel = jnp.asarray(rng.standard_normal(
        (4, 2 * w.max_source_positions, w.n_mels)).astype(np.float32))
    dcfg = DecodeConfig(max_new_tokens=10, no_repeat_ngram_size=3,
                        repetition_penalty=1.15)
    prompt = (w.decoder_start_token_id,)

    enc = wm.encode(params, w, mel)
    want = np.asarray(wdecode.generate(params, w, dcfg, enc, prompt=prompt,
                                       begin_suppress_ids=())["tokens"])

    with mesh:
        p_tp = jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            params, axes["whisper"])
        enc_s = jax.device_put(
            enc, NamedSharding(mesh, P("data", None, None)))
        got = np.asarray(wdecode.generate(p_tp, w, dcfg, enc_s,
                                          prompt=prompt,
                                          begin_suppress_ids=())["tokens"])
    np.testing.assert_array_equal(got, want)


def test_beam_decode_under_data_parallel_sharding():
    """Beam search with the batch sharded over 8 devices equals the
    single-device beam decode token-for-token — the beam state (scores,
    hypothesis buffers, per-step cache reorder) is all batch-major, so
    DP sharding is a layout."""
    from audio_transformers_tpu.models.whisper import beam as wbeam

    mesh = build_mesh()
    w = TINY.whisper
    params = emo.init(jax.random.PRNGKey(3), TINY)["whisper"]
    rng = np.random.default_rng(3)
    mel = jnp.asarray(rng.standard_normal(
        (8, 2 * w.max_source_positions, w.n_mels)).astype(np.float32))
    dcfg = DecodeConfig(max_new_tokens=8, num_beams=3,
                        repetition_penalty=1.15)
    prompt = (w.decoder_start_token_id,)

    enc = wm.encode(params, w, mel)
    want = wbeam.generate_beam(params, w, dcfg, enc, prompt=prompt,
                               begin_suppress_ids=())

    enc_s = jax.device_put(enc, NamedSharding(mesh, P("data", None, None)))
    p_rep = jax.device_put(params, replicated(mesh))
    got = wbeam.generate_beam(p_rep, w, dcfg, enc_s, prompt=prompt,
                              begin_suppress_ids=())
    np.testing.assert_array_equal(np.asarray(got["tokens"]),
                                  np.asarray(want["tokens"]))
    np.testing.assert_array_equal(np.asarray(got["lengths"]),
                                  np.asarray(want["lengths"]))


def test_bf16_train_step_runs():
    """bf16 compute through grad (the conv-VJP dtype bug class only
    appears under jax.grad with mixed precision)."""
    from audio_transformers_tpu.train.optim import build_optimizer
    from audio_transformers_tpu.train.whisper_emotion import make_steps

    mel_cfg = MelConfig.whisper()
    w = TINY.whisper
    duration = (2 * w.max_source_positions) * mel_cfg.hop_length \
        / mel_cfg.sample_rate
    ds = SyntheticSeq2Seq(num_samples=8, num_classes=4,
                          vocab_size=w.vocab_size, max_label_len=10,
                          duration=duration,
                          bos_id=w.decoder_start_token_id,
                          eos_id=w.eos_token_id, pad_id=w.pad_token_id)
    batch = next(ds.batcher(8).train_epochs(epoch=0))

    tcfg = TrainConfig(batch_size=8, compute_dtype="bfloat16",
                       optimizer=OptimizerConfig(name="adamw",
                                                 learning_rate=1e-4,
                                                 schedule="constant"))
    tx = build_optimizer(tcfg.optimizer)
    params = emo.init(jax.random.PRNGKey(0), TINY)
    opt_state = tx.init(params)
    train_step, _ = make_steps(TINY, mel_cfg, tcfg, tx)

    mesh = build_mesh()
    sb = shard_batch(batch, mesh)
    params = jax.device_put(params, replicated(mesh))
    opt_state = jax.device_put(opt_state, replicated(mesh))
    params, opt_state, m = train_step(params, opt_state, sb)
    assert np.isfinite(float(m["loss"]))
    # params stay fp32 after the update
    assert params["whisper"]["decoder"]["embed"]["table"].dtype == jnp.float32


def test_classifier_bf16_grad():
    from audio_transformers_tpu.core.config import UrbanSoundConfig
    from audio_transformers_tpu.data.synthetic import SyntheticClassification
    from audio_transformers_tpu.train.classifier import make_steps
    from audio_transformers_tpu.train.optim import build_optimizer

    cfg = UrbanSoundConfig(n_mels=64, num_classes=4, conv_dim=24,
                           encoder_dim=24, num_encoder_blocks=1,
                           num_heads=2, dropout=0.1, cnn_dims=(24,))
    mel_cfg = MelConfig.urbansound()
    tcfg = TrainConfig(batch_size=8, compute_dtype="bfloat16",
                       optimizer=OptimizerConfig(name="adam",
                                                 learning_rate=1e-3,
                                                 schedule="constant"))
    ds = SyntheticClassification(num_samples=8, num_classes=4, duration=1.0)
    batch = next(ds.batcher(8).train_epochs(epoch=0))
    tx = build_optimizer(tcfg.optimizer)
    from audio_transformers_tpu.models import urbansound
    params, state = urbansound.init(jax.random.PRNGKey(0), cfg)
    opt_state = tx.init(params)
    train_step, _ = make_steps(cfg, mel_cfg, tcfg, tx)
    mesh = build_mesh()
    sb = shard_batch(batch, mesh)
    params = jax.device_put(params, replicated(mesh))
    state = jax.device_put(state, replicated(mesh))
    opt_state = jax.device_put(opt_state, replicated(mesh))
    params, state, opt_state, m = train_step(params, state, opt_state, sb,
                                             jax.random.PRNGKey(2))
    assert np.isfinite(float(m["loss"]))


def test_graft_entry_dryrun_multichip_in_process():
    """The driver's multichip check must work when invoked
    programmatically (round-1 regression: it asserted on device count
    instead of bootstrapping a mesh). With 8 fake devices present this
    exercises the in-process path; the subprocess fallback re-execs into
    exactly this configuration."""
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # raises on failure


def test_graft_entry_strip_host_count_flag():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    assert g._strip_host_count_flag(
        "--xla_force_host_platform_device_count=8") == ""
    assert g._strip_host_count_flag(
        "--a=1 --xla_force_host_platform_device_count=4 --b=2"
    ) == "--a=1  --b=2"
    assert g._strip_host_count_flag("") == ""
