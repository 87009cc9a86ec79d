"""Whisper model parity tests vs torch/HF (random weights — the environment
has no network, so architecture parity is established by importing a
randomly initialized `WhisperForConditionalGeneration` state dict and
comparing fp32 logits; pretrained weights then import through the exact
same path).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_transformers_tpu.core.config import WhisperConfig
from audio_transformers_tpu.models import whisper as whisper_model
from audio_transformers_tpu.models.whisper.load import (config_from_hf,
                                                        from_torch_state_dict)


@pytest.fixture(scope="module")
def hf_pair():
    import torch
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration

    hf_cfg = HFConfig(
        vocab_size=500, num_mel_bins=80, d_model=64,
        encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_ffn_dim=128, decoder_ffn_dim=128,
        max_source_positions=50, max_target_positions=24,
        pad_token_id=0, bos_token_id=0, eos_token_id=0,
        decoder_start_token_id=1,
    )
    torch.manual_seed(0)
    tm = WhisperForConditionalGeneration(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg)
    params, emotion = from_torch_state_dict(tm.state_dict(), cfg)
    return tm, cfg, params


def _mel(batch, t, n_mels, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((batch, t, n_mels)).astype(np.float32)


class TestTorchParity:
    def test_encoder_parity(self, hf_pair):
        import torch
        tm, cfg, params = hf_pair
        mel = _mel(2, 2 * cfg.max_source_positions, cfg.n_mels)
        ours = whisper_model.encode(params, cfg, jnp.asarray(mel))
        with torch.no_grad():
            theirs = tm.model.encoder(
                torch.from_numpy(mel.transpose(0, 2, 1))
            ).last_hidden_state.numpy()
        assert ours.shape == theirs.shape
        np.testing.assert_allclose(np.asarray(ours), theirs,
                                   rtol=2e-4, atol=2e-5)

    def test_decoder_logits_parity(self, hf_pair):
        import torch
        tm, cfg, params = hf_pair
        mel = _mel(2, 2 * cfg.max_source_positions, cfg.n_mels, seed=1)
        rng = np.random.default_rng(2)
        tokens = rng.integers(2, cfg.vocab_size,
                              (2, 10)).astype(np.int32)

        enc = whisper_model.encode(params, cfg, jnp.asarray(mel))
        hidden = whisper_model.apply_decoder(params, cfg, enc,
                                             jnp.asarray(tokens))
        ours = whisper_model.logits_from_hidden(params, hidden)

        with torch.no_grad():
            out = tm(input_features=torch.from_numpy(mel.transpose(0, 2, 1)),
                     decoder_input_ids=torch.from_numpy(tokens.astype(np.int64)))
        np.testing.assert_allclose(np.asarray(ours), out.logits.numpy(),
                                   rtol=2e-4, atol=2e-4)

    def test_incremental_matches_full(self, hf_pair):
        """KV-cached step-by-step decode == full-sequence teacher forcing."""
        _, cfg, params = hf_pair
        mel = _mel(2, 2 * cfg.max_source_positions, cfg.n_mels, seed=3)
        rng = np.random.default_rng(4)
        tokens = jnp.asarray(rng.integers(2, cfg.vocab_size,
                                          (2, 8)).astype(np.int32))

        enc = whisper_model.encode(params, cfg, jnp.asarray(mel))
        full_hidden = whisper_model.apply_decoder(params, cfg, enc, tokens)

        cross = whisper_model.precompute_cross_attention(params, cfg, enc)
        cache = whisper_model.init_cache(cfg, batch=2, max_len=16)
        step = jax.jit(lambda tok, c: whisper_model.apply_decoder_step(
            params, cfg, tok, c, cross))
        hiddens = []
        for t in range(tokens.shape[1]):
            h, cache = step(tokens[:, t], cache)
            hiddens.append(h)
        inc_hidden = jnp.stack(hiddens, axis=1)
        np.testing.assert_allclose(np.asarray(inc_hidden),
                                   np.asarray(full_hidden),
                                   rtol=2e-4, atol=2e-5)


def test_init_structure_matches_import(hf_pair):
    """init() must produce the same pytree structure as the HF import, so
    training-from-scratch and fine-tuning share all code paths."""
    _, cfg, imported = hf_pair
    ours = whisper_model.init(jax.random.PRNGKey(0), cfg)
    ts1 = jax.tree.structure(ours)
    ts2 = jax.tree.structure(imported)
    assert ts1 == ts2
    for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_flatten_with_path(ours)[0],
            jax.tree_util.tree_flatten_with_path(imported)[0]):
        assert a.shape == b.shape, (p1, a.shape, b.shape)


def test_tiny_config_param_count():
    """whisper-tiny ~= 37.8M params incl. emotion head (SURVEY.md §6)."""
    cfg = WhisperConfig.tiny()
    params = whisper_model.init(jax.random.PRNGKey(0), cfg)
    from audio_transformers_tpu.core.pytree import param_count
    n = param_count(params)
    assert 35_000_000 < n < 40_000_000, n


@pytest.mark.parametrize("name,params_m", [
    ("tiny", 37.8), ("base", 72.6), ("small", 241.7), ("medium", 763.9),
])
def test_size_presets_param_counts(name, params_m):
    """Parameter counts match the published whisper sizes (+-3%, incl. the
    emotion head excluded here)."""
    from audio_transformers_tpu.core.pytree import param_count

    cfg = WhisperConfig.by_name(name)
    params = whisper_model.init(jax.random.PRNGKey(0), cfg)
    n = param_count(params) / 1e6
    assert abs(n - params_m) / params_m < 0.03, (name, n)


def test_v3_token_ids_derived_everywhere():
    """large-v3 (vocab 51866) inserts <|yue|> at 50358, shifting later
    specials +1 — every config-building path must agree (a hardcoded v2
    id decodes v3 checkpoints with <|nospeech|> in the prompt)."""
    from audio_transformers_tpu.models.whisper.decode import (
        default_suppress_ids)
    from audio_transformers_tpu.models.whisper.load import config_from_json

    v3 = WhisperConfig.large_v3()
    assert (v3.no_timestamps_token_id, v3.timestamp_begin_id,
            v3.transcribe_token_id) == (50364, 50365, 50360)

    loaded = config_from_json({"vocab_size": 51866, "num_mel_bins": 128,
                               "d_model": 1280, "encoder_layers": 32,
                               "decoder_layers": 32,
                               "encoder_attention_heads": 20,
                               "encoder_ffn_dim": 5120})
    assert (loaded.no_timestamps_token_id, loaded.timestamp_begin_id,
            loaded.transcribe_token_id) == (50364, 50365, 50360)

    v2 = WhisperConfig.tiny()
    s2, s3 = default_suppress_ids(v2), default_suppress_ids(v3)
    assert len(s2) == len(s3)
    # text tokens unchanged, post-<|yue|> specials shifted +1
    assert all((b == a + 1 if a >= 50358 else b == a)
               for a, b in zip(s2, s3))
    assert 50362 in s2 and 50363 in s3  # <|nospeech|> in each vocab


def test_encoder_positional_table_is_frozen():
    """HF freezes WhisperEncoder.embed_positions; the table lives in our
    params only for import parity, so its gradient must be zero."""
    cfg = WhisperConfig.test()
    params = whisper_model.init(jax.random.PRNGKey(0), cfg)
    mel = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 2 * cfg.max_source_positions, cfg.n_mels)).astype(np.float32))

    def loss(p):
        return jnp.sum(whisper_model.encode(p, cfg, mel) ** 2)

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["encoder"]["pos"]).max()) == 0.0
    # the rest of the encoder still trains
    assert float(jnp.abs(g["encoder"]["conv1"]["w"]).max()) > 0.0
