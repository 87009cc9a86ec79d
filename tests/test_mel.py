"""Golden-value tests for the mel front-end.

Strategy (SURVEY.md §4 prescription (a)): validate our numpy reference
against independent implementations (HF WhisperFeatureExtractor for the
whisper parameterization; torch.stft + transformers.audio_utils filterbanks
for the torchaudio/urbansound parameterization), then validate the XLA and
Pallas paths against the numpy reference.
"""

import numpy as np
import pytest

from audio_transformers_tpu.core.config import MelConfig
from audio_transformers_tpu.ops import mel as mel_ops


def _sine_noise(num_samples: int, sr: int, seed: int = 0) -> np.ndarray:
    """Deterministic test clip, same spirit as the reference's synthetic
    self-test audio (reference: whisper_finetune/inference.py:243-258)."""
    rng = np.random.default_rng(seed)
    t = np.arange(num_samples) / sr
    wav = (0.5 * np.sin(2 * np.pi * 440.0 * t)
           + 0.2 * np.sin(2 * np.pi * 1337.0 * t)
           + 0.05 * rng.standard_normal(num_samples))
    return wav.astype(np.float32)


# ---------------------------------------------------------------------------
# numpy reference vs independent third-party implementations
# ---------------------------------------------------------------------------


class TestGoldenWhisper:
    def test_matches_hf_feature_extractor(self):
        from transformers import WhisperFeatureExtractor

        cfg = MelConfig.whisper()
        sr = cfg.sample_rate
        wav = _sine_noise(sr * 3, sr)

        fe = WhisperFeatureExtractor()  # defaults == whisper-tiny: 80 mels
        got_hf = fe(wav, sampling_rate=sr, return_tensors="np").input_features[0]
        # HF pads/truncates to 30 s; do the same here.
        padded = np.zeros(sr * 30, np.float32)
        padded[: len(wav)] = wav
        got_ours = mel_ops.reference_log_mel(padded, cfg).T  # (n_mels, T)

        assert got_ours.shape == got_hf.shape == (80, 3000)
        np.testing.assert_allclose(got_ours, got_hf, atol=2e-5, rtol=1e-5)

    def test_filterbank_matches_hf_slaney(self):
        from transformers.audio_utils import mel_filter_bank as hf_fb

        cfg = MelConfig.whisper()
        ours = mel_ops.mel_filter_bank(cfg)
        theirs = hf_fb(
            num_frequency_bins=cfg.n_freqs,
            num_mel_filters=cfg.n_mels,
            min_frequency=0.0,
            max_frequency=8000.0,
            sampling_rate=cfg.sample_rate,
            norm="slaney",
            mel_scale="slaney",
        )
        np.testing.assert_allclose(ours, theirs, atol=1e-7)


class TestGoldenUrbansound:
    """torchaudio isn't installed; reconstruct its semantics from torch.stft
    + the HTK filterbank (torchaudio MelSpectrogram = spectrogram(power=2,
    hann, center/reflect) @ melscale_fbanks(htk, norm=None))."""

    def test_filterbank_matches_hf_htk(self):
        from transformers.audio_utils import mel_filter_bank as hf_fb

        cfg = MelConfig.urbansound()
        ours = mel_ops.mel_filter_bank(cfg)
        theirs = hf_fb(
            num_frequency_bins=cfg.n_freqs,
            num_mel_filters=cfg.n_mels,
            min_frequency=0.0,
            max_frequency=cfg.sample_rate / 2.0,
            sampling_rate=cfg.sample_rate,
            norm=None,
            mel_scale="htk",
        )
        np.testing.assert_allclose(ours, theirs, atol=1e-6)

    def test_stft_power_matches_torch(self):
        import torch

        cfg = MelConfig.urbansound()
        wav = _sine_noise(int(cfg.sample_rate * 4.0), cfg.sample_rate)

        spec = torch.stft(
            torch.from_numpy(wav), n_fft=cfg.n_fft,
            hop_length=cfg.hop_length,
            window=torch.hann_window(cfg.n_fft, periodic=True),
            center=True, pad_mode="reflect", normalized=False,
            onesided=True, return_complex=True,
        )
        torch_power = spec.abs().pow(2).numpy().T  # (T, n_freqs)

        mel_cfg = cfg.replace(log_mode="none")
        ours_mel = mel_ops.reference_log_mel(wav, mel_cfg)
        torch_mel = torch_power @ mel_ops.mel_filter_bank(cfg)
        np.testing.assert_allclose(ours_mel, torch_mel, rtol=1e-4, atol=1e-3)

    def test_full_log_mel_matches_torch_pipeline(self):
        import torch

        cfg = MelConfig.urbansound()
        wav = _sine_noise(int(cfg.sample_rate * 4.0), cfg.sample_rate)
        spec = torch.stft(
            torch.from_numpy(wav), n_fft=cfg.n_fft, hop_length=cfg.hop_length,
            window=torch.hann_window(cfg.n_fft, periodic=True),
            center=True, pad_mode="reflect", normalized=False,
            onesided=True, return_complex=True,
        )
        power = spec.abs().pow(2).numpy().T
        torch_logmel = np.log(power @ mel_ops.mel_filter_bank(cfg) + 1e-9)
        ours = mel_ops.reference_log_mel(wav, cfg)
        assert ours.shape == (173, 64)  # 4 s @ 22.05 kHz, hop 512, center
        np.testing.assert_allclose(ours, torch_logmel, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# XLA / Pallas paths vs the numpy reference
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("cfg,secs", [
    (MelConfig.whisper(), 2.0),
    (MelConfig.urbansound(), 4.0),
])
class TestDevicePaths:
    def _batch(self, cfg, secs, batch=3):
        n = int(cfg.sample_rate * secs)
        return np.stack([_sine_noise(n, cfg.sample_rate, seed=i)
                         for i in range(batch)])

    def test_xla_matches_reference(self, cfg, secs):
        wavs = self._batch(cfg, secs)
        got = np.asarray(mel_ops.log_mel_xla(wavs, cfg))
        for i in range(wavs.shape[0]):
            want = mel_ops.reference_log_mel(wavs[i], cfg)
            np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-4)

    def test_pallas_matches_xla(self, cfg, secs):
        from audio_transformers_tpu.ops.mel_pallas import log_mel_pallas

        wavs = self._batch(cfg, secs, batch=2)
        want = np.asarray(mel_ops.log_mel_xla(wavs, cfg))
        got = np.asarray(log_mel_pallas(wavs, cfg))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_precision_high_close_to_highest(self, cfg, secs):
        """precision="high" (3-pass bf16 matmuls; used by bf16 pipelines
        via mel.precision_for) must stay within a small fraction of one
        bf16 ulp of the exact features, on both implementations. The
        Pallas path emulates HIGH with a manual hi/lo bf16 split (Mosaic
        rejects Precision.HIGH), so this also covers that decomposition
        in interpret mode."""
        from audio_transformers_tpu.ops.mel_pallas import log_mel_pallas

        wavs = self._batch(cfg, secs, batch=2)
        want = np.asarray(mel_ops.log_mel_xla(wavs, cfg, "highest"))
        for got in (np.asarray(mel_ops.log_mel_xla(wavs, cfg, "high")),
                    np.asarray(log_mel_pallas(wavs, cfg,
                                              precision="high"))):
            np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)



def test_precision_for():
    import jax.numpy as jnp
    assert mel_ops.precision_for(jnp.bfloat16) == "high"
    assert mel_ops.precision_for(jnp.float16) == "high"
    assert mel_ops.precision_for(jnp.float32) == "highest"


def test_frame_count_whisper_30s():
    cfg = MelConfig.whisper()
    assert cfg.num_frames(cfg.sample_rate * 30) == 3000


def test_short_clip_does_not_crash():
    """Clips shorter than one FFT window are zero-padded instead of
    crashing reflect-pad."""
    cfg = MelConfig.whisper()
    wav = np.zeros((2, 150), np.float32)  # < n_fft//2
    out = np.asarray(mel_ops.log_mel_xla(wav, cfg))
    assert out.shape[2] == cfg.n_mels and np.isfinite(out).all()
    from audio_transformers_tpu.ops.mel_pallas import log_mel_pallas
    out2 = np.asarray(log_mel_pallas(wav, cfg))
    assert np.isfinite(out2).all()
