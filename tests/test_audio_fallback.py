"""Gated third-party decode fallback (mp3/ogg/m4a via soundfile/librosa).

The first-party tier decodes wav + flac. For the other containers the
reference serves (whisper_finetune/streamlit_app.py:30,64-68, via
librosa), decode_audio_bytes routes through soundfile/librosa when
installed and raises a clear ValueError otherwise. Neither library is in
this environment, so the live path is exercised with a schema-faithful
fake module injected into sys.modules.
"""

import sys
import types

import numpy as np
import pytest

from audio_transformers_tpu.utils.audio import (decode_audio_bytes,
                                                thirdparty_formats_available)

MP3ISH = b"\xff\xfb\x90\x00" + b"\x00" * 40


def _no_real_libs():
    for mod in ("soundfile", "librosa"):
        try:
            __import__(mod)
            return False
        except ImportError:
            continue
    return True


needs_bare_env = pytest.mark.skipif(
    not _no_real_libs(), reason="a real soundfile/librosa is installed")


def _fake_soundfile(result):
    mod = types.ModuleType("soundfile")

    def read(fileobj, dtype="float64", always_2d=False):
        assert dtype == "float32"
        data, sr = result
        if isinstance(data, Exception):
            raise data
        return data, sr

    mod.read = read
    return mod


@needs_bare_env
def test_unsupported_without_libs_names_the_fix():
    assert not thirdparty_formats_available()
    with pytest.raises(ValueError, match="soundfile or librosa"):
        decode_audio_bytes(MP3ISH)


def test_fake_soundfile_serves_mp3(monkeypatch):
    mono = np.linspace(-0.5, 0.5, 100, dtype=np.float32)
    monkeypatch.setitem(sys.modules, "soundfile",
                        _fake_soundfile((mono, 22050)))
    assert thirdparty_formats_available()
    a, sr = decode_audio_bytes(MP3ISH)
    assert sr == 22050
    np.testing.assert_array_equal(a, mono)


def test_fake_soundfile_stereo_comes_back_channels_first(monkeypatch):
    stereo = np.stack([np.ones(10), -np.ones(10)], axis=1) \
        .astype(np.float32)  # soundfile layout: (frames, channels)
    monkeypatch.setitem(sys.modules, "soundfile",
                        _fake_soundfile((stereo, 16000)))
    a, sr = decode_audio_bytes(MP3ISH)
    assert a.shape == (2, 10)  # channels-first, what to_mono expects


@needs_bare_env
def test_fake_soundfile_failure_falls_through_to_clear_error(monkeypatch):
    monkeypatch.setitem(
        sys.modules, "soundfile",
        _fake_soundfile((RuntimeError("corrupt stream"), 0)))
    with pytest.raises(ValueError, match="unsupported audio container"):
        decode_audio_bytes(MP3ISH)


def test_wav_and_flac_never_touch_the_fallback(monkeypatch):
    """First-party containers must not be shadowed by a present (possibly
    wrong) third-party library."""
    import io
    import wave

    def explode(*a, **k):
        raise AssertionError("fallback consulted for a wav")

    mod = types.ModuleType("soundfile")
    mod.read = explode
    monkeypatch.setitem(sys.modules, "soundfile", mod)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(np.array([16384, -16384], dtype="<i2").tobytes())
    a, sr = decode_audio_bytes(buf.getvalue())
    assert sr == 8000
    np.testing.assert_allclose(a, [0.5, -0.5], atol=1e-4)
