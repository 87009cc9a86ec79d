"""First-party FLAC decoder tests (native/audiodec/flac.cpp).

FLAC is lossless, so the test encoder (tests/flac_encoder.py — real
streams with correct CRCs) gives exact golden coverage with no reference
decoder in the environment: decode(encode(x)) must equal x bit-for-bit
after the int16 -> float32 scale. Capability replaced:
reference streamlit_app.py:30,64-68 (librosa/libsndfile flac path).
"""

import os
import tempfile

import numpy as np
import pytest

from flac_encoder import encode_flac, write_flac

from audio_transformers_tpu.data import native_loader as nl
from audio_transformers_tpu.utils.audio import (decode_audio_bytes,
                                                read_audio, synth_clip,
                                                write_wav)

pytestmark = pytest.mark.skipif(not nl.available(),
                                reason="libaudiodec not built")


def _pcm(duration=1.0, sr=16000, seed=0):
    wav = synth_clip(duration, sr, seed=seed)
    return np.clip(wav * 32767.0, -32768, 32767).astype(np.int16)


class TestRoundTrip:
    @pytest.mark.parametrize("mode", ["fixed0", "fixed1", "fixed2", "lpc",
                                      "verbatim"])
    def test_mono_subframe_types(self, mode):
        pcm = _pcm(0.7)
        dec, sr = nl.decode_flac(encode_flac(pcm, 16000, mode=mode))
        assert sr == 16000
        np.testing.assert_array_equal(
            dec, (pcm.astype(np.float32) / 32768.0))

    @pytest.mark.parametrize("stereo", ["independent", "left_side",
                                        "mid_side"])
    def test_stereo_decorrelation(self, stereo):
        sr = 22050
        n = sr + 371  # partial last block
        left = _pcm(0, sr)  # placeholder, build explicitly below
        rng = np.random.default_rng(4)
        t = np.arange(n) / sr
        left = np.clip((0.4 * np.sin(2 * np.pi * 440 * t)
                        + 0.05 * rng.standard_normal(n)) * 32767,
                       -32768, 32767).astype(np.int16)
        right = np.clip((0.3 * np.sin(2 * np.pi * 660 * t)
                         + 0.05 * rng.standard_normal(n)) * 32767,
                        -32768, 32767).astype(np.int16)
        st = np.stack([left, right], 1)
        dec, sr_out = nl.decode_flac(encode_flac(st, sr, stereo=stereo))
        assert sr_out == sr and len(dec) == n
        # the native decoder mixes to mono mean, matching adc_decode_wav
        ref = ((left.astype(np.float64) + right.astype(np.float64)) / 2
               / 32768.0).astype(np.float32)
        np.testing.assert_allclose(dec, ref, atol=1e-6)

    def test_partitioned_and_escaped_residuals(self):
        pcm = _pcm(0.9, seed=2)
        for kw in ({"partition_order": 2}, {"escape": True}):
            dec, _ = nl.decode_flac(encode_flac(pcm, 16000, **kw))
            np.testing.assert_array_equal(
                dec, pcm.astype(np.float32) / 32768.0)

    def test_constant_subframe(self):
        pcm = np.full(5000, -77, np.int16)
        dec, sr = nl.decode_flac(
            encode_flac(pcm, 8000, mode="constant", block_size=2048))
        assert sr == 8000
        np.testing.assert_allclose(dec, -77 / 32768.0, atol=1e-7)

    def test_corrupt_stream_rejected(self):
        with pytest.raises(ValueError):
            nl.decode_flac(b"fLaC" + b"\x00" * 16)
        with pytest.raises(ValueError):
            nl.decode_flac(b"garbage everywhere")


class TestDispatchAndPython:
    def test_decode_audio_sniffs_both(self, tmp_path):
        pcm = _pcm(0.5)
        flac_bytes = encode_flac(pcm, 16000)
        wav_path = os.path.join(tmp_path, "x.wav")
        write_wav(wav_path, pcm.astype(np.float32) / 32768.0, 16000)
        with open(wav_path, "rb") as f:
            wav_bytes = f.read()
        for payload in (flac_bytes, wav_bytes):
            dec, sr = nl.decode_audio(payload)
            assert sr == 16000 and len(dec) == len(pcm)

    def test_read_audio_and_bytes_api(self, tmp_path):
        pcm = _pcm(0.5, seed=3)
        p = os.path.join(tmp_path, "clip.flac")
        write_flac(p, pcm, 16000)
        audio, sr = read_audio(p)
        assert sr == 16000
        np.testing.assert_array_equal(audio,
                                      pcm.astype(np.float32) / 32768.0)

    def test_unsupported_container_clear_error(self):
        for payload, name in ((b"ID3\x04" + b"\x00" * 40, "mp3"),
                              (b"OggS" + b"\x00" * 40, "ogg"),
                              (b"\x00\x00\x00 ftypM4A " + b"\x00" * 40,
                               "m4a")):
            with pytest.raises(ValueError, match="unsupported audio"):
                decode_audio_bytes(payload)

    def test_prefetch_pool_decodes_flac_files(self, tmp_path):
        """The C++ worker pool sniffs per file — mixed wav/flac batches
        stream through the same pipeline."""
        sr, dur = 16000, 0.5
        paths = []
        clips = []
        for i in range(6):
            wav = synth_clip(dur, sr, seed=i)
            pcm = np.clip(wav * 32767, -32768, 32767).astype(np.int16)
            if i % 2:
                p = os.path.join(tmp_path, f"c{i}.flac")
                write_flac(p, pcm, sr)
            else:
                p = os.path.join(tmp_path, f"c{i}.wav")
                write_wav(p, pcm.astype(np.float32) / 32768.0, sr)
            paths.append(p)
            clips.append(pcm.astype(np.float32) / 32768.0)
        got = list(nl.iter_clips(paths, target_rate=sr,
                                 target_len=int(sr * dur),
                                 normalize=False))
        assert [tag for tag, _, ok in got] == list(range(6))
        assert all(ok for _, _, ok in got)
        for (tag, clip, _), ref in zip(got, clips):
            # flac rows are exact; wav rows lose 1 LSB to write_wav's
            # 32767-scale re-quantization
            np.testing.assert_allclose(clip, ref, atol=1.1 / 32768.0)


class TestHardenedPaths:
    def test_reserved_channel_assignment_is_an_error(self):
        """ch_asgn 11-15 are reserved by the FLAC spec — a corrupt header
        must fail the decode, not silently produce 2-channel garbage."""
        pcm = _pcm(0.5, seed=5)
        data = bytearray(encode_flac(pcm, 16000))
        # streaminfo block = 4 (magic) + 4 (hdr) + 34 = offset 42 for the
        # first frame; ch_asgn is the upper nibble of frame byte 3
        frame = 42
        assert data[frame] == 0xFF and (data[frame + 1] & 0xFC) == 0xF8, \
            "fixture layout changed; locate the frame sync first"
        data[frame + 3] = (11 << 4) | (data[frame + 3] & 0x0F)
        with pytest.raises(ValueError):
            nl.decode_flac(bytes(data))

    def test_float32_wav_decodes_via_native_fallback(self):
        """fmt=3 (IEEE float) wavs: the stdlib wave module refuses them,
        the RIFF branch falls back to the native decoder."""
        import struct
        samples = [0.5, -0.25, 0.125, -1.0]
        raw = struct.pack("<%df" % len(samples), *samples)
        payload = (b"RIFF" + (36 + len(raw)).to_bytes(4, "little") + b"WAVE"
                   + b"fmt " + (16).to_bytes(4, "little")
                   + struct.pack("<HHIIHH", 3, 1, 16000, 64000, 4, 32)
                   + b"data" + len(raw).to_bytes(4, "little") + raw)
        a, sr = decode_audio_bytes(payload)
        assert sr == 16000
        np.testing.assert_allclose(a, samples, atol=1e-6)

    def test_24bit_wav_decodes_in_pure_python(self, tmp_path):
        import wave as w

        p = os.path.join(tmp_path, "x24.wav")
        f = w.open(p, "wb")
        f.setnchannels(1)
        f.setsampwidth(3)
        f.setframerate(8000)
        f.writeframes(b"\x00\x00\x40" + b"\x00\x00\xc0")  # +0.5, -0.5
        f.close()
        a, sr = read_audio(p)
        assert sr == 8000
        np.testing.assert_allclose(a, [0.5, -0.5], atol=1e-6)

    def test_sniffing_names_real_containers(self):
        from audio_transformers_tpu.utils.audio import sniff_container

        assert sniff_container(b"\xff\xfb\x90\x00" + b"\x00" * 40) == "mp3"
        assert sniff_container(b"ID3\x04" + b"\x00" * 40) == "mp3"
        assert sniff_container(b"OggS" + b"\x00" * 40) == "ogg"
        assert sniff_container(b"\x00\x00\x00 ftypM4A ") == "m4a"
        # RIFF that is not WAVE (e.g. AVI) must not hit the wav parser
        avi = b"RIFF\x00\x00\x00\x00AVI LIST" + b"\x00" * 20
        assert sniff_container(avi) == "riff"
        with pytest.raises(ValueError, match="unsupported audio"):
            decode_audio_bytes(avi)
        # a bare mp3 (no ID3 tag) errors with the right name
        with pytest.raises(ValueError, match="mp3"):
            decode_audio_bytes(b"\xff\xfb\x90\x00" + b"\x00" * 40)
