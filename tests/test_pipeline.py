"""Data splits, HF export round-trip, evaluation artifacts, inference
pipeline, tokenizer."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_transformers_tpu.core.config import (EmotionWhisperConfig,
                                                MelConfig, WhisperConfig)
from audio_transformers_tpu.data.expresso import SyntheticExpresso
from audio_transformers_tpu.data.splits import random_split, stratified_split
from audio_transformers_tpu.data.tokenizer import ByteTokenizer
from audio_transformers_tpu.infer.metrics import word_error_rate
from audio_transformers_tpu.models.whisper import emotion as emo


TINY = EmotionWhisperConfig(whisper=WhisperConfig.test(),
                            num_emotion_classes=4)


class TestSplits:
    def test_stratified_every_class_everywhere(self):
        rng = np.random.default_rng(0)
        labels = rng.choice(["a", "b", "c"], 60).tolist()
        tr, va, te = stratified_split(labels, seed=1)
        assert sorted(tr + va + te) == sorted(range(60))
        for split in (tr, va, te):
            assert {labels[i] for i in split} == {"a", "b", "c"}

    def test_stratified_reproducible(self):
        labels = (["x"] * 20) + (["y"] * 30)
        assert stratified_split(labels, seed=7) == \
            stratified_split(labels, seed=7)
        assert stratified_split(labels, seed=7) != \
            stratified_split(labels, seed=8)

    def test_random_split_seeded(self):
        a = random_split(100, 0.2, seed=42)
        b = random_split(100, 0.2, seed=42)
        assert a == b
        assert len(a[1]) == 20 and len(a[0]) == 80

    def test_stratified_three_samples_cover_every_split(self):
        # exactly 3 of a class is the minimum for the >=1-per-split
        # guarantee; the old fixup left test empty for tiny classes
        labels = ["rare"] * 3 + ["common"] * 40
        tr, va, te = stratified_split(labels, seed=0)
        assert sorted(tr + va + te) == sorted(range(43))
        for split in (tr, va, te):
            assert {labels[i] for i in split} == {"rare", "common"}

    def test_stratified_tiny_class_degrades_loudly(self):
        import warnings

        labels = ["one"] * 1 + ["two"] * 2 + ["big"] * 30
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            tr, va, te = stratified_split(labels, seed=0)
        assert sorted(tr + va + te) == sorted(range(33))
        # degradation order: train first, then val — and it WARNS
        assert labels.index("one") in [i for i in tr]
        two_idxs = [i for i, l in enumerate(labels) if l == "two"]
        assert any(i in tr for i in two_idxs)
        assert any(i in va for i in two_idxs)
        assert sum("sample(s)" in str(x.message) for x in w) == 2


class TestTokenizer:
    def test_byte_roundtrip(self):
        tok = ByteTokenizer()
        text = "hello, wörld!"
        assert tok.decode(tok.encode(text)) == text

    def test_specials_stripped(self):
        tok = ByteTokenizer()
        ids = tok.with_specials(tok.encode("abc"))
        assert ids[0] == tok.decoder_start_token_id
        assert ids[-1] == tok.eos_token_id
        assert tok.decode(ids) == "abc"


def test_wer():
    assert word_error_rate(["the cat sat"], ["the cat sat"]) == 0.0
    assert word_error_rate(["the cat sat"], ["the dog sat"]) == \
        pytest.approx(1 / 3)
    assert word_error_rate(["a b"], [""]) == 1.0


class TestHFExportRoundtrip:
    def test_state_dict_roundtrip_identity(self):
        from audio_transformers_tpu.models.whisper.load import (
            from_torch_state_dict)
        from audio_transformers_tpu.utils.hub import to_torch_state_dict

        params = emo.init(jax.random.PRNGKey(0), TINY)
        sd = to_torch_state_dict(params, TINY)
        back, emotion = from_torch_state_dict(sd, TINY.whisper)
        flat1 = jax.tree_util.tree_leaves_with_path(params["whisper"])
        flat2 = jax.tree_util.tree_leaves_with_path(back)
        assert len(flat1) == len(flat2)
        for (p1, a), (p2, b) in zip(flat1, flat2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, err_msg=str(p1))
        np.testing.assert_allclose(np.asarray(params["emotion_head"]["w"]),
                                   np.asarray(emotion["w"]), rtol=1e-6)

    def test_export_dir_and_pipeline_load(self, tmp_path):
        from audio_transformers_tpu.infer.pipeline import (
            EmotionWhisperPipeline)
        from audio_transformers_tpu.utils.hub import export_hf_dir

        params = emo.init(jax.random.PRNGKey(1), TINY)
        out = export_hf_dir(params, TINY, str(tmp_path / "hf"),
                            style_to_idx={"happy": 0, "sad": 1,
                                          "calm": 2, "angry": 3},
                            val_loss=1.23)
        assert os.path.exists(os.path.join(out, "model.safetensors"))
        assert os.path.exists(os.path.join(out, "config.json"))
        assert os.path.exists(os.path.join(out, "generation_config.json"))
        assert os.path.exists(os.path.join(out, "style_to_id.txt"))
        assert os.path.exists(os.path.join(out, "README.md"))

        pipe = EmotionWhisperPipeline.from_hf_dir(
            out, num_emotion_classes=4)
        # loaded pipeline must produce identical emotion head weights
        np.testing.assert_allclose(
            np.asarray(pipe.params["emotion_head"]["w"]),
            np.asarray(params["emotion_head"]["w"]), rtol=1e-6)
        assert pipe.idx_to_label[0] == "happy"

    def test_reference_loader_compat(self, tmp_path):
        """The exported state dict loads into an HF torch whisper (the
        reference's wrapped model) without missing/unexpected keys."""
        import torch
        from transformers import WhisperConfig as HFConfig
        from transformers import WhisperForConditionalGeneration

        params = emo.init(jax.random.PRNGKey(2), TINY)
        from audio_transformers_tpu.utils.hub import to_torch_state_dict
        sd = to_torch_state_dict(params, TINY, wrapper_prefix="")
        w = TINY.whisper
        hf_cfg = HFConfig(
            vocab_size=w.vocab_size, num_mel_bins=w.n_mels,
            d_model=w.d_model, encoder_layers=w.encoder_layers,
            decoder_layers=w.decoder_layers,
            encoder_attention_heads=w.num_heads,
            decoder_attention_heads=w.num_heads,
            encoder_ffn_dim=w.ffn_dim, decoder_ffn_dim=w.ffn_dim,
            max_source_positions=w.max_source_positions,
            max_target_positions=w.max_target_positions,
            pad_token_id=w.pad_token_id, bos_token_id=w.bos_token_id,
            eos_token_id=w.eos_token_id,
            decoder_start_token_id=w.decoder_start_token_id)
        tm = WhisperForConditionalGeneration(hf_cfg)
        tsd = {k: torch.from_numpy(v) for k, v in sd.items()
               if not k.startswith("emotion_classifier")}
        missing, unexpected = tm.load_state_dict(tsd, strict=False)
        assert not unexpected, unexpected
        # proj_out tied in HF too; embed_positions etc all covered
        assert not [m for m in missing if "proj_out" not in m], missing


class TestEvalAndInference:
    @pytest.fixture(scope="class")
    def setup(self):
        tok = ByteTokenizer()
        mel_cfg = MelConfig.whisper()
        w = TINY.whisper
        duration = (2 * w.max_source_positions) * mel_cfg.hop_length \
            / mel_cfg.sample_rate
        ds = SyntheticExpresso(tok, num_samples=12,
                               styles=["happy", "sad", "calm", "angry"],
                               duration=duration, max_label_len=10,
                               vocab_size=w.vocab_size)
        params = emo.init(jax.random.PRNGKey(0), TINY)
        return tok, mel_cfg, ds, params

    def test_sequence_eval_artifacts(self, setup, tmp_path):
        from audio_transformers_tpu.core.config import DecodeConfig
        from audio_transformers_tpu.infer.evaluate import (
            evaluate_sequence_level)

        tok, mel_cfg, ds, params = setup
        _, _, test_ds, style_to_idx = ds.splits()
        idx_to_style = {v: k for k, v in style_to_idx.items()}
        dcfg = DecodeConfig(max_new_tokens=8, no_repeat_ngram_size=3,
                            repetition_penalty=1.15)
        res = evaluate_sequence_level(
            params, TINY, mel_cfg, test_ds.batcher(4), idx_to_style,
            tokenizer=tok, output_dir=str(tmp_path), dcfg=dcfg,
            compute_dtype=jnp.float32)
        assert res["samples"] == test_ds.num_samples
        mtxt = open(tmp_path / "metrics.txt").read()
        assert mtxt.startswith(f"samples\t{res['samples']}\n")
        assert "accuracy\t" in mtxt and "weighted_f1\t" in mtxt
        lines = open(tmp_path / "predictions.txt").read().strip().split("\n")
        assert len(lines) == res["samples"]
        assert all(len(line.split("\t")) == 4 for line in lines)

    def test_sequence_eval_with_beams(self, setup, tmp_path):
        """dcfg.num_beams routes the shared _decode_batch through beam
        search (every evaluator surface inherits it); artifact formats
        are unchanged."""
        from audio_transformers_tpu.core.config import DecodeConfig
        from audio_transformers_tpu.infer.evaluate import (
            evaluate_sequence_level)

        tok, mel_cfg, ds, params = setup
        _, _, test_ds, style_to_idx = ds.splits()
        idx_to_style = {v: k for k, v in style_to_idx.items()}
        dcfg = DecodeConfig(max_new_tokens=8, num_beams=2,
                            repetition_penalty=1.15)
        res = evaluate_sequence_level(
            params, TINY, mel_cfg, test_ds.batcher(4), idx_to_style,
            tokenizer=tok, output_dir=str(tmp_path), dcfg=dcfg,
            compute_dtype=jnp.float32)
        assert res["samples"] == test_ds.num_samples
        mtxt = open(tmp_path / "metrics.txt").read()
        assert "accuracy\t" in mtxt and "weighted_f1\t" in mtxt

    def test_segment_eval_artifacts(self, setup, tmp_path):
        from audio_transformers_tpu.core.config import DecodeConfig
        from audio_transformers_tpu.infer.evaluate import (
            evaluate_segment_level)

        tok, mel_cfg, ds, params = setup
        _, _, test_ds, style_to_idx = ds.splits()
        idx_to_style = {v: k for k, v in style_to_idx.items()}
        dcfg = DecodeConfig(max_new_tokens=10, return_timestamps=True,
                            no_repeat_ngram_size=3,
                            repetition_penalty=1.1)
        res = evaluate_segment_level(
            params, TINY, mel_cfg, test_ds.batcher(4), idx_to_style,
            tokenizer=tok, output_dir=str(tmp_path), dcfg=dcfg,
            max_segments=4, compute_dtype=jnp.float32)
        assert res["total_segments"] >= test_ds.num_samples
        body = open(tmp_path / "segment_evaluation.txt").read()
        assert body.startswith("Total segments evaluated:")
        assert "Classification Report" in body
        log = open(tmp_path / "predictions.txt").read()
        assert log.startswith("===== TRANSCRIPTION AND EMOTION PREDICTIONS")
        assert "Predicted Emotion:" in log

    def test_pipeline_analyze(self, setup):
        from audio_transformers_tpu.infer.pipeline import (
            EmotionWhisperPipeline)
        from audio_transformers_tpu.utils.audio import synth_clip

        tok, mel_cfg, ds, params = setup
        pipe = EmotionWhisperPipeline(
            params, TINY, mel_cfg,
            idx_to_label={0: "happy", 1: "sad", 2: "calm", 3: "angry"},
            tokenizer=tok, compute_dtype=jnp.float32)
        wav = synth_clip(3.2, 16000)
        out = pipe.analyze(wav, 16000, segment_duration=1.0,
                           max_new_tokens=6)
        assert isinstance(out["transcription"], str)
        assert len(out["segments"]) == 4  # ceil(3.2 / 1.0)
        seg = out["segments"][0]
        assert abs(sum(seg["emotion_probs"].values()) - 1.0) < 1e-4
        assert seg["emotion"] in {"happy", "sad", "calm", "angry"}

    def test_pipeline_analyze_with_beams(self, setup):
        """num_beams routes _decode through the single-program beam
        search (beam decode skips the temperature fallback); the analyze
        contract is unchanged."""
        from audio_transformers_tpu.infer.pipeline import (
            EmotionWhisperPipeline)
        from audio_transformers_tpu.utils.audio import synth_clip

        tok, mel_cfg, ds, params = setup
        pipe = EmotionWhisperPipeline(
            params, TINY, mel_cfg,
            idx_to_label={0: "happy", 1: "sad", 2: "calm", 3: "angry"},
            tokenizer=tok, compute_dtype=jnp.float32, num_beams=2)
        wav = synth_clip(2.1, 16000)
        out = pipe.analyze(wav, 16000, segment_duration=1.0,
                           max_new_tokens=6)
        assert isinstance(out["transcription"], str)
        assert len(out["segments"]) == 3
        seg = out["segments"][0]
        assert abs(sum(seg["emotion_probs"].values()) - 1.0) < 1e-4

    def test_analyze_windows_bucket_never_exceeds_max_batch(self, setup):
        """max_batch is a device-memory bound — the power-of-two bucket
        growth must not overshoot a non-power-of-two cap (n=7, cap 3
        used to run batch 4)."""
        import numpy as np

        from audio_transformers_tpu.infer.pipeline import (
            EmotionWhisperPipeline)
        from audio_transformers_tpu.utils.audio import synth_clip

        tok, mel_cfg, ds, params = setup
        pipe = EmotionWhisperPipeline(
            params, TINY, mel_cfg,
            idx_to_label={0: "happy", 1: "sad", 2: "calm", 3: "angry"},
            tokenizer=tok, compute_dtype=jnp.float32)
        sizes = []
        real = pipe._decode

        def spy(group, dcfg):
            sizes.append(group.shape[0])
            return real(group, dcfg)

        pipe._decode = spy
        windows = np.stack([synth_clip(1.0, 16000, seed=i)[: pipe._window]
                            for i in range(7)])
        padded = np.zeros((7, pipe._window), np.float32)
        padded[:, : windows.shape[1]] = windows
        texts, probs = pipe.analyze_windows(padded, max_new_tokens=4,
                                            max_batch=3)
        assert len(texts) == 7 and probs.shape[0] == 7
        assert max(sizes) <= 3, sizes

    def test_pipeline_kv_quant_int8(self, setup):
        """kv_quant plumbs through to the decode loop and the CLIs expose
        the flag (DecodeConfig.kv_quant; int8 cross-KV)."""
        from audio_transformers_tpu.cli import evaluate as eval_cli
        from audio_transformers_tpu.cli import evaluate_simple as seq_cli
        from audio_transformers_tpu.infer.pipeline import (
            EmotionWhisperPipeline)
        from audio_transformers_tpu.utils.audio import synth_clip

        tok, mel_cfg, ds, params = setup
        pipe = EmotionWhisperPipeline(
            params, TINY, mel_cfg,
            idx_to_label={0: "happy", 1: "sad", 2: "calm", 3: "angry"},
            tokenizer=tok, compute_dtype=jnp.float32, kv_quant="int8")
        wav = synth_clip(2.0, 16000)
        out = pipe.analyze(wav, 16000, segment_duration=1.0,
                           max_new_tokens=6)
        assert len(out["segments"]) == 2
        assert seq_cli.parse_args(
            ["--model_path", "x", "--kv_quant", "int8"]).kv_quant == "int8"
        assert eval_cli.parse_args(
            ["--model_path", "x", "--kv_quant", "int8"]).kv_quant == "int8"


def test_classifier_torch_export_loads_into_reference_architecture(tmp_path):
    """The exported classifier state dict loads into a torch module with
    the reference's module names (the fixed reference architecture)."""
    import torch
    from audio_transformers_tpu.core.config import UrbanSoundConfig
    from audio_transformers_tpu.models import urbansound
    from audio_transformers_tpu.utils.hub import classifier_to_torch_state_dict

    cfg = UrbanSoundConfig(n_mels=64, num_classes=4, conv_dim=24,
                           encoder_dim=32, num_encoder_blocks=1,
                           num_heads=2, cnn_dims=(24,))
    params, state = urbansound.init(jax.random.PRNGKey(0), cfg)
    sd = classifier_to_torch_state_dict(params, state)
    # spot-check conventions
    assert sd["conv_module.conv1.weight"].shape == (24, 64, 3)
    assert sd["encoder_blocks.0.attn.in_proj_weight"].shape == (96, 32)
    assert sd["classifier.weight"].shape == (4, 24)
    assert sd["position_embeddings"].shape == (cfg.max_positions, 32)
    for v in sd.values():
        assert np.isfinite(v).all()


def test_compression_ratio():
    from audio_transformers_tpu.infer.metrics import compression_ratio

    assert compression_ratio("a" * 400) > 2.4         # degenerate repetition
    assert compression_ratio("The quick brown fox jumps.") < 1.5
    assert compression_ratio("") == 0.0


class TestSegmentSpanAlignment:
    """Empty middle segment: device segment ids and host text/time spans
    must stay aligned by the shared ordinal (round-1 defect: iterating
    range(num_segments) dropped trailing segments when a middle one was
    empty and mislabeled their spans)."""

    def test_empty_middle_segment(self, tmp_path, monkeypatch):
        from audio_transformers_tpu.core.config import DecodeConfig
        from audio_transformers_tpu.infer import evaluate as ev

        w = TINY.whisper
        ts = w.timestamp_begin_id
        # prompt=[start]; pairs (0.00,0.10) "10 11", (0.10,0.14) empty,
        # (0.18,0.24) "12"; then EOS
        # text tokens must sit BELOW timestamp_begin (4 in the test vocab)
        row = [w.decoder_start_token_id,
               ts + 0, 2, 3, ts + 5,
               ts + 5, ts + 7,
               ts + 9, 2, ts + 12,
               w.eos_token_id, w.eos_token_id]
        tokens = jnp.asarray([row], jnp.int32)
        rng = np.random.default_rng(0)
        hiddens = jnp.asarray(rng.standard_normal(
            (1, len(row), w.d_model)).astype(np.float32))
        lengths = jnp.asarray([11], jnp.int32)

        monkeypatch.setattr(
            ev, "_decode_batch",
            lambda *a, **k: {"tokens": tokens, "hiddens": hiddens,
                             "lengths": lengths})

        class OneBatch:
            def eval_batches(self):
                yield {"waveform": np.zeros((1, 16000), np.float32),
                       "emotion_labels": np.asarray([2]),
                       "valid": np.asarray([True])}

        params = emo.init(jax.random.PRNGKey(0), TINY)
        res = ev.evaluate_segment_level(
            params, TINY, MelConfig.whisper(), OneBatch(),
            {i: f"style{i}" for i in range(4)},
            output_dir=str(tmp_path),
            dcfg=DecodeConfig(max_new_tokens=10, return_timestamps=True),
            max_segments=4, compute_dtype=jnp.float32)

        # two non-empty device segments -> two prediction rows
        assert res["total_segments"] == 2
        log = open(tmp_path / "predictions.txt").read()
        # first segment: pair (0.00, 0.10)
        assert "Segment 1 (0.0s - 0.1s):" in log
        # third device segment aligns with the THIRD host span (0.18-0.24),
        # not the second (0.10-0.14)
        assert "Segment 3 (0.2s - 0.2s):" in log
        assert "Segment 2 (" not in log
