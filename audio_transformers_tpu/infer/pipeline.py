"""Inference library: load + transcribe + chunked long-audio emotion.

Capability-equivalent to the reference inference module (reference:
whisper_finetune/inference.py):
  - load_model_and_processor -> `EmotionWhisperPipeline.from_checkpoint`
    (orbax bundle; tying/label map/config come from checkpoint metadata —
    the reference re-ties weights and falls back across config files,
    inference.py:12-67)
  - load_emotion_labels -> label map from metadata or style_to_id.txt with
    the same 10-label fallback (inference.py:69-127)
  - perform_inference -> `analyze`: full-clip transcription + per-segment
    emotion probabilities (inference.py:129-235)

Long-audio TPU redesign (SURVEY.md §3.5): the reference loops generate()
over 5 s chunks sequentially; here chunks are stacked into ONE batched
jit'd decode (bucketed batch size to bound recompiles).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from audio_transformers_tpu.core.checkpoint import Checkpointer
from audio_transformers_tpu.core.config import (DecodeConfig,
                                                EmotionWhisperConfig,
                                                MelConfig)
from audio_transformers_tpu.models import whisper as wm
from audio_transformers_tpu.models.whisper import decode as wdecode
from audio_transformers_tpu.models.whisper import emotion as emo
from audio_transformers_tpu.ops.mel import log_mel
from audio_transformers_tpu.ops.mel import precision_for as mel_precision_for
from audio_transformers_tpu.utils.audio import resample, to_mono

# Reference fallback label list (inference.py:100-112)
DEFAULT_EMOTION_LABELS = [
    "confused", "default", "emphasis", "enunciated", "essentials", "happy",
    "laughing", "sad", "singing", "whisper",
]


class EmotionWhisperPipeline:
    def __init__(self, params: dict, cfg: EmotionWhisperConfig,
                 mel_cfg: Optional[MelConfig] = None,
                 idx_to_label: Optional[Dict[int, str]] = None,
                 tokenizer=None, compute_dtype=jnp.bfloat16,
                 suppress_ids=None, kv_quant: str = "none",
                 num_beams: int = 1):
        self.params = params
        self.cfg = cfg
        self.mel_cfg = mel_cfg or MelConfig.whisper(n_mels=cfg.whisper.n_mels)
        self.idx_to_label = idx_to_label or dict(
            enumerate(DEFAULT_EMOTION_LABELS))
        self.tokenizer = tokenizer
        self.compute_dtype = compute_dtype
        # "int8" quantizes the per-clip cross-attention K/V for the decode
        # loop (DecodeConfig.kv_quant): ~30% faster per decoded token on
        # v5e, at approximate (not bit-exact) greedy parity.
        self.kv_quant = kv_quant
        # num_beams > 1 decodes through the single-program beam search
        # (models/whisper/beam.py; HF BeamSearchScorer semantics, shared
        # cross-K/V across beams) — a capability beyond the reference's
        # greedy-only surfaces. Beam decode is deterministic, so the
        # compression-ratio temperature fallback does not apply to it.
        self.num_beams = num_beams
        # Non-speech suppress list: real pretrained checkpoints rely on it
        # (the reference inherits it from generation_config.json through HF
        # generate); default by vocab, overridable from checkpoint metadata.
        self.suppress_ids = tuple(
            suppress_ids if suppress_ids is not None
            else wdecode.default_suppress_ids(cfg.whisper))
        # model window in samples: enc positions * conv stride * hop
        # (whisper-tiny: 1500 * 2 * 160 = 30 s @ 16 kHz)
        self._window = (cfg.whisper.max_source_positions * 2
                        * self.mel_cfg.hop_length)

    # ------------------------------------------------------------------
    @classmethod
    def from_checkpoint(cls, checkpoint_dir: str, *, tokenizer=None,
                        step: Optional[int] = None,
                        compute_dtype=jnp.bfloat16,
                        kv_quant: str = "none",
                        num_beams: int = 1
                        ) -> "EmotionWhisperPipeline":
        ck = Checkpointer(checkpoint_dir)
        tree, meta, _ = ck.restore(step=step)
        ck.close()
        params = tree["params"] if "params" in tree else tree
        meta = meta or {}
        if "cfg" in meta:
            cfg = EmotionWhisperConfig.from_dict(
                _loads_maybe(meta["cfg"]))
        else:
            head = params["emotion_head"]["w"]
            cfg = EmotionWhisperConfig(num_emotion_classes=head.shape[1])
        mel_cfg = (MelConfig.from_dict(_loads_maybe(meta["mel_cfg"]))
                   if "mel_cfg" in meta else None)
        idx_to_label = None
        if meta.get("style_to_idx"):
            idx_to_label = {int(v): k
                            for k, v in meta["style_to_idx"].items()}
        suppress = meta.get("suppress_ids")
        return cls(params, cfg, mel_cfg, idx_to_label, tokenizer=tokenizer,
                   compute_dtype=compute_dtype, kv_quant=kv_quant,
                   num_beams=num_beams,
                   suppress_ids=tuple(suppress) if suppress else None)

    @classmethod
    def from_hf_dir(cls, model_dir: str, *, tokenizer=None,
                    num_emotion_classes: int = 10,
                    compute_dtype=jnp.bfloat16,
                    kv_quant: str = "none",
                    num_beams: int = 1) -> "EmotionWhisperPipeline":
        """Load an HF-format directory (the reference's save_pretrained
        output: pytorch_model.bin or model.safetensors)."""
        import json
        import os

        from audio_transformers_tpu.core.checkpoint import load_label_map
        from audio_transformers_tpu.core.config import WhisperConfig
        from audio_transformers_tpu.models.whisper.load import (
            config_from_json, from_torch_state_dict, load_safetensors)

        st = os.path.join(model_dir, "model.safetensors")
        if os.path.exists(st):
            sd = load_safetensors(st)
        else:
            import torch
            sd = torch.load(os.path.join(model_dir, "pytorch_model.bin"),
                            map_location="cpu")
        cfg_path = os.path.join(model_dir, "config.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                raw = json.load(f)
            whisper_cfg = config_from_json(raw)
            num_emotion_classes = raw.get("num_emotion_classes",
                                          num_emotion_classes)
        else:
            whisper_cfg = WhisperConfig.tiny()
        cfg = EmotionWhisperConfig(
            whisper=whisper_cfg,
            num_emotion_classes=num_emotion_classes)
        whisper_params, emotion = from_torch_state_dict(sd, cfg.whisper)
        if not emotion:
            # vanilla whisper export without an emotion_classifier: fresh
            # random head, matching the reference loader's behavior
            # (load_emotion_whisper_model builds the head anew,
            # whisper_finetune/model.py:110-127)
            from audio_transformers_tpu.ops import nn
            emotion = nn.linear_init(jax.random.PRNGKey(0),
                                     cfg.whisper.d_model,
                                     cfg.num_emotion_classes)
        params = {"whisper": whisper_params, "emotion_head": emotion}
        idx_to_label = None
        lm = os.path.join(model_dir, "style_to_id.txt")
        if os.path.exists(lm):
            idx_to_label = {v: k for k, v in load_label_map(lm).items()}
        # suppress lists travel in generation_config.json for HF exports
        suppress = None
        gc_path = os.path.join(model_dir, "generation_config.json")
        if os.path.exists(gc_path):
            with open(gc_path) as f:
                gc = json.load(f)
            if gc.get("suppress_tokens"):
                suppress = tuple(int(t) for t in gc["suppress_tokens"])
        return cls(params, cfg, idx_to_label=idx_to_label,
                   tokenizer=tokenizer, compute_dtype=compute_dtype,
                   kv_quant=kv_quant, num_beams=num_beams,
                   suppress_ids=suppress)

    # ------------------------------------------------------------------
    def _prep(self, waveform: np.ndarray, sr: int) -> np.ndarray:
        wav = to_mono(np.asarray(waveform, dtype=np.float32))
        if sr != self.mel_cfg.sample_rate:
            wav = resample(wav, sr, self.mel_cfg.sample_rate)
        return wav

    def _decode(self, windows: np.ndarray, dcfg: DecodeConfig) -> dict:
        w = self.cfg.whisper
        prompt = wdecode.build_prompt(w, dcfg)
        mel = log_mel(jnp.asarray(windows), self.mel_cfg,
                      precision=mel_precision_for(self.compute_dtype)) \
            .astype(self.compute_dtype)
        enc = wm.encode_jit(self.params["whisper"], w, mel,
                            attn_impl="auto")
        if dcfg.num_beams > 1:
            # beam decode is deterministic and already explores
            # alternatives — the compression-ratio temperature fallback
            # is a greedy-degeneracy rescue and does not apply
            from audio_transformers_tpu.models.whisper import beam as wbeam
            out = wbeam.generate_beam(
                self.params["whisper"], w, dcfg, enc, prompt=prompt,
                suppress_ids=self.suppress_ids)
        else:
            out = wdecode.generate_with_fallback(
                self.params["whisper"], w, dcfg, enc, prompt=prompt,
                suppress_ids=self.suppress_ids, tokenizer=self.tokenizer)
        out["prompt_len"] = len(prompt)
        return out

    def _text(self, tokens: np.ndarray, start: int, length: int) -> str:
        if self.tokenizer is None:
            return ""
        # the tokenizer skips special/timestamp tokens itself (HF marks
        # them special; the byte tokenizer skips out-of-range ids)
        ids = [int(t) for t in tokens[start:length]]
        return self.tokenizer.decode(ids, skip_special=True).strip()

    # ------------------------------------------------------------------
    def analyze_windows(self, windows: np.ndarray, *,
                        max_new_tokens: int = 64,
                        max_batch: int = 16):
        """The device half of `analyze`/`transcribe`, shared with the
        serving micro-batcher (serve/batching.py): decode + emotion for
        already-built model windows. windows (n, model_window) float32 ->
        (texts: list[str] of n, probs: (n, n_classes) float32). Row
        batches are padded to power-of-two buckets capped at `max_batch`
        so jit recompiles stay bounded regardless of n."""
        n = windows.shape[0]
        dcfg = DecodeConfig(max_new_tokens=max_new_tokens,
                            repetition_penalty=1.15,
                            no_repeat_ngram_size=3,
                            kv_quant=self.kv_quant,
                            num_beams=self.num_beams)
        bucket = 1
        while bucket < min(n, max_batch):
            bucket *= 2
        # the power-of-two growth can overshoot a non-power-of-two cap
        # (n=100, max_batch=24 -> 32); the cap is a device-memory bound
        # and must hold exactly
        bucket = min(bucket, max_batch)
        texts: List[str] = []
        probs_rows = []
        for start in range(0, n, bucket):
            idxs = list(range(start, min(start + bucket, n)))
            group = np.zeros((bucket, self._window), np.float32)
            group[: len(idxs)] = windows[idxs[0]: idxs[-1] + 1]
            out = self._decode(group, dcfg)
            # unmasked mean (lengths=None): the emotion head is TRAINED on
            # the reference's all-positions pooling (emo.forward_train
            # pooling="all", reference model.py:96) — inference must apply
            # the same feature form, not a masked mean the head never saw
            logits = emo.sequence_emotion_from_hiddens(
                self.params, out["hiddens"])
            probs = np.asarray(jax.nn.softmax(logits, axis=-1),
                               np.float32)
            tokens = np.asarray(out["tokens"])
            lengths = np.asarray(out["lengths"])
            for row in range(len(idxs)):
                texts.append(self._text(tokens[row], out["prompt_len"],
                                        int(lengths[row])))
                probs_rows.append(probs[row])
        return texts, np.stack(probs_rows)

    def _window_for(self, wav: np.ndarray) -> np.ndarray:
        window = np.zeros((1, self._window), np.float32)
        n = min(len(wav), self._window)
        window[0, :n] = wav[:n]
        return window

    def _segment_windows(self, wav: np.ndarray, seg_len: int) -> np.ndarray:
        n_segs = max(1, math.ceil(len(wav) / seg_len))
        windows = np.zeros((n_segs, self._window), np.float32)
        for s in range(n_segs):
            # chunks beyond the model window are truncated to it
            # (whisper's fixed-window semantics)
            chunk = wav[s * seg_len: (s + 1) * seg_len][: self._window]
            windows[s, : len(chunk)] = chunk
        return windows

    def transcribe(self, waveform: np.ndarray, sr: int, *,
                   max_new_tokens: int = 128, runner=None) -> str:
        """Full-clip transcription (reference inference.py:152-171:
        greedy, repetition_penalty 1.15). `runner` overrides
        analyze_windows (the serving micro-batcher routes through its
        shared queue here)."""
        wav = self._prep(waveform, sr)
        run = runner or self.analyze_windows
        texts, _ = run(self._window_for(wav),
                       max_new_tokens=max_new_tokens)
        return texts[0]

    def analyze(self, waveform: np.ndarray, sr: int, *,
                segment_duration: float = 5.0,
                max_new_tokens: int = 64,
                max_batch: Optional[int] = None, runner=None) -> dict:
        """Transcription + per-segment emotion probabilities (reference
        perform_inference, inference.py:129-235; segment_duration=5 default
        at inference.py:134). `runner` overrides analyze_windows (serving
        micro-batcher) and owns the batching policy — it cannot honor a
        per-call `max_batch`, so passing both is an error rather than a
        silent ignore."""
        if runner is not None and max_batch is not None:
            raise ValueError(
                "max_batch has no effect when a runner is supplied; the "
                "runner (e.g. MicroBatcher) owns the batching policy")
        wav = self._prep(waveform, sr)
        sr = self.mel_cfg.sample_rate
        run = runner or (lambda w, **kw: self.analyze_windows(
            w, max_batch=16 if max_batch is None else max_batch, **kw))
        transcription = self.transcribe(wav, sr, runner=runner)

        seg_len = int(segment_duration * sr)
        windows = self._segment_windows(wav, seg_len)
        texts, probs = run(windows, max_new_tokens=max_new_tokens)
        segments: List[dict] = []
        for s in range(windows.shape[0]):
            p = probs[s]
            segments.append({
                "start": s * segment_duration,
                "end": min((s + 1) * segment_duration, len(wav) / sr),
                "text": texts[s],
                "emotion_probs": {self.idx_to_label.get(i, str(i)):
                                  float(p[i]) for i in range(len(p))},
                "emotion": self.idx_to_label.get(int(p.argmax()),
                                                 str(int(p.argmax()))),
            })
        return {"transcription": transcription, "segments": segments}


def _loads_maybe(obj):
    if isinstance(obj, str):
        import json
        return json.loads(obj)
    return obj


def self_test(duration: float = 12.0) -> dict:
    """Synthesized sine+noise end-to-end smoke test, mirroring the
    reference's __main__ self-test (inference.py:239-300)."""
    from audio_transformers_tpu.utils.audio import synth_clip

    cfg = EmotionWhisperConfig()
    params = emo.init(jax.random.PRNGKey(0), cfg)
    pipe = EmotionWhisperPipeline(params, cfg)
    wav = synth_clip(duration, 16000)
    return pipe.analyze(wav, 16000)
