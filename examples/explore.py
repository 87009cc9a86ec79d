"""Exploration script — the runnable equivalent of the reference's
experiment notebooks (reference: urban_sounds/experiments.ipynb,
whisper_finetune/experiments.ipynb — model/config dumps, processor
internals, timestamp-token mechanics, dataset EDA on synthetic stand-ins).

  python examples/explore.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.pop("JAX_PLATFORMS", None)
import jax  # noqa: E402

if os.environ.get("ATX_EXPLORE_CPU", "1") == "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from audio_transformers_tpu.core.config import (EmotionWhisperConfig,  # noqa: E402
                                                MelConfig,
                                                UrbanSoundConfig,
                                                WhisperConfig)
from audio_transformers_tpu.core.pytree import describe, param_count  # noqa: E402


def section(title):
    print(f"\n{'=' * 60}\n{title}\n{'=' * 60}")


# -- whisper model/config dump (ref: whisper experiments.ipynb cells 0-1) --
section("whisper-tiny configuration")
cfg = WhisperConfig.tiny()
print(cfg.to_json())
print(f"\nsizes: " + ", ".join(
    f"{n}={param_count(__import__('audio_transformers_tpu.models.whisper.model', fromlist=['init']).init(jax.random.PRNGKey(0), WhisperConfig.by_name(n))) / 1e6:.1f}M"
    for n in ["tiny", "base"]))

# -- processor internals (ref: cell 2 — 80 mel bins, hop 160, 30 s chunks) --
section("whisper mel front-end parameterization")
mel = MelConfig.whisper()
print(mel.to_json())
print(f"frames for 30 s audio: {mel.num_frames(mel.sample_rate * 30)}")
print(f"encoder positions: {cfg.max_source_positions} "
      f"(= frames / conv stride 2)")

# -- timestamp-token mechanics (ref: cell 4) --
section("timestamp-token mechanics")
print(f"<|startoftranscript|> = {cfg.decoder_start_token_id}")
print(f"<|notimestamps|>      = {cfg.no_timestamps_token_id}")
print(f"<|0.00|>              = {cfg.timestamp_begin_id} "
      f"(timestamps tick every 20 ms)")
print(f"eos/pad               = {cfg.eos_token_id}")
tok_30s = cfg.timestamp_begin_id + int(30.0 / 0.02)
print(f"<|30.00|>             = {tok_30s}")

# -- urbansound model summary (ref: urban model.py __main__ smoke) --
section("urbansound classifier")
ucfg = UrbanSoundConfig()
from audio_transformers_tpu.models import urbansound  # noqa: E402
params, state = urbansound.init(jax.random.PRNGKey(0), ucfg)
print(f"total parameters: {param_count(params):,}")
print(describe(params, max_rows=12))

# -- dataset EDA on the synthetic stand-in (ref: class-distribution EDA) --
section("synthetic expresso class distribution")
from audio_transformers_tpu.data.expresso import SyntheticExpresso  # noqa: E402
from audio_transformers_tpu.data.tokenizer import ByteTokenizer  # noqa: E402

ds = SyntheticExpresso(ByteTokenizer(), num_samples=64)
labels = [int(ds(i)["emotion_labels"]) for i in range(len(ds))]
names = sorted(ds.style_to_idx, key=ds.style_to_idx.get)
for idx, name in enumerate(names):
    n = labels.count(idx)
    print(f"  {name:<12} {n:3d}  {'#' * n}")

# -- forward smoke (ref: model construction + shape check) --
section("end-to-end forward smoke (tiny test config)")
from audio_transformers_tpu.models.whisper import emotion as emo  # noqa: E402
from audio_transformers_tpu.ops.mel import log_mel  # noqa: E402

tcfg = EmotionWhisperConfig(whisper=WhisperConfig.test(),
                            num_emotion_classes=4)
p = emo.init(jax.random.PRNGKey(0), tcfg)
wav = np.random.default_rng(0).standard_normal((2, 20480)).astype(np.float32)
m = log_mel(wav, mel)
logits, emotion_logits = emo.forward_train(
    p, tcfg, m, np.zeros((2, 8), np.int32))
print(f"mel {m.shape} -> token logits {logits.shape}, "
      f"emotion logits {emotion_logits.shape}")
