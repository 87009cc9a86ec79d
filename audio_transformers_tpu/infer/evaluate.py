"""Sequence- and segment-level evaluation of the whisper-emotion model.

Writes the reference's exact artifact formats so results are directly
comparable:
  - sequence level (reference: whisper_finetune/evaluate_simple.py:33-183):
    predictions.txt TSV rows `gt_style\tpred_style\tgt_text\tpred_text` and
    metrics.txt `samples/accuracy/weighted_f1` tab-separated
  - segment level (reference: whisper_finetune/evaluate.py:96-370):
    segment_evaluation.txt with accuracy/F1/classification_report, ground
    truth = the sample's emotion replicated per segment (evaluate.py:292-299)

TPU redesign: transcription decode and emotion logits come from ONE jit'd
batched pass (the decode loop surfaces hidden states) instead of the
reference's generate-then-reforward double encode
(evaluate_simple.py:125-143).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from audio_transformers_tpu.core.config import (DecodeConfig,
                                                EmotionWhisperConfig,
                                                MelConfig)
from audio_transformers_tpu.infer.metrics import (classification_metrics,
                                                  word_error_rate)
from audio_transformers_tpu.models import whisper as wm
from audio_transformers_tpu.models.whisper import decode as wdecode
from audio_transformers_tpu.models.whisper import emotion as emo
from audio_transformers_tpu.ops.mel import log_mel
from audio_transformers_tpu.ops.mel import precision_for as mel_precision_for


def _decode_batch(params, cfg: EmotionWhisperConfig, mel_cfg: MelConfig,
                  dcfg: DecodeConfig, waveform, prompt, compute_dtype,
                  *, tokenizer=None, suppress_ids=None):
    w = cfg.whisper
    if suppress_ids is None:
        suppress_ids = wdecode.default_suppress_ids(w)
    mel = log_mel(jnp.asarray(waveform), mel_cfg,
                  precision=mel_precision_for(compute_dtype)
                  ).astype(compute_dtype)
    enc = wm.encode_jit(params["whisper"], w, mel, attn_impl="auto")
    if dcfg.num_beams > 1:
        # beam decode is deterministic; the compression-ratio temperature
        # fallback is a greedy-degeneracy rescue and does not apply
        from audio_transformers_tpu.models.whisper import beam as wbeam
        return wbeam.generate_beam(params["whisper"], w, dcfg, enc,
                                   prompt=prompt,
                                   suppress_ids=tuple(suppress_ids))
    # generate_with_fallback is a plain generate when
    # dcfg.compression_ratio_threshold is unset
    out = wdecode.generate_with_fallback(params["whisper"], w, dcfg, enc,
                                         prompt=prompt,
                                         suppress_ids=tuple(suppress_ids),
                                         tokenizer=tokenizer)
    return out


def evaluate_sequence_level(params, cfg: EmotionWhisperConfig,
                            mel_cfg: MelConfig, batcher, idx_to_style: Dict,
                            *, tokenizer=None,
                            output_dir: Optional[str] = None,
                            dcfg: Optional[DecodeConfig] = None,
                            compute_dtype=jnp.bfloat16) -> dict:
    """Greedy transcription + sequence-level emotion over a test batcher.

    Decode settings default to the reference's published evaluation
    (evaluate_simple.py:125-135: greedy, max 100 new tokens,
    no_repeat_ngram 3, repetition_penalty 1.15)."""
    dcfg = dcfg or DecodeConfig(max_new_tokens=100, no_repeat_ngram_size=3,
                                repetition_penalty=1.15)
    w = cfg.whisper
    prompt = wdecode.build_prompt(w, dcfg)

    gt_all, pred_all, rows = [], [], []
    gt_texts, pred_texts = [], []
    for batch in batcher.eval_batches():
        out = _decode_batch(params, cfg, mel_cfg, dcfg, batch["waveform"],
                            prompt, compute_dtype, tokenizer=tokenizer)
        # unmasked mean: matches both the head's training-time pooling
        # (forward_train pooling="all") and the reference eval's mean over
        # the full generated sequence (evaluate_simple.py:141-143)
        emotion_logits = emo.sequence_emotion_from_hiddens(
            params, out["hiddens"])
        preds = np.asarray(jnp.argmax(emotion_logits, -1))
        tokens = np.asarray(out["tokens"])
        lengths = np.asarray(out["lengths"])
        for b in range(len(preds)):
            if not batch["valid"][b]:
                continue
            gt = int(batch["emotion_labels"][b])
            pr = int(preds[b])
            gt_all.append(gt)
            pred_all.append(pr)
            gt_txt = pr_txt = ""
            if tokenizer is not None:
                gen = tokens[b, len(prompt): lengths[b]].tolist()
                pr_txt = tokenizer.decode(gen).strip()
                lab = batch["labels"][b]
                lab = lab[lab != getattr(tokenizer, "pad_token_id", -1)]
                gt_txt = tokenizer.decode(lab.tolist()).strip()
                gt_texts.append(gt_txt)
                pred_texts.append(pr_txt)
            rows.append((idx_to_style.get(gt, "Unknown"),
                         idx_to_style.get(pr, "Unknown"), gt_txt, pr_txt))

    result = classification_metrics(gt_all, pred_all, idx_to_style)
    if gt_texts:
        result["wer"] = word_error_rate(gt_texts, pred_texts)

    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        with open(os.path.join(output_dir, "predictions.txt"), "w") as f:
            for r in rows:
                f.write("\t".join(r) + "\n")
        # exact reference metrics.txt format (evaluate_simple.py:176-181)
        with open(os.path.join(output_dir, "metrics.txt"), "w") as f:
            f.write(f"samples\t{result['samples']}\n"
                    f"accuracy\t{result['accuracy']:.6f}\n"
                    f"weighted_f1\t{result['weighted_f1']:.6f}\n")
    return result


def segments_from_tokens(tokens_row: np.ndarray, length: int,
                         prompt_len: int, timestamp_begin: int,
                         tokenizer=None, *, precision: float = 0.02) -> list:
    """Host-side split of a timestamped decode row into segments with
    start/end seconds (whisper timestamps tick every 20 ms) and text."""
    segments = []
    start_t = None
    text_ids: list = []
    for t in tokens_row[prompt_len:length].tolist():
        if t >= timestamp_begin:
            ts = (t - timestamp_begin) * precision
            if start_t is None:
                start_t = ts
            else:
                text = (tokenizer.decode(text_ids).strip()
                        if tokenizer else "")
                segments.append({"start": start_t, "end": ts, "text": text})
                start_t, text_ids = None, []
        elif start_t is not None:
            text_ids.append(t)
    if start_t is not None and text_ids:
        text = tokenizer.decode(text_ids).strip() if tokenizer else ""
        segments.append({"start": start_t, "end": start_t, "text": text})
    return segments


def evaluate_segment_level(params, cfg: EmotionWhisperConfig,
                           mel_cfg: MelConfig, batcher, idx_to_style: Dict,
                           *, tokenizer=None,
                           output_dir: Optional[str] = None,
                           dcfg: Optional[DecodeConfig] = None,
                           max_segments: Optional[int] = None,
                           compute_dtype=jnp.bfloat16) -> dict:
    """Timestamped decode -> per-segment emotion; ground truth is the
    sample's emotion replicated per segment (reference evaluate.py:292-299).
    Decode defaults mirror evaluate.py:41-58 (timestamps on, rep penalty
    1.1, no_repeat_ngram 3, max 256 new tokens, and the whisper
    anti-repetition fallback: compression_ratio_threshold=2.4 triggers a
    temperature-0.7 re-decode of degenerate rows)."""
    dcfg = dcfg or DecodeConfig(max_new_tokens=256, return_timestamps=True,
                                no_repeat_ngram_size=3,
                                repetition_penalty=1.1,
                                compression_ratio_threshold=2.4)
    w = cfg.whisper
    prompt = wdecode.build_prompt(w, dcfg)

    gt_all, pred_all = [], []
    total_segments = 0
    log_lines = ["===== TRANSCRIPTION AND EMOTION PREDICTIONS =====", ""]
    for batch in batcher.eval_batches():
        out = _decode_batch(params, cfg, mel_cfg, dcfg, batch["waveform"],
                            prompt, compute_dtype, tokenizer=tokenizer)
        seg = emo.segment_emotion_from_decode(params, cfg, out,
                                              prompt_len=len(prompt),
                                              max_segments=max_segments)
        seg_preds = np.asarray(jnp.argmax(seg["segment_logits"], -1))
        nsegs = np.asarray(seg["num_segments"])
        counts = np.asarray(seg["segment_counts"])
        tokens = np.asarray(out["tokens"])
        lengths = np.asarray(out["lengths"])
        for b in range(len(nsegs)):
            if not batch["valid"][b]:
                continue
            gt = int(batch["emotion_labels"][b])
            spans = segments_from_tokens(
                tokens[b], int(lengths[b]), len(prompt),
                w.timestamp_begin_id, tokenizer)
            log_lines.append("Segment-by-segment analysis:")
            # device segment id s == host span ordinal s (both count
            # end-timestamp boundaries), so iterate every slot and skip
            # empty ones consistently — iterating range(num_segments)
            # would silently drop trailing segments when a middle one is
            # empty (counts = [3, 0, 2] has num_segments == 2)
            for s in range(counts.shape[1]):
                if counts[b, s] <= 0:
                    continue
                gt_all.append(gt)
                pred_all.append(int(seg_preds[b, s]))
                total_segments += 1
                span = spans[s] if s < len(spans) else {"start": 0.0,
                                                        "end": 0.0,
                                                        "text": ""}
                pred_name = idx_to_style.get(int(seg_preds[b, s]),
                                             "Unknown")
                log_lines.append(
                    f"  Segment {s + 1} ({span['start']:.1f}s - "
                    f"{span['end']:.1f}s):")
                log_lines.append(f"    Text: \"{span['text']}\"")
                log_lines.append(f"    Predicted Emotion: {pred_name}")
            log_lines.append("")

    result = classification_metrics(gt_all, pred_all, idx_to_style)
    result["total_segments"] = total_segments

    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        # per-segment prediction log (reference evaluate.py:173-175,300-310)
        with open(os.path.join(output_dir, "predictions.txt"), "w") as f:
            f.write("\n".join(log_lines) + "\n")
        # exact reference segment_evaluation.txt format (evaluate.py:361-369)
        with open(os.path.join(output_dir, "segment_evaluation.txt"),
                  "w") as f:
            f.write(f"Total segments evaluated: {total_segments}\n")
            f.write(f"Segment-level Emotion Classification Accuracy: "
                    f"{result['accuracy']:.4f}\n")
            f.write(f"Segment-level Emotion Classification F1 Score: "
                    f"{result['weighted_f1']:.4f}\n\n")
            f.write("Detailed Classification Report:\n")
            f.write(result["report"])
    return result
