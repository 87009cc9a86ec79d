"""EmotionWhisper: whisper encoder-decoder + linear emotion head.

Capability-equivalent to the reference `EmotionWhisperModel`
(reference: whisper_finetune/model.py:6-107):
  - training: mean-pool the last decoder hidden states over the sequence,
    one emotion logit row per sample (model.py:93-97)
  - inference: per-timestamp-segment mean pooling -> per-segment emotion
    logits (model.py:20-55, via ops/segment_pool here)

The decode loop already surfaces last-layer hiddens (decode.py), so
segment/sequence emotion comes from the SAME pass as transcription — the
reference re-encodes the audio and re-runs the decoder for its emotion pass
(evaluate_simple.py:141-143).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from audio_transformers_tpu.core.config import EmotionWhisperConfig
from audio_transformers_tpu.models.whisper import model as wm
from audio_transformers_tpu.ops import nn
from audio_transformers_tpu.ops.segment_pool import (masked_sequence_mean,
                                                     segment_ids_from_tokens,
                                                     segment_means)


def init(key: jax.Array, cfg: EmotionWhisperConfig) -> dict:
    kw, kh = jax.random.split(key)
    return {
        "whisper": wm.init(kw, cfg.whisper),
        "emotion_head": nn.linear_init(kh, cfg.whisper.d_model,
                                       cfg.num_emotion_classes),
    }


def param_axes(params: dict):
    """TP PartitionSpecs: whisper rules + replicated emotion head."""
    from jax.sharding import PartitionSpec as P

    axes = {"whisper": wm.param_axes(params["whisper"]),
            "emotion_head": jax.tree.map(lambda _: P(),
                                         params["emotion_head"])}
    return axes


def forward_train(params: dict, cfg: EmotionWhisperConfig, mel: jax.Array,
                  decoder_ids: jax.Array, *, remat: bool = False,
                  pooling: str = "all",
                  attn_impl: str = "auto") -> Tuple[jax.Array, jax.Array]:
    """Teacher-forced pass. Returns (token logits (B,T,V) fp32,
    emotion logits (B,C) fp32).

    pooling="all" mean-pools every decoder position including padding —
    exactly the reference's training-time pooling (model.py:96);
    pooling="masked" excludes pad positions (a documented improvement).
    attn_impl="flash" trains with the fused attention kernels (fwd+bwd).
    """
    w = cfg.whisper
    enc = wm.encode(params["whisper"], w, mel, remat=remat,
                    attn_impl=attn_impl)
    hidden = wm.apply_decoder(params["whisper"], w, enc, decoder_ids,
                              remat=remat, attn_impl=attn_impl)
    logits = wm.logits_from_hidden(params["whisper"], hidden)
    if pooling == "all":
        pooled = jnp.mean(hidden.astype(jnp.float32), axis=1)
    else:
        mask = decoder_ids != w.pad_token_id
        pooled = masked_sequence_mean(hidden, mask)
    emotion_logits = nn.linear(params["emotion_head"], pooled)
    return logits, emotion_logits.astype(jnp.float32)


def sequence_emotion_from_hiddens(params: dict, hiddens: jax.Array,
                                  lengths: Optional[jax.Array] = None,
                                  ) -> jax.Array:
    """(B, L, D) decode hiddens -> (B, C) sequence-level emotion logits.
    Pools over positions < lengths (or all positions if lengths is None,
    matching the reference's unmasked mean)."""
    if lengths is None:
        pooled = jnp.mean(hiddens.astype(jnp.float32), axis=1)
    else:
        mask = jnp.arange(hiddens.shape[1])[None, :] < lengths[:, None]
        pooled = masked_sequence_mean(hiddens, mask)
    return nn.linear(params["emotion_head"], pooled).astype(jnp.float32)


def segment_emotion_from_decode(params: dict, cfg: EmotionWhisperConfig,
                                decode_out: dict, *, prompt_len: int,
                                max_segments: Optional[int] = None) -> dict:
    """Per-segment emotion logits straight from a timestamped decode.

    Returns {"segment_logits" (B,S,C), "segment_counts" (B,S),
             "num_segments" (B,)}. Segments with count 0 are padding.

    `max_segments=None` (default) sizes the segment buffer from the decode
    buffer itself: a row of G generated tokens can close at most
    floor(G/2) timestamp pairs, +1 for the whole-sequence fallback slot —
    so NO segment can ever be silently dropped (the reference is uncapped,
    whisper_finetune/evaluate.py:60-94; a fixed cap of 16 lost segments
    past the 16th without warning). Pass an explicit int only to bound
    compute when callers independently guarantee the count.
    """
    w = cfg.whisper
    if max_segments is None:
        gen_len = decode_out["tokens"].shape[1] - prompt_len
        max_segments = max(gen_len // 2, 0) + 1
    seg_ids, valid = segment_ids_from_tokens(
        decode_out["tokens"], decode_out["lengths"],
        prompt_len=prompt_len, timestamp_begin=w.timestamp_begin_id,
        eos_token_id=w.eos_token_id)
    means, counts = segment_means(decode_out["hiddens"], seg_ids, valid,
                                  max_segments)
    logits = nn.linear(params["emotion_head"],
                       means.astype(jnp.float32)).astype(jnp.float32)
    num = jnp.sum((counts > 0).astype(jnp.int32), axis=1)
    # no-segment fallback: whole-sequence pooling as segment 0
    # (the reference's fallback path crashes: model.py:51; and its evaluator
    # synthesizes a pseudo-segment instead, evaluate.py:229-267)
    mask = jnp.arange(decode_out["hiddens"].shape[1])[None, :] \
        < decode_out["lengths"][:, None]
    seq_pooled = masked_sequence_mean(decode_out["hiddens"], mask)
    seq_logits = nn.linear(params["emotion_head"],
                           seq_pooled).astype(jnp.float32)
    empty = (num == 0)
    logits = logits.at[:, 0, :].set(
        jnp.where(empty[:, None], seq_logits, logits[:, 0, :]))
    counts = counts.at[:, 0].set(jnp.where(empty, 1.0, counts[:, 0]))
    num = jnp.where(empty, 1, num)
    return {"segment_logits": logits, "segment_counts": counts,
            "num_segments": num}
