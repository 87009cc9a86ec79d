"""Import HF Whisper checkpoints into the functional pytree.

Accepts state dicts from either `WhisperForConditionalGeneration` (keys
`model.encoder...`) or the reference's `EmotionWhisperModel` wrapper (keys
`whisper.model.encoder...` plus `emotion_classifier.*`; reference:
whisper_finetune/model.py:12-15). `proj_out.weight` is ignored — tying is
structural on our side (the reference's loaders must manually re-tie it:
reference inference.py:36-48, evaluate_simple.py:54-65).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from audio_transformers_tpu.core.config import WhisperConfig


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _linear(sd, prefix: str, *, bias: bool = True) -> dict:
    p = {"w": _np(sd[f"{prefix}.weight"]).T}
    if bias and f"{prefix}.bias" in sd:
        p["b"] = _np(sd[f"{prefix}.bias"])
    return p


def _conv(sd, prefix: str) -> dict:
    # torch conv1d weight (out, in, k) -> ours (k, in, out)
    return {"w": _np(sd[f"{prefix}.weight"]).transpose(2, 1, 0),
            "b": _np(sd[f"{prefix}.bias"])}


def _ln(sd, prefix: str) -> dict:
    return {"scale": _np(sd[f"{prefix}.weight"]),
            "bias": _np(sd[f"{prefix}.bias"])}


def _attn(sd, prefix: str) -> dict:
    return {
        "q": _linear(sd, f"{prefix}.q_proj"),
        "k": _linear(sd, f"{prefix}.k_proj"),  # whisper k_proj has no bias
        "v": _linear(sd, f"{prefix}.v_proj"),
        "o": _linear(sd, f"{prefix}.out_proj"),
    }


def from_torch_state_dict(sd: Dict, cfg: WhisperConfig) \
        -> Tuple[dict, Optional[dict]]:
    """Returns (whisper params pytree, emotion head params or None)."""
    sd = dict(sd)
    if any(k.startswith("whisper.") for k in sd):
        sd = {(k[len("whisper."):] if k.startswith("whisper.") else k): v
              for k, v in sd.items()}

    enc = {
        "conv1": _conv(sd, "model.encoder.conv1"),
        "conv2": _conv(sd, "model.encoder.conv2"),
        "pos": _np(sd["model.encoder.embed_positions.weight"]),
        "ln": _ln(sd, "model.encoder.layer_norm"),
        "blocks": [],
    }
    for i in range(cfg.encoder_layers):
        pre = f"model.encoder.layers.{i}"
        enc["blocks"].append({
            "self_ln": _ln(sd, f"{pre}.self_attn_layer_norm"),
            "self_attn": _attn(sd, f"{pre}.self_attn"),
            "mlp_ln": _ln(sd, f"{pre}.final_layer_norm"),
            "fc1": _linear(sd, f"{pre}.fc1"),
            "fc2": _linear(sd, f"{pre}.fc2"),
        })

    dec = {
        "embed": {"table": _np(sd["model.decoder.embed_tokens.weight"])},
        "pos": _np(sd["model.decoder.embed_positions.weight"]),
        "ln": _ln(sd, "model.decoder.layer_norm"),
        "blocks": [],
    }
    for i in range(cfg.decoder_layers):
        pre = f"model.decoder.layers.{i}"
        dec["blocks"].append({
            "self_ln": _ln(sd, f"{pre}.self_attn_layer_norm"),
            "self_attn": _attn(sd, f"{pre}.self_attn"),
            "cross_ln": _ln(sd, f"{pre}.encoder_attn_layer_norm"),
            "cross_attn": _attn(sd, f"{pre}.encoder_attn"),
            "mlp_ln": _ln(sd, f"{pre}.final_layer_norm"),
            "fc1": _linear(sd, f"{pre}.fc1"),
            "fc2": _linear(sd, f"{pre}.fc2"),
        })

    emotion = None
    if "emotion_classifier.weight" in sd:
        emotion = _linear(sd, "emotion_classifier")

    return {"encoder": enc, "decoder": dec}, emotion


def config_from_hf(hf_config) -> WhisperConfig:
    """Build our WhisperConfig from a transformers.WhisperConfig.

    Timestamp/task token ids are derived from the vocab version
    (WhisperConfig.token_overrides_for_vocab): HF's config.json does not
    carry them, and the class defaults are the v2 ids — without the
    override a large-v3 import would decode with <|nospeech|> in the
    prompt and misclassify every timestamp token."""
    return WhisperConfig(
        **WhisperConfig.token_overrides_for_vocab(hf_config.vocab_size),
        vocab_size=hf_config.vocab_size,
        n_mels=hf_config.num_mel_bins,
        d_model=hf_config.d_model,
        encoder_layers=hf_config.encoder_layers,
        decoder_layers=hf_config.decoder_layers,
        num_heads=hf_config.encoder_attention_heads,
        ffn_dim=hf_config.encoder_ffn_dim,
        max_source_positions=hf_config.max_source_positions,
        max_target_positions=hf_config.max_target_positions,
        pad_token_id=hf_config.pad_token_id,
        bos_token_id=hf_config.bos_token_id,
        eos_token_id=hf_config.eos_token_id,
        decoder_start_token_id=hf_config.decoder_start_token_id,
    )


def config_from_json(d: dict) -> WhisperConfig:
    """Build WhisperConfig from an HF-style config.json dict (same
    vocab-derived token-id overrides as config_from_hf)."""
    return WhisperConfig(
        **WhisperConfig.token_overrides_for_vocab(
            d.get("vocab_size", 51865)),
        vocab_size=d.get("vocab_size", 51865),
        n_mels=d.get("num_mel_bins", 80),
        d_model=d.get("d_model", 384),
        encoder_layers=d.get("encoder_layers", 4),
        decoder_layers=d.get("decoder_layers", 4),
        num_heads=d.get("encoder_attention_heads", 6),
        ffn_dim=d.get("encoder_ffn_dim", 1536),
        max_source_positions=d.get("max_source_positions", 1500),
        max_target_positions=d.get("max_target_positions", 448),
        pad_token_id=d.get("pad_token_id", 50257),
        bos_token_id=d.get("bos_token_id", 50257),
        eos_token_id=d.get("eos_token_id", 50257),
        decoder_start_token_id=d.get("decoder_start_token_id", 50258),
    )


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Load a state dict from a .safetensors file or an HF save_pretrained
    directory (model.safetensors, falling back to pytorch_model.bin)."""
    import os

    if os.path.isdir(path):
        st = os.path.join(path, "model.safetensors")
        bin_ = os.path.join(path, "pytorch_model.bin")
        if os.path.exists(st):
            path = st
        elif os.path.exists(bin_):
            import torch
            return torch.load(bin_, map_location="cpu")
        else:
            raise FileNotFoundError(
                f"no model.safetensors or pytorch_model.bin in {path!r} "
                "(sharded index checkpoints are not supported)")
    from safetensors.numpy import load_file
    return load_file(path)
