"""HF-format export and Hub publishing.

Capability-equivalent to the reference's checkpoint/Hub pipeline
(reference: whisper_finetune/train.py:330-395 — save_pretrained dirs,
generation config, auto model card, HfApi upload_folder; and
urban_sounds/train_classifier.py:136-145). Exported state dicts use the
reference wrapper's key names (`whisper.model...` + `emotion_classifier.*`)
so users of the reference can load our fine-tuned models unchanged —
including the tied `whisper.proj_out.weight` they expect to re-tie.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np

from audio_transformers_tpu.core.config import EmotionWhisperConfig


def _t(a: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a, dtype=np.float32))


def to_torch_state_dict(params: dict, cfg: EmotionWhisperConfig,
                        *, wrapper_prefix: str = "whisper."
                        ) -> Dict[str, np.ndarray]:
    """Our pytree -> reference-format flat numpy state dict."""
    sd: Dict[str, np.ndarray] = {}
    wp = params["whisper"]

    def put(name, arr):
        sd[wrapper_prefix + name] = _t(arr)

    def put_linear(name, p, transpose=True):
        put(f"{name}.weight", np.asarray(p["w"]).T if transpose else p["w"])
        if "b" in p:
            put(f"{name}.bias", p["b"])

    def put_ln(name, p):
        put(f"{name}.weight", p["scale"])
        put(f"{name}.bias", p["bias"])

    def put_attn(name, p):
        put_linear(f"{name}.q_proj", p["q"])
        put_linear(f"{name}.k_proj", p["k"])
        put_linear(f"{name}.v_proj", p["v"])
        put_linear(f"{name}.out_proj", p["o"])

    enc = wp["encoder"]
    put("model.encoder.conv1.weight",
        np.asarray(enc["conv1"]["w"]).transpose(2, 1, 0))
    put("model.encoder.conv1.bias", enc["conv1"]["b"])
    put("model.encoder.conv2.weight",
        np.asarray(enc["conv2"]["w"]).transpose(2, 1, 0))
    put("model.encoder.conv2.bias", enc["conv2"]["b"])
    put("model.encoder.embed_positions.weight", enc["pos"])
    put_ln("model.encoder.layer_norm", enc["ln"])
    for i, bp in enumerate(enc["blocks"]):
        pre = f"model.encoder.layers.{i}"
        put_ln(f"{pre}.self_attn_layer_norm", bp["self_ln"])
        put_attn(f"{pre}.self_attn", bp["self_attn"])
        put_ln(f"{pre}.final_layer_norm", bp["mlp_ln"])
        put_linear(f"{pre}.fc1", bp["fc1"])
        put_linear(f"{pre}.fc2", bp["fc2"])

    dec = wp["decoder"]
    put("model.decoder.embed_tokens.weight", dec["embed"]["table"])
    put("model.decoder.embed_positions.weight", dec["pos"])
    put_ln("model.decoder.layer_norm", dec["ln"])
    for i, bp in enumerate(dec["blocks"]):
        pre = f"model.decoder.layers.{i}"
        put_ln(f"{pre}.self_attn_layer_norm", bp["self_ln"])
        put_attn(f"{pre}.self_attn", bp["self_attn"])
        put_ln(f"{pre}.encoder_attn_layer_norm", bp["cross_ln"])
        put_attn(f"{pre}.encoder_attn", bp["cross_attn"])
        put_ln(f"{pre}.final_layer_norm", bp["mlp_ln"])
        put_linear(f"{pre}.fc1", bp["fc1"])
        put_linear(f"{pre}.fc2", bp["fc2"])
    # tied output projection, materialized for reference loaders
    put("proj_out.weight", dec["embed"]["table"])

    if "emotion_head" in params and params["emotion_head"]:
        sd["emotion_classifier.weight"] = _t(
            np.asarray(params["emotion_head"]["w"]).T)
        sd["emotion_classifier.bias"] = _t(params["emotion_head"]["b"])
    return sd


def export_hf_dir(params: dict, cfg: EmotionWhisperConfig, out_dir: str, *,
                  style_to_idx: Optional[dict] = None,
                  val_loss: Optional[float] = None,
                  val_accuracy: Optional[float] = None) -> str:
    """Write an HF-compatible model dir: model.safetensors + config.json +
    generation_config.json + style_to_id.txt + README model card."""
    from safetensors.numpy import save_file

    os.makedirs(out_dir, exist_ok=True)
    sd = to_torch_state_dict(params, cfg)
    save_file(sd, os.path.join(out_dir, "model.safetensors"))

    w = cfg.whisper
    config = {
        "architectures": ["EmotionWhisperModel"],
        "model_type": "whisper",
        "vocab_size": w.vocab_size,
        "num_mel_bins": w.n_mels,
        "d_model": w.d_model,
        "encoder_layers": w.encoder_layers,
        "decoder_layers": w.decoder_layers,
        "encoder_attention_heads": w.num_heads,
        "decoder_attention_heads": w.num_heads,
        "encoder_ffn_dim": w.ffn_dim,
        "decoder_ffn_dim": w.ffn_dim,
        "max_source_positions": w.max_source_positions,
        "max_target_positions": w.max_target_positions,
        "pad_token_id": w.pad_token_id,
        "bos_token_id": w.bos_token_id,
        "eos_token_id": w.eos_token_id,
        "decoder_start_token_id": w.decoder_start_token_id,
        "num_emotion_classes": cfg.num_emotion_classes,
    }
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(config, f, indent=2)

    gen = {"forced_decoder_ids": None, "max_length": w.max_target_positions,
           "pad_token_id": w.pad_token_id, "eos_token_id": w.eos_token_id,
           "decoder_start_token_id": w.decoder_start_token_id,
           "no_timestamps_token_id": w.no_timestamps_token_id}
    with open(os.path.join(out_dir, "generation_config.json"), "w") as f:
        json.dump(gen, f, indent=2)

    if style_to_idx:
        from audio_transformers_tpu.core.checkpoint import save_label_map
        save_label_map(os.path.join(out_dir, "style_to_id.txt"),
                       style_to_idx)

    # auto model card (reference train.py:356-365)
    with open(os.path.join(out_dir, "README.md"), "w") as f:
        f.write("# Emotion-Aware Whisper Model (audio-transformers-tpu)\n\n")
        f.write("Whisper-tiny encoder-decoder with a linear emotion head, "
                "trained with the audio-transformers-tpu framework "
                "(JAX/TPU).\n\n")
        if val_loss is not None:
            f.write(f"Validation Loss: {val_loss:.4f}\n\n")
        if val_accuracy is not None:
            f.write(f"Emotion Accuracy: {val_accuracy:.4f}\n\n")
    return out_dir


def classifier_to_torch_state_dict(params: dict, state: dict
                                   ) -> Dict[str, np.ndarray]:
    """UrbanSound classifier pytree -> torch-convention state dict (the
    reference's artifact is a torch state_dict, best_model.pt:
    urban_sounds/train_classifier.py:129-133). Keys follow the reference
    architecture's module names."""
    sd: Dict[str, np.ndarray] = {}

    def lin(name, p):
        sd[f"{name}.weight"] = _t(np.asarray(p["w"]).T)
        if "b" in p:
            sd[f"{name}.bias"] = _t(p["b"])

    def conv(name, p):
        sd[f"{name}.weight"] = _t(np.asarray(p["w"]).transpose(2, 1, 0))
        sd[f"{name}.bias"] = _t(p["b"])

    def bn(name, p, s):
        sd[f"{name}.weight"] = _t(p["scale"])
        sd[f"{name}.bias"] = _t(p["bias"])
        if "mean" in s:  # group-norm variant carries no running stats
            sd[f"{name}.running_mean"] = _t(s["mean"])
            sd[f"{name}.running_var"] = _t(s["var"])

    def ln(name, p):
        sd[f"{name}.weight"] = _t(p["scale"])
        sd[f"{name}.bias"] = _t(p["bias"])

    conv("conv_module.conv1", params["conv1"])
    conv("conv_module.conv2", params["conv2"])
    bn("conv_module.bn1", params["bn1"], state["bn1"])
    bn("conv_module.bn2", params["bn2"], state["bn2"])
    if "proj" in params:
        lin("projection", params["proj"])
    sd["position_embeddings"] = _t(state["pos"])
    for i, bp in enumerate(params["blocks"]):
        pre = f"encoder_blocks.{i}"
        ln(f"{pre}.attn_ln", bp["attn_ln"])
        qw = _t(np.asarray(bp["attn"]["q"]["w"]).T)
        kw = _t(np.asarray(bp["attn"]["k"]["w"]).T)
        vw = _t(np.asarray(bp["attn"]["v"]["w"]).T)
        sd[f"{pre}.attn.in_proj_weight"] = np.concatenate([qw, kw, vw], 0)
        sd[f"{pre}.attn.in_proj_bias"] = np.concatenate(
            [_t(bp["attn"][k]["b"]) for k in ("q", "k", "v")], 0)
        lin(f"{pre}.attn.out_proj", bp["attn"]["o"])
        ln(f"{pre}.mlp_ln", bp["mlp_ln"])
        lin(f"{pre}.mlp.0", bp["fc1"])
        lin(f"{pre}.mlp.3", bp["fc2"])
    ln("ln_post", params["ln_post"])
    for i, cp in enumerate(params["cnn"]):
        conv(f"cnn_module.cnn_layers.{i}.0", cp["conv"])
        bn(f"cnn_module.cnn_layers.{i}.1", cp["bn"], state["cnn"][i])
    lin("classifier", params["cls"])
    return sd


def export_classifier(params: dict, state: dict, out_path: str) -> str:
    """Write the classifier as safetensors with torch-convention keys."""
    from safetensors.numpy import save_file

    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    save_file(classifier_to_torch_state_dict(params, state), out_path)
    return out_path


def push_to_hub(local_dir: str, repo_id: str,
                token: Optional[str] = None) -> bool:
    """Gated Hub upload (reference train.py:339-393; env var HF_ACCESS)."""
    token = token or os.environ.get("HF_ACCESS")
    if not token:
        print("[hub] HF_ACCESS not set; skipping upload")
        return False
    try:
        from huggingface_hub import HfApi
        api = HfApi(token=token)
        api.create_repo(repo_id=repo_id, exist_ok=True)
        api.upload_folder(folder_path=local_dir, repo_id=repo_id,
                          path_in_repo=".",
                          commit_message="Upload from audio-transformers-tpu")
        return True
    except Exception as e:
        print(f"[hub] upload failed: {e}")
        return False
