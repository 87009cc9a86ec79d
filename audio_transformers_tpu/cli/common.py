"""Shared CLI plumbing: dataset construction and model loading from flags."""

from __future__ import annotations

from typing import Optional, Tuple

from audio_transformers_tpu.data.tokenizer import ByteTokenizer, load_tokenizer


def build_expresso_splits(args, tokenizer, *, duration: float = 3.0,
                          vocab_size: Optional[int] = None):
    """(train, val, test, style_to_idx) from --dataset flags.

    --dataset expresso needs network access to the HF hub; rather than
    silently substituting different training data, an unreachable hub is
    surfaced as a clear error pointing at --dataset synthetic."""
    from audio_transformers_tpu.data.expresso import (SIMPLE_STYLES,
                                                      SyntheticExpresso,
                                                      create_dataset)

    selected = SIMPLE_STYLES if getattr(args, "simple_styles", False) else None
    if args.dataset == "expresso":
        try:
            return create_dataset(tokenizer, selected_styles=selected,
                                  data_percentage=args.data_percentage,
                                  seed=args.seed)
        except (ConnectionError, OSError) as e:
            raise SystemExit(
                f"--dataset expresso: HF hub load failed ({e}). If this "
                "machine has no network access, use --dataset synthetic "
                "(the schema-faithful offline stand-in).") from e
    ds = SyntheticExpresso(tokenizer,
                           num_samples=getattr(args, "num_samples", 64),
                           styles=selected, duration=duration,
                           vocab_size=vocab_size, seed=args.seed)
    return ds.splits(seed=args.seed)


def build_classifier_batchers(args) -> Tuple:
    from audio_transformers_tpu.data.synthetic import SyntheticClassification
    from audio_transformers_tpu.data.urbansound import (UrbanSoundHFSource,
                                                        UrbanSoundLocalSource,
                                                        get_batchers)

    if args.dataset == "urbansound8k":
        src = UrbanSoundHFSource(limit_samples=args.limit_samples)
    elif args.dataset == "local":
        src = UrbanSoundLocalSource(args.data_dir,
                                    limit_samples=args.limit_samples)
        cache_dir = getattr(args, "waveform_cache", None)
        if cache_dir:
            # epochs >= 2 then serve mmap reads instead of re-decoding
            # (data/cache.py) — one host core covers the device demand
            src = src.cached(cache_dir)
    else:
        src = SyntheticClassification(
            num_samples=args.limit_samples or 64, seed=args.seed)
    return get_batchers(src, batch_size=args.batch_size,
                        val_split=args.val_split, seed=args.seed,
                        num_workers=getattr(args, "num_workers", 0))


def get_tokenizer(name_or_path: Optional[str]):
    if name_or_path in (None, "", "byte"):
        return ByteTokenizer()
    return load_tokenizer(name_or_path)


def load_pipeline(model_path: Optional[str], *, tokenizer=None, **kwargs):
    """Build an EmotionWhisperPipeline from a --model_path flag value.

    Single dispatch point shared by the infer/evaluate/evaluate_simple CLIs
    and both servers: an HF save_pretrained dir (model.safetensors /
    pytorch_model.bin) loads via from_hf_dir, anything else is treated as
    an orbax checkpoint dir, and None random-initializes (self-test mode,
    reference inference.py:239-300). Extra kwargs (kv_quant, compute_dtype,
    ...) forward to the pipeline constructor on every path.
    """
    import os

    from audio_transformers_tpu.infer.pipeline import EmotionWhisperPipeline

    if model_path is None:
        import jax

        from audio_transformers_tpu.core.config import EmotionWhisperConfig
        from audio_transformers_tpu.models.whisper import emotion as emo
        cfg = EmotionWhisperConfig()
        params = emo.init(jax.random.PRNGKey(0), cfg)
        return EmotionWhisperPipeline(params, cfg, tokenizer=tokenizer,
                                      **kwargs)
    if os.path.exists(os.path.join(model_path, "model.safetensors")) \
            or os.path.exists(os.path.join(model_path,
                                           "pytorch_model.bin")):
        return EmotionWhisperPipeline.from_hf_dir(model_path,
                                                  tokenizer=tokenizer,
                                                  **kwargs)
    return EmotionWhisperPipeline.from_checkpoint(model_path,
                                                  tokenizer=tokenizer,
                                                  **kwargs)
