"""Shared CLI plumbing: dataset construction and model loading from flags."""

from __future__ import annotations

from typing import Optional, Tuple

from audio_transformers_tpu.data.tokenizer import ByteTokenizer, load_tokenizer


def build_expresso_splits(args, tokenizer, *, duration: float = 3.0,
                          vocab_size: Optional[int] = None):
    """(train, val, test, style_to_idx) from --dataset flags. Falls back to
    the synthetic stand-in when the HF hub is unreachable."""
    from audio_transformers_tpu.data.expresso import (SIMPLE_STYLES,
                                                      SyntheticExpresso,
                                                      create_dataset)

    selected = SIMPLE_STYLES if getattr(args, "simple_styles", False) else None
    if args.dataset == "expresso":
        return create_dataset(tokenizer, selected_styles=selected,
                              data_percentage=args.data_percentage,
                              seed=args.seed)
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
