"""Parity rehearsal for the reference's published Expresso result.

The one concrete accuracy anchor in the reference is sequence-level
emotion accuracy 0.925734 on the Expresso test split (reference:
whisper_finetune/eval_out/metrics.txt:2; protocol: train.py defaults —
whisper-tiny, batch 5, lr 3e-5, 8 epochs, emotion_weight 0.5 — then
evaluate_simple.py greedy decode, max 100 new tokens). This environment
has no network, so a full reproduction is impossible HERE; this script
provides both halves:

  --mode rehearsal (default, offline): the EXACT protocol on
      SyntheticExpresso — whisper-tiny geometry (51865 vocab, 80 mels,
      full 30 s windows -> 1500 encoder frames), batch 5, AdamW 3e-5 with
      10% linear warmup, dual loss 0.5, 8 epochs — with the synthetic
      dataset sized to LEARN (768 clips -> 626/71/71 splits; the classes
      are separable by construction, data/synthetic.py). The committed
      artifact reaches 1.0 held-out emotion accuracy on 71 test samples
      (val emotion accuracy 1.0 by epoch 3): the offline proxy for the
      0.925734 anchor. Logs per-epoch loss curves + clips/sec to
      metrics.jsonl and runs the sequence-level evaluator end-to-end
      (metrics.txt, predictions.txt).

  --mode real (networked machine): one command for the actual
      reproduction —

      python scripts/parity_rehearsal.py --mode real \
          --pretrained /path/to/whisper-tiny/model.safetensors \
          --tokenizer openai/whisper-tiny

      loads ylacombe/expresso via HF datasets, fine-tunes from pretrained
      whisper-tiny with the reference protocol (8 epochs, batch 5), and
      writes eval_out/metrics.txt in the reference's exact format for a
      line-by-line diff against 0.925734 / 0.921336.

Dataset construction is driven by core.config.DataConfig (dataset,
data_percentage, num_workers, seed), the config tree's data section.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Expresso parity rehearsal")
    p.add_argument("--mode", default="rehearsal",
                   choices=["rehearsal", "real"])
    # reference protocol defaults (whisper_finetune/train.py:59-83)
    p.add_argument("--epochs", type=int, default=None,
                   help="default: 8 (the reference protocol) in both modes")
    p.add_argument("--batch_size", type=int, default=5)
    p.add_argument("--lr", type=float, default=3e-5)
    p.add_argument("--emotion_weight", type=float, default=0.5)
    p.add_argument("--data_percentage", type=float, default=1.0)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--num_samples", type=int, default=768,
                   help="synthetic dataset size (rehearsal mode); 768 -> "
                        "626/71/71 splits, sized so the dual-loss path "
                        "actually learns the class-separable synthetic "
                        "mapping (1.0 held-out emotion accuracy), not "
                        "just runs the protocol")
    p.add_argument("--pretrained", default=None,
                   help="whisper safetensors to initialize from (real mode)")
    p.add_argument("--tokenizer", default=None,
                   help="HF tokenizer name/path; byte tokenizer if unset")
    p.add_argument("--output_dir", default="artifacts/parity_rehearsal")
    p.add_argument("--compute_dtype", default="bfloat16")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    epochs = args.epochs or 8

    import jax

    from audio_transformers_tpu.cli.common import get_tokenizer
    from audio_transformers_tpu.core.config import (DataConfig,
                                                    EmotionWhisperConfig,
                                                    MelConfig,
                                                    OptimizerConfig,
                                                    TrainConfig)
    from audio_transformers_tpu.data.expresso import (SyntheticExpresso,
                                                      create_dataset)
    from audio_transformers_tpu.infer.evaluate import evaluate_sequence_level
    from audio_transformers_tpu.models.whisper import emotion as emo
    from audio_transformers_tpu.train.whisper_emotion import (
        train_whisper_emotion)

    data_cfg = DataConfig(
        dataset="expresso" if args.mode == "real" else "synthetic",
        duration=30.0, sample_rate=16000,
        data_percentage=args.data_percentage,
        num_workers=args.num_workers, seed=args.seed)

    tokenizer = get_tokenizer(args.tokenizer)
    cfg = EmotionWhisperConfig()          # whisper-tiny, 51865 vocab
    mel_cfg = MelConfig.whisper()

    if data_cfg.dataset == "expresso":
        train_ds, val_ds, test_ds, style_to_idx = create_dataset(
            tokenizer, data_percentage=data_cfg.data_percentage,
            seed=data_cfg.seed)
    else:
        ds = SyntheticExpresso(tokenizer, num_samples=args.num_samples,
                               duration=data_cfg.duration,
                               vocab_size=cfg.whisper.vocab_size,
                               seed=data_cfg.seed)
        train_ds, val_ds, test_ds, style_to_idx = ds.splits(
            seed=data_cfg.seed)
    cfg = cfg.replace(num_emotion_classes=len(style_to_idx))
    idx_to_style = {v: k for k, v in style_to_idx.items()}
    print(f"[rehearsal] mode={args.mode} classes={len(style_to_idx)} "
          f"train/val/test = {train_ds.num_samples}/{val_ds.num_samples}/"
          f"{test_ds.num_samples}")

    init_params = None
    if args.pretrained:
        from audio_transformers_tpu.models.whisper.load import (
            from_torch_state_dict, load_safetensors)
        sd = load_safetensors(args.pretrained)
        whisper_params, emotion = from_torch_state_dict(sd, cfg.whisper)
        base = emo.init(jax.random.PRNGKey(args.seed), cfg)
        init_params = {"whisper": whisper_params,
                       "emotion_head": emotion or base["emotion_head"]}

    train_cfg = TrainConfig(
        batch_size=args.batch_size, num_epochs=epochs, seed=args.seed,
        compute_dtype=args.compute_dtype,
        emotion_weight=args.emotion_weight,
        optimizer=OptimizerConfig(name="adamw", learning_rate=args.lr,
                                  schedule="linear_warmup_decay",
                                  warmup_fraction=0.1))

    out = train_whisper_emotion(
        cfg, mel_cfg, train_cfg,
        train_ds.batcher(args.batch_size, seed=args.seed,
                         num_workers=data_cfg.num_workers),
        val_ds.batcher(args.batch_size, seed=args.seed,
                       num_workers=data_cfg.num_workers),
        init_params=init_params, style_to_idx=style_to_idx,
        output_dir=args.output_dir)

    # Sequence-level evaluation on the test split — the reference's
    # published-metric path (evaluate_simple.py), exact artifact formats.
    eval_dir = os.path.join(args.output_dir, "eval_out")
    # best-by-val-loss params: the reference evaluates its saved best model
    # (evaluate_simple.py loads the checkpoint dir), not the final epoch
    result = evaluate_sequence_level(
        out["best_params"], cfg, mel_cfg, test_ds.batcher(args.batch_size),
        idx_to_style, tokenizer=tokenizer, output_dir=eval_dir)

    summary = {
        "mode": args.mode,
        "protocol": {"model": "whisper-tiny", "batch_size": args.batch_size,
                     "lr": args.lr, "epochs": epochs,
                     "emotion_weight": args.emotion_weight},
        "best_val_loss": out["best_val_loss"],
        "loss_curve": [{"epoch": r["epoch"], "train_loss": r["train/loss"],
                        "val_loss": r["val/loss"],
                        "clips_per_sec": r["clips_per_sec"]}
                       for r in out["history"]],
        "test_accuracy": result["accuracy"],
        "test_weighted_f1": result["weighted_f1"],
        "test_samples": result["samples"],
        "reference_anchor": {"accuracy": 0.925734, "weighted_f1": 0.921336,
                             "source": "whisper_finetune/eval_out/"
                                       "metrics.txt"},
    }
    with open(os.path.join(args.output_dir, "rehearsal_summary.json"),
              "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({k: summary[k] for k in
                      ("mode", "best_val_loss", "test_accuracy",
                       "test_samples")}))
    return summary


if __name__ == "__main__":
    main()
