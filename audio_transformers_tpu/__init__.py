"""audio_transformers_tpu — a TPU-native audio transformer framework.

A ground-up JAX/XLA/Pallas/pjit framework with the capabilities of the
reference `k0r1g/audio-transformers` repo (UrbanSound8K conv-transformer
classifier; Whisper-tiny encoder-decoder with an emotion head, dual-loss
fine-tuning, timestamped segment-level emotion, evaluation and serving),
re-designed TPU-first:

- fused mel-spectrogram front-end (DFT-as-matmul on the MXU, Pallas kernel)
- functional pytree models, jit-compiled train/eval/decode steps
- KV-cached autoregressive decoding with on-device logit processors
- data/tensor parallelism over `jax.sharding.Mesh` (ICI collectives via XLA)
- orbax checkpointing, metric logging, config dataclasses, CLI entry points

Subpackages:
  core/      config, pytree/param utilities, checkpointing, metrics
  ops/       TPU compute: mel front-end, attention, nn primitives, logit processors
  parallel/  mesh construction and sharding rules
  models/    urbansound classifier, whisper encoder-decoder (+ emotion head)
  data/      host-side data pipelines (UrbanSound8K, Expresso, synthetic)
  train/     jit'd training loops (classifier, dual-loss whisper-emotion)
  infer/     batched chunked long-audio inference, label maps
  serve/     demo app on the JAX inference path
  cli/       command-line entry points (flag-compatible with the reference)
  utils/     audio IO, misc helpers
"""

__version__ = "0.1.0"
