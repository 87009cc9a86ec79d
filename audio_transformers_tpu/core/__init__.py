from audio_transformers_tpu.core.config import (  # noqa: F401
    DataConfig,
    DecodeConfig,
    EmotionWhisperConfig,
    MelConfig,
    OptimizerConfig,
    TrainConfig,
    UrbanSoundConfig,
    WhisperConfig,
)
