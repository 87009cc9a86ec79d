from audio_transformers_tpu.models.urbansound.model import (  # noqa: F401
    apply,
    init,
    param_axes,
)
