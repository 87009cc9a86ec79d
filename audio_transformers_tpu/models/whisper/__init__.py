from audio_transformers_tpu.models.whisper.model import (  # noqa: F401
    encode_jit,
    apply_decoder,
    apply_decoder_step,
    encode,
    init,
    init_cache,
    logits_from_hidden,
    pad_cross_time,
    param_axes,
    prepare_decode_params,
    precompute_cross_attention,
)
