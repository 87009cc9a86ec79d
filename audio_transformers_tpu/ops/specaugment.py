"""SpecAugment: on-device time/frequency masking of log-mel features.

Not present in the reference (its training applies no feature
augmentation); included as the standard audio-training capability the
framework should ship (SURVEY.md §7 dsp/ sketch). Pure jnp — fuses into
the jit'd train step right after the mel front-end.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def spec_augment(rng: jax.Array, mel: jax.Array, *,
                 num_time_masks: int = 2, max_time_frac: float = 0.05,
                 num_freq_masks: int = 2, max_freq: int = 8,
                 mask_value: Optional[float] = None) -> jax.Array:
    """mel (B, T, F) -> masked mel. Masks are independent per sample.

    mask_value=None replaces with the per-sample mean (keeps the whisper
    feature normalization roughly intact); otherwise a constant.
    """
    b, t, f = mel.shape
    fill = (jnp.mean(mel, axis=(1, 2), keepdims=True)
            if mask_value is None
            else jnp.full((b, 1, 1), mask_value, mel.dtype))

    keys = jax.random.split(rng, 4)
    max_t = max(1, int(t * max_time_frac))

    def axis_mask(key_start, key_len, num_masks, size, max_len):
        starts = jax.random.randint(key_start, (b, num_masks), 0, size)
        lens = jax.random.randint(key_len, (b, num_masks), 0, max_len + 1)
        pos = jnp.arange(size)[None, None, :]
        m = (pos >= starts[:, :, None]) & (pos < (starts + lens)[:, :, None])
        return jnp.any(m, axis=1)  # (B, size)

    tmask = axis_mask(keys[0], keys[1], num_time_masks, t, max_t)
    fmask = axis_mask(keys[2], keys[3], num_freq_masks, f, max_freq)
    full = tmask[:, :, None] | fmask[:, None, :]
    return jnp.where(full, fill.astype(mel.dtype), mel)
