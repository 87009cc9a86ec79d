"""Fused Pallas TPU kernel for the log-mel front-end.

One kernel invocation per (batch row, frame tile):
  DMA a waveform row-block HBM->VMEM -> build overlapping frames as a
  static concat of row-shifted slices -> windowed rDFT as two MXU matmuls
  -> power -> mel filterbank matmul -> log.

Framing trick: the padded waveform is reshaped host-side to
(rows, row_w) where row_w = hop rounded up to the 128-lane tile (the tail
of each row is zero). Frame r then spans rows r..r+k-1 with
k = ceil(n_fft / hop), and the windowed rDFT of a tile of T frames is a
sum of k MXU matmuls over *static* row-shifted slices:

    re = sum_j rows[j : j + T, :] @ wcos[j*row_w : (j+1)*row_w, :]

with the basis rows laid out per row-chunk (zero rows under the row
padding and past n_fft). No dynamic or unaligned slicing anywhere —
Mosaic requires lane-dim slices to be 128-aligned, which rules out
per-frame windowing, and cannot concat vectors with mismatched sublane
offsets, which rules out materializing the frame matrix.

Compared to the XLA path (`mel.log_mel_xla`) this never materializes the
(B, T, n_fft) frame tensor in HBM (~2.5x data expansion for the Whisper
parameterization): HBM traffic is waveform-in / features-out only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audio_transformers_tpu.core.config import MelConfig
from audio_transformers_tpu.ops.mel import _windowed_bases

_LANE = 128


from audio_transformers_tpu.ops._tile import round_up as _round_up


@functools.lru_cache(maxsize=16)
def _padded_bases(cfg: MelConfig, k: int, row_w: int, n_freq_pad: int,
                  n_mel_pad: int):
    """DFT bases laid out in k row-chunks of row_w rows: chunk j holds
    windowed-basis rows [j*hop, j*hop+hop) (clipped at n_fft), zero rows
    elsewhere — matching the (rows, row_w) waveform layout."""
    wcos, wsin, fb = _windowed_bases(cfg)
    hop, n_fft = cfg.hop_length, cfg.n_fft

    def chunked(a):
        out = np.zeros((k * row_w, n_freq_pad), np.float32)
        for j in range(k):
            n = min(n_fft - j * hop, hop)
            out[j * row_w: j * row_w + n, : a.shape[1]] = a[j * hop: j * hop + n]
        return out

    fb_pad = np.zeros((n_freq_pad, n_mel_pad), np.float32)
    fb_pad[: fb.shape[0], : fb.shape[1]] = fb
    return chunked(wcos), chunked(wsin), fb_pad


def _mel_kernel(wav_hbm, wcos_ref, wsin_ref, fb_ref, out_ref,
                rows, sem, *, tile_t: int, k: int, fetch_rows: int,
                log_mode: str, power: float, precision):
    b = pl.program_id(0)
    i = pl.program_id(1)

    # Fetch this tile's waveform rows (the k-1 row overlap between
    # consecutive tiles is re-fetched; that's < 2% extra traffic).
    # fetch_rows is tile_t+k-1 rounded up to the sublane tile (8).
    dma = pltpu.make_async_copy(
        wav_hbm.at[b, pl.ds(i * tile_t, fetch_rows), :],
        rows,
        sem,
    )
    dma.start()
    dma.wait()

    # Windowed rDFT as a sum of k matmuls over row-shifted slices (see
    # module docstring).
    row_w = rows.shape[1]
    exact = jax.lax.Precision.HIGHEST

    def split(a):
        hi_part = a.astype(jnp.bfloat16)
        return hi_part, (a - hi_part.astype(jnp.float32)).astype(jnp.bfloat16)

    def dot3(a, b):
        """Mosaic rejects Precision.HIGH, so "high" emulates the 3-pass
        bf16 product manually: a@b ~= a_hi@b_hi + a_hi@b_lo + a_lo@b_hi
        (error ~2^-22 relative — half the MXU passes of HIGHEST)."""
        if precision == "highest":
            return jnp.dot(a, b, precision=exact,
                           preferred_element_type=jnp.float32)
        a_hi, a_lo = split(a)
        b_hi, b_lo = split(b)
        return (jnp.dot(a_hi, b_hi, preferred_element_type=jnp.float32)
                + jnp.dot(a_hi, b_lo, preferred_element_type=jnp.float32)
                + jnp.dot(a_lo, b_hi, preferred_element_type=jnp.float32))

    re = jnp.zeros((tile_t, wcos_ref.shape[1]), jnp.float32)
    im = jnp.zeros((tile_t, wcos_ref.shape[1]), jnp.float32)
    for j in range(k):
        rj = rows[j: j + tile_t, :]
        re += dot3(rj, wcos_ref[j * row_w: (j + 1) * row_w, :])
        im += dot3(rj, wsin_ref[j * row_w: (j + 1) * row_w, :])
    pw = re * re + im * im
    if power == 1.0:
        pw = jnp.sqrt(pw)
    # The mel projection reduces 201 frequency bins with non-negative
    # weights — one bf16 pass would be ~1e-3; keep 3-pass there too.
    mel = dot3(pw, fb_ref[:])

    if log_mode == "log_eps":
        out = jnp.log(mel + 1e-9)
    elif log_mode == "whisper":
        # log10 with clamp; the per-sample dynamic-range floor and (x+4)/4
        # normalization are cross-tile and applied in the XLA epilogue.
        out = jnp.log(jnp.maximum(mel, 1e-10)) * (1.0 / np.log(10.0))
    else:  # "none"
        out = mel
    out_ref[0] = out


def log_mel_pallas(waveform: jax.Array, cfg: MelConfig, *,
                   tile_t: int | None = None,
                   precision: str = "highest",
                   interpret: bool | None = None) -> jax.Array:
    """waveform (B, num_samples) -> (B, frames, n_mels) f32 features.

    Numerically matches `mel.log_mel_xla` / `mel.reference_log_mel`
    (tested to ~1e-4 at fp32). precision: see `mel.log_mel`.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if tile_t is None:
        tile_t = 128 if cfg.n_fft > 512 else 256

    from audio_transformers_tpu.ops.mel import _ensure_min_length
    waveform = _ensure_min_length(waveform.astype(jnp.float32), cfg)
    batch, num_samples = waveform.shape
    hop, n_fft = cfg.hop_length, cfg.n_fft

    if cfg.center:
        pad = n_fft // 2
        waveform = jnp.pad(waveform, ((0, 0), (pad, pad)), mode=cfg.pad_mode)
        t_full = num_samples // hop + 1
    else:
        t_full = (num_samples - n_fft) // hop + 1

    k = -(-n_fft // hop)  # frames span k rows of hop samples
    num_tiles = pl.cdiv(t_full, tile_t)
    fetch_rows = _round_up(tile_t + k - 1, 8)  # sublane-aligned DMA extent
    # Rows needed so the last tile's fetch stays in bounds.
    need_rows = (num_tiles - 1) * tile_t + fetch_rows
    need = need_rows * hop
    if waveform.shape[1] < need:
        waveform = jnp.pad(waveform, ((0, 0), (0, need - waveform.shape[1])))
    row_w = _round_up(hop, _LANE)  # lane-aligned row width (zero tail)
    wav_rows = waveform[:, :need].reshape(batch, need_rows, hop)
    if row_w != hop:
        wav_rows = jnp.pad(wav_rows, ((0, 0), (0, 0), (0, row_w - hop)))

    n_freq_pad = _round_up(cfg.n_freqs, _LANE)
    n_mel_pad = _round_up(cfg.n_mels, _LANE)
    wcos, wsin, fb = (jnp.asarray(a) for a in
                      _padded_bases(cfg, k, row_w, n_freq_pad, n_mel_pad))

    from audio_transformers_tpu.ops.mel import _matmul_precision
    _matmul_precision(precision)  # validate the name
    kernel = functools.partial(
        _mel_kernel, tile_t=tile_t, k=k, fetch_rows=fetch_rows,
        log_mode=cfg.log_mode, power=cfg.power, precision=precision,
    )

    flops_tile = 2 * tile_t * k * row_w * n_freq_pad * 2 \
        + 2 * tile_t * n_freq_pad * n_mel_pad
    out = pl.pallas_call(
        kernel,
        grid=(batch, num_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # waveform stays in HBM
            pl.BlockSpec((k * row_w, n_freq_pad), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k * row_w, n_freq_pad), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_freq_pad, n_mel_pad), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_t, n_mel_pad),
                               lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (batch, num_tiles * tile_t, n_mel_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((fetch_rows, row_w), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=batch * num_tiles * flops_tile,
            bytes_accessed=batch * (need * 4
                                    + num_tiles * tile_t * n_mel_pad * 4),
            transcendentals=batch * num_tiles * tile_t * n_mel_pad,
        ),
        interpret=interpret,
    )(wav_rows, wcos, wsin, fb)

    out = out[:, :t_full, : cfg.n_mels]

    if cfg.log_mode == "whisper":
        if cfg.drop_last_frame:
            out = out[:, :-1, :]
        floor = jnp.max(out, axis=(1, 2), keepdims=True) - 8.0
        out = jnp.maximum(out, floor)
        out = (out + 4.0) / 4.0
    return out
