"""Functional neural-net primitives (init/apply pairs) on XLA.

Layout conventions are TPU-first:
  - activations are channels-last `(batch, time, channels)` so the channel
    dim maps onto the 128-lane axis and matmuls hit the MXU;
  - matmuls always request fp32 accumulation via `preferred_element_type`;
  - GELU is the exact (erf) variant to match the reference's torch
    `F.gelu` / HF activations (reference: urban_sounds/model.py:29,46;
    whisper uses "gelu" activations).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def gelu(x: Array) -> Array:
    return jax.nn.gelu(x, approximate=False)


def _torch_uniform_bound(fan_in: int) -> float:
    # torch's default kaiming_uniform(a=sqrt(5)) reduces to U(+-1/sqrt(fan_in)).
    return 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0


# ---------------------------------------------------------------------------
# Linear
# ---------------------------------------------------------------------------


def linear_init(key: Array, in_dim: int, out_dim: int, *, use_bias: bool = True,
                dtype=jnp.float32) -> dict:
    kw, kb = jax.random.split(key)
    bound = _torch_uniform_bound(in_dim)
    p = {"w": jax.random.uniform(kw, (in_dim, out_dim), dtype, -bound, bound)}
    if use_bias:
        p["b"] = jax.random.uniform(kb, (out_dim,), dtype, -bound, bound)
    return p


def linear(params: dict, x: Array) -> Array:
    y = jnp.dot(x, params["w"].astype(x.dtype),
                preferred_element_type=jnp.float32)
    if "b" in params:
        y = y + params["b"].astype(jnp.float32)
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# Conv1d (channels-last: x (B, T, Cin), kernel (K, Cin, Cout))
# ---------------------------------------------------------------------------


def conv1d_init(key: Array, in_dim: int, out_dim: int, kernel_size: int, *,
                use_bias: bool = True, dtype=jnp.float32) -> dict:
    kw, kb = jax.random.split(key)
    fan_in = in_dim * kernel_size
    bound = _torch_uniform_bound(fan_in)
    p = {"w": jax.random.uniform(kw, (kernel_size, in_dim, out_dim), dtype,
                                 -bound, bound)}
    if use_bias:
        p["b"] = jax.random.uniform(kb, (out_dim,), dtype, -bound, bound)
    return p


def conv1d(params: dict, x: Array, *, stride: int = 1,
           padding: str | int = "same") -> Array:
    """x: (B, T, Cin) -> (B, T', Cout)."""
    if isinstance(padding, int):
        pad = [(padding, padding)]
    elif padding == "same":
        k = params["w"].shape[0]
        pad = [(k // 2, (k - 1) // 2)]
    else:
        pad = padding
    # No preferred_element_type here: conv requires matching operand dtypes
    # and its VJP breaks with a widened cotangent; the MXU accumulates in
    # fp32 internally regardless, so bf16-in/bf16-out is safe for k=3 convs.
    y = jax.lax.conv_general_dilated(
        x, params["w"].astype(x.dtype),
        window_strides=(stride,),
        padding=pad,
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    if "b" in params:
        y = (y.astype(jnp.float32) + params["b"].astype(jnp.float32))
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# Normalization
# ---------------------------------------------------------------------------


def layer_norm_init(dim: int, dtype=jnp.float32) -> dict:
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm(params: dict, x: Array, *, eps: float = 1e-5) -> Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def batch_norm_init(dim: int, dtype=jnp.float32) -> tuple[dict, dict]:
    """Returns (params, state). State holds running mean/var + step count.

    Under data parallelism the batch-stat reductions below are over the
    globally sharded batch axis, so GSPMD lowers them to cross-replica
    collectives automatically — sync-BN for free (reference BatchNorm1d is
    single-device: urban_sounds/model.py:24-25).
    """
    params = {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}
    state = {
        "mean": jnp.zeros((dim,), jnp.float32),
        "var": jnp.ones((dim,), jnp.float32),
    }
    return params, state


def batch_norm(params: dict, state: dict, x: Array, *, training: bool,
               momentum: float = 0.1, eps: float = 1e-5) -> tuple[Array, dict]:
    """x: (B, T, C) — normalizes over (B, T) per channel (torch BatchNorm1d
    semantics with channels-last layout)."""
    xf = x.astype(jnp.float32)
    if training:
        mean = jnp.mean(xf, axis=(0, 1))
        var = jnp.mean(jnp.square(xf - mean), axis=(0, 1))
        n = x.shape[0] * x.shape[1]
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype), new_state


def group_norm(params: dict, x: Array, *, num_groups: int = 32,
               eps: float = 1e-5) -> Array:
    """DP-friendly alternative to batch norm (no running state)."""
    b, t, c = x.shape
    g = min(num_groups, c)
    xf = x.astype(jnp.float32).reshape(b, t, g, c // g)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(b, t, c)
    return (y * params["scale"] + params["bias"]).astype(x.dtype)


# ---------------------------------------------------------------------------
# Embeddings
# ---------------------------------------------------------------------------


def embedding_init(key: Array, vocab: int, dim: int, *, scale: float = 1.0,
                   dtype=jnp.float32) -> dict:
    return {"table": jax.random.normal(key, (vocab, dim), dtype) * scale}


def embedding_lookup(params: dict, ids: Array) -> Array:
    return jnp.take(params["table"], ids, axis=0)


def sinusoidal_embeddings(length: int, dim: int,
                          max_timescale: float = 10000.0) -> jnp.ndarray:
    """Whisper-style sinusoids: concat(sin, cos) over channels.

    Also the intended behavior of the reference's (crashing)
    `_get_sinusoidal_embeddings` (reference: urban_sounds/model.py:150-164 —
    the torch.arrange typo at :153 is the bug we fix).
    """
    half = dim // 2
    freqs = jnp.exp(-jnp.arange(half, dtype=jnp.float32)
                    * (math.log(max_timescale) / max(half - 1, 1)))
    args = jnp.arange(length, dtype=jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if dim % 2 == 1:
        emb = jnp.concatenate([emb, jnp.zeros((length, 1), jnp.float32)], axis=-1)
    return emb


def sinusoidal_embeddings_ref(length: int, dim: int,
                              max_timescale: float = 10000.0) -> jnp.ndarray:
    """The reference repo's intended variant (denominator `half`, not
    `half-1`; reference: urban_sounds/model.py:153)."""
    half = dim // 2
    freqs = jnp.exp(-jnp.arange(half, dtype=jnp.float32)
                    * (math.log(max_timescale) / half))
    args = jnp.arange(length, dtype=jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


# ---------------------------------------------------------------------------
# Multi-head attention (XLA path; Pallas flash kernel lives in ops/attention)
# ---------------------------------------------------------------------------


def mha_init(key: Array, dim: int, num_heads: int, *, dtype=jnp.float32,
             k_bias: bool = True) -> dict:
    assert dim % num_heads == 0
    ks = jax.random.split(key, 4)
    return {
        "q": linear_init(ks[0], dim, dim, dtype=dtype),
        "k": linear_init(ks[1], dim, dim, use_bias=k_bias, dtype=dtype),
        "v": linear_init(ks[2], dim, dim, dtype=dtype),
        "o": linear_init(ks[3], dim, dim, dtype=dtype),
    }


def attention_weights(q: Array, k: Array, *, mask: Optional[Array] = None,
                      scale: Optional[float] = None) -> Array:
    """q: (B, H, Tq, D), k: (B, H, Tk, D) -> (B, H, Tq, Tk) fp32 probs."""
    d = q.shape[-1]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    return jax.nn.softmax(logits, axis=-1)


def _linear_heads(lin: dict, x: Array, num_heads: int) -> Array:
    """Projection emitting (B, H, T, hd) directly (no materialized
    transpose): x (B,T,D) @ w (D,H,hd) -> bhtk."""
    d = lin["w"].shape[0]
    hd = lin["w"].shape[1] // num_heads
    w = lin["w"].astype(x.dtype).reshape(d, num_heads, hd)
    y = jnp.einsum("btd,dhk->bhtk", x, w,
                   preferred_element_type=jnp.float32)
    if "b" in lin:
        y = y + lin["b"].astype(jnp.float32).reshape(1, num_heads, 1, hd)
    return y.astype(x.dtype)


def split_heads(x: Array, num_heads: int) -> Array:
    b, t, d = x.shape
    return x.reshape(b, t, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: Array) -> Array:
    b, h, t, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * d)


def multihead_attention(params: dict, q_in: Array, kv_in: Array, *,
                        num_heads: int, mask: Optional[Array] = None,
                        impl: str = "xla", causal: bool = False,
                        dropout_rate: float = 0.0,
                        dropout_rng: Optional[Array] = None) -> Array:
    """Self- or cross-attention. q_in (B,Tq,D); kv_in (B,Tk,D).

    impl="flash" uses the fused Pallas kernel (forward-only; inference
    paths) — it supports no mask beyond `causal` and no dropout.
    impl="xla" is the differentiable unfused path (training), with
    optional attention-probability dropout (torch MultiheadAttention
    semantics; pass a rng to enable).
    """
    if impl == "flash":
        if mask is not None:
            # a bare assert disappears under python -O and the mask
            # would be SILENTLY ignored
            raise NotImplementedError(
                "flash path supports only causal masking; pass impl='xla' "
                "for arbitrary masks")
        from audio_transformers_tpu.ops.attention import flash_attention
        # Project straight into the kernel's head-major (B, H, T, hd)
        # layout with 3-D-reshaped weights — XLA folds the permutation
        # into the matmul epilogue instead of materializing the
        # split_heads/merge_heads transposes. Same-process A/B (v5e,
        # whisper-tiny encoder blocks, batch 16): 37.3 -> 36.0 ms
        # fwd+bwd, consistent across rounds.
        q = _linear_heads(params["q"], q_in, num_heads)
        k = _linear_heads(params["k"], kv_in, num_heads)
        v = _linear_heads(params["v"], kv_in, num_heads)
        out = flash_attention(q, k, v, causal=causal)
        d = q_in.shape[-1]
        hd = d // num_heads
        w_o = params["o"]["w"].astype(out.dtype).reshape(num_heads, hd, -1)
        y = jnp.einsum("bhtk,hkd->btd", out, w_o,
                       preferred_element_type=jnp.float32)
        if "b" in params["o"]:
            y = y + params["o"]["b"].astype(jnp.float32)
        return y.astype(q_in.dtype)

    # XLA path stays in (B, T, H, hd) — a pure reshape off the projection.
    # Materialized (B, H, T, hd) transposes are ~40 GB/s copies on TPU and
    # drag the surrounding layer-norm fusions into strided layouts (profiled
    # at ~55 ms of a 78 ms whisper-tiny encoder pass, batch 128); the einsum
    # batch dims handle the head axis without them.
    b, tq, d = q_in.shape
    hd = d // num_heads
    q = linear(params["q"], q_in).reshape(b, tq, num_heads, hd)
    k = linear(params["k"], kv_in).reshape(b, -1, num_heads, hd)
    v = linear(params["v"], kv_in).reshape(b, -1, num_heads, hd)
    if causal and mask is None:
        mask = causal_mask(tq)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(hd)
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        probs = dropout(dropout_rng, probs, dropout_rate, training=True)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32
                     ).astype(q_in.dtype)
    return linear(params["o"], out.reshape(b, tq, d))


def causal_mask(t: int) -> Array:
    return jnp.tril(jnp.ones((t, t), jnp.bool_))[None, None, :, :]


def dropout(key: Optional[Array], x: Array, rate: float, *,
            training: bool) -> Array:
    if not training or rate <= 0.0 or key is None:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)
