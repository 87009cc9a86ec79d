"""Whisper encoder-decoder (whisper-tiny class), functional JAX.

First-party TPU-native replacement for the reference's dependency on HF
`WhisperForConditionalGeneration` (reference: whisper_finetune/model.py:12 —
the wrapped `self.whisper`), with the same architecture so pretrained
checkpoints import losslessly (load.py):

  encoder: conv1d(n_mels->D,k3,p1) GELU -> conv1d(D->D,k3,s2,p1) GELU
           -> +sinusoidal positions -> N pre-LN blocks -> LN
  decoder: tok embed + learned positions -> N pre-LN blocks
           (causal self-attn, cross-attn, MLP) -> LN
  logits:  hidden @ embed_tokens^T   (weight tying is structural here — the
           projection has no weights of its own, unlike the reference whose
           save/load path silently unties it, evaluate_simple.py:54-65)

Two decoder entry points:
  - apply_decoder: full-sequence teacher-forced pass (training/eval)
  - apply_decoder_step: single-token incremental pass over a fixed-size KV
    cache (the jit'd autoregressive decode; see decode.py)
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from audio_transformers_tpu.core.config import WhisperConfig
from audio_transformers_tpu.core.pytree import map_with_path, split_keys
from audio_transformers_tpu.ops import nn


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _block_init(key, dim: int, heads: int, ffn: int, *, cross: bool) -> dict:
    names = ["attn", "fc1", "fc2"] + (["cross"] if cross else [])
    ks = split_keys(key, names)
    p = {
        "self_ln": nn.layer_norm_init(dim),
        "self_attn": nn.mha_init(ks["attn"], dim, heads, k_bias=False),
        "mlp_ln": nn.layer_norm_init(dim),
        "fc1": nn.linear_init(ks["fc1"], dim, ffn),
        "fc2": nn.linear_init(ks["fc2"], ffn, dim),
    }
    if cross:
        p["cross_ln"] = nn.layer_norm_init(dim)
        p["cross_attn"] = nn.mha_init(ks["cross"], dim, heads, k_bias=False)
    return p


def init(key: jax.Array, cfg: WhisperConfig) -> dict:
    ks = split_keys(key, ["conv1", "conv2", "eblocks", "embed", "dpos",
                          "dblocks"])
    d = cfg.d_model
    enc = {
        "conv1": nn.conv1d_init(ks["conv1"], cfg.n_mels, d, 3),
        "conv2": nn.conv1d_init(ks["conv2"], d, d, 3),
        # Sinusoidal in the original model; a parameter in HF checkpoints —
        # kept as a parameter for import parity, initialized sinusoidally.
        "pos": nn.sinusoidal_embeddings(cfg.max_source_positions, d),
        "blocks": [
            _block_init(k, d, cfg.num_heads, cfg.ffn_dim, cross=False)
            for k in jax.random.split(ks["eblocks"], cfg.encoder_layers)],
        "ln": nn.layer_norm_init(d),
    }
    dec = {
        "embed": {"table": jax.random.normal(ks["embed"],
                                             (cfg.vocab_size, d)) * 0.02},
        "pos": jax.random.normal(ks["dpos"],
                                 (cfg.max_target_positions, d)) * 0.02,
        "blocks": [
            _block_init(k, d, cfg.num_heads, cfg.ffn_dim, cross=True)
            for k in jax.random.split(ks["dblocks"], cfg.decoder_layers)],
        "ln": nn.layer_norm_init(d),
    }
    return {"encoder": enc, "decoder": dec}


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _self_block(p: dict, x: jax.Array, heads: int, impl: str) -> jax.Array:
    h = nn.layer_norm(p["self_ln"], x)
    x = x + nn.multihead_attention(p["self_attn"], h, h, num_heads=heads,
                                   impl=impl)
    h = nn.layer_norm(p["mlp_ln"], x)
    x = x + nn.linear(p["fc2"], nn.gelu(nn.linear(p["fc1"], h)))
    return x


def encode(params: dict, cfg: WhisperConfig, mel: jax.Array, *,
           remat: bool = False, attn_impl: str = "xla") -> jax.Array:
    """mel: (B, T_mel, n_mels) -> encoder states (B, T_mel//2, d_model).

    attn_impl: "xla" | "flash" (fused Pallas kernel) | "auto".
    "auto" resolves to XLA here: for a pure forward pass the
    transpose-free XLA formulation measures FASTER than the flash kernel
    on v5e (74 vs 99 ms, whisper-tiny batch 128) — flash earns its keep in
    training, where its custom-VJP backward wins (44.6 vs 59.9 ms/step);
    the trainers resolve their own "auto" to flash on TPU (train/*.py).
    """
    if attn_impl == "auto":
        attn_impl = "xla"
    p = params["encoder"]
    x = nn.gelu(nn.conv1d(p["conv1"], mel, padding=1))
    x = nn.gelu(nn.conv1d(p["conv2"], x, stride=2, padding=1))
    t = x.shape[1]
    # The encoder positional table is FROZEN, like HF's
    # WhisperEncoder.embed_positions.requires_grad_(False): it stays in
    # params only for checkpoint/import parity (repo convention puts
    # non-trainables in state), so the gradient is stopped here. NB: a
    # nonzero optimizer weight_decay would still decay it (grads are
    # zero, decay is not) — OptimizerConfig defaults weight_decay to 0.
    x = x + jax.lax.stop_gradient(p["pos"])[None, :t, :].astype(x.dtype)
    block = _self_block
    if remat:
        block = jax.checkpoint(_self_block, static_argnums=(2, 3))
    for bp in p["blocks"]:
        x = block(bp, x, cfg.num_heads, attn_impl)
    return nn.layer_norm(p["ln"], x)


# ---------------------------------------------------------------------------
# decoder (full-sequence, teacher-forced)
# ---------------------------------------------------------------------------


def _cross_block(p: dict, x: jax.Array, enc: jax.Array, heads: int,
                 impl: str) -> jax.Array:
    h = nn.layer_norm(p["self_ln"], x)
    x = x + nn.multihead_attention(p["self_attn"], h, h, num_heads=heads,
                                   causal=True, impl=impl)
    h = nn.layer_norm(p["cross_ln"], x)
    x = x + nn.multihead_attention(p["cross_attn"], h, enc, num_heads=heads,
                                   impl=impl)
    h = nn.layer_norm(p["mlp_ln"], x)
    x = x + nn.linear(p["fc2"], nn.gelu(nn.linear(p["fc1"], h)))
    return x


def apply_decoder(params: dict, cfg: WhisperConfig, enc: jax.Array,
                  tokens: jax.Array, *, position_offset: int = 0,
                  remat: bool = False, attn_impl: str = "xla") -> jax.Array:
    """tokens: (B, T) -> last hidden states (B, T, d_model).

    Causal self-attention only (no padding mask) — deliberately matching the
    reference's teacher-forced training which passes no decoder attention
    mask (reference: whisper_finetune/train.py:195-202).

    "auto" -> XLA (inference-forward default; see `encode`). Trainers
    resolve their own "auto" to flash on TPU.
    """
    if attn_impl == "auto":
        attn_impl = "xla"
    p = params["decoder"]
    t = tokens.shape[1]
    x = nn.embedding_lookup(p["embed"], tokens)
    x = x + p["pos"][None, position_offset: position_offset + t, :]
    x = x.astype(enc.dtype)
    block = _cross_block
    if remat:
        block = jax.checkpoint(_cross_block, static_argnums=(3, 4))
    for bp in p["blocks"]:
        x = block(bp, x, enc, cfg.num_heads, attn_impl)
    return nn.layer_norm(p["ln"], x)


encode_jit = jax.jit(encode, static_argnames=("cfg", "remat", "attn_impl"))


def logits_from_hidden(params: dict, hidden: jax.Array) -> jax.Array:
    """Tied output projection: hidden @ embed^T -> (B, T, vocab) fp32."""
    table = params["decoder"]["embed"]["table"].astype(hidden.dtype)
    return jnp.einsum("btd,vd->btv", hidden, table,
                      preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# incremental decoding with a fixed-size KV cache
# ---------------------------------------------------------------------------


def init_cache(cfg: WhisperConfig, batch: int, *, max_len: Optional[int] = None,
               dtype=jnp.float32, quant: str = "none") -> dict:
    """Self-attention K/V buffers of static length, one per layer (lists,
    so a step updates each layer in place under while-loop buffer aliasing
    instead of re-stacking the whole cache). The reference decodes through
    HF's dynamic-shape Python loop, one sync per token
    (evaluate_simple.py:125-135).

    Layout (B, H, head_dim, L): like the cross K/V, time on the minor axis
    so the 64-wide head_dim doesn't get padded to 128 lanes — the cache is
    re-read in full every decode step.

    quant="int8": store K/V as int8 with one f32 scale per written time
    step, (B, H, L). Halves the cache re-read (the dominant per-step HBM
    read scales with the token budget: ~204 MB/step bf16 at batch 128 /
    256 new tokens) and both contractions run the int8 MXU path. Scales
    are per-time-step so the quantization stays exact under the
    incremental one-column-per-step write."""
    max_len = max_len or cfg.max_target_positions
    h, hd = cfg.num_heads, cfg.head_dim
    if quant not in ("none", "int8"):
        raise ValueError(f"unknown kv_quant {quant!r}")
    if quant == "int8":
        return {
            "k": [jnp.zeros((batch, h, hd, max_len), jnp.int8)
                  for _ in range(cfg.decoder_layers)],
            "v": [jnp.zeros((batch, h, hd, max_len), jnp.int8)
                  for _ in range(cfg.decoder_layers)],
            "k_scale": [jnp.zeros((batch, h, max_len), jnp.float32)
                        for _ in range(cfg.decoder_layers)],
            "v_scale": [jnp.zeros((batch, h, max_len), jnp.float32)
                        for _ in range(cfg.decoder_layers)],
            "index": jnp.zeros((), jnp.int32),
        }
    return {
        "k": [jnp.zeros((batch, h, hd, max_len), dtype)
              for _ in range(cfg.decoder_layers)],
        "v": [jnp.zeros((batch, h, hd, max_len), dtype)
              for _ in range(cfg.decoder_layers)],
        "index": jnp.zeros((), jnp.int32),
    }


def prepare_decode_params(params: dict, cfg: WhisperConfig,
                          dtype=None) -> dict:
    """Precompute step-optimized decoder weights OUTSIDE the decode loop:
    per layer, the self-attention q/k/v projections fused into one matmul
    (whisper k_proj has no bias; a zero bias keeps the fused add uniform).
    Cuts the per-step op count by ~2 matmuls x layers.

    `dtype` (e.g. bf16) casts every weight ONCE here instead of per decode
    step — the in-loop `astype` of fp32 weights otherwise re-reads the fp32
    copy from HBM every token, which dominates decode at small batch."""
    d = cfg.d_model
    layers = []
    for bp in params["decoder"]["blocks"]:
        sa = bp["self_attn"]
        qkv_w = jnp.concatenate(
            [sa["q"]["w"], sa["k"]["w"], sa["v"]["w"]], axis=1)  # (D, 3D)
        kb = sa["k"].get("b", jnp.zeros((d,), sa["q"]["b"].dtype))
        qkv_b = jnp.concatenate([sa["q"]["b"], kb, sa["v"]["b"]])
        layers.append({
            "self_ln": bp["self_ln"],
            "qkv": {"w": qkv_w, "b": qkv_b},
            "self_o": sa["o"],
            "cross_ln": bp["cross_ln"],
            "cross_q": bp["cross_attn"]["q"],
            "cross_o": bp["cross_attn"]["o"],
            "mlp_ln": bp["mlp_ln"],
            "fc1": bp["fc1"],
            "fc2": bp["fc2"],
        })
    out = {
        "embed": params["decoder"]["embed"],
        "pos": params["decoder"]["pos"],
        "blocks": layers,
        "ln": params["decoder"]["ln"],
    }
    if dtype is not None:
        out = jax.tree.map(lambda x: x.astype(dtype), out)
    return out


def precompute_cross_attention(params: dict, cfg: WhisperConfig,
                               enc: jax.Array, *,
                               quant: str = "none") -> dict:
    """Cross-attn K/V depend only on encoder output — compute once per
    audio segment instead of per decode step (the reference re-encodes audio
    for its second emotion pass; evaluate_simple.py:141-143).

    Layout: (layers, B, H, head_dim, T_enc) for BOTH k and v — time on
    the MINOR axis. head_dim is 64 on every whisper size; a (..., T, 64)
    layout pads the 64-wide minor dim to the TPU's 128 lanes, physically
    DOUBLING the hundreds of MB of cross-K/V that decode re-reads every
    step. This is also exactly the layout the fused decode kernel streams
    (ops/decode_attention.py).

    quant="int8": store K/V as int8 (K scaled per key vector, V per
    channel) so each decode step reads HALF the bytes. Decode at batch
    128 is bound by this re-read (~1.2 GB/step in bf16, whisper-tiny).
    The fused kernel folds the scales at the edges (logits row / output
    row), so neither q nor the probabilities are ever quantized.

    quant="int4": the same scale structure but 4-bit values nibble-packed
    pairwise along time (ops/decode_attention.pack_int4) — a QUARTER of
    the bf16 bytes per step. K scales are stored split even/odd as
    (B, H, 2, T/2) so the kernel never needs a strided lane slice; the
    scale rank is also what routes consumers to the int4 path. Lossier
    than int8 (~4 bits of logit mantissa) — an explicit accuracy/speed
    trade the caller opts into.

    Returned as PER-LAYER LISTS (like the self cache), not a stacked
    (L, ...) array: the fused kernel's operands must be whole buffers —
    a leading-axis slice of a stacked array inside the decode loop
    forces XLA to materialize the slice as a copy EVERY step.

    All 2L projections run as ONE matmul over the concatenated weights,
    emitted directly in the time-minor layout (einsum "btd,dc->bct") —
    the per-layer slices of the channel axis reshape to (B, H, hd, T)
    without any transpose copies. Same-process A/B (v5e, b128, int8,
    scripts/preloop_ab.py): 14.36 -> 10.17 ms for the full precompute;
    the same matmul in natural (B, T, C) layout followed by the old
    per-tensor transposes measures 19.98 ms, so the transposed-output
    dot is what XLA tiles well, not just the matmul fusion. Values match
    the per-layer formulation to f32-accumulation-order noise (exactly,
    when enc is f32)."""
    out = {"k": [], "v": []}
    if quant in ("int8", "int4"):
        out["k_scale"], out["v_scale"] = [], []
    elif quant != "none":
        raise ValueError(f"unknown kv_quant {quant!r}")
    qmax = 127.0 if quant == "int8" else 7.0
    d = cfg.d_model
    b, t = enc.shape[0], enc.shape[1]
    ws, bs = [], []
    for bp in params["decoder"]["blocks"]:
        for name in ("k", "v"):
            lin = bp["cross_attn"][name]
            ws.append(lin["w"])
            # whisper k_proj has no bias; zeros keep the fused add uniform
            bs.append(lin.get("b", jnp.zeros((d,), jnp.float32)))
    wf = jnp.concatenate(ws, axis=1).astype(enc.dtype)   # (D, 2L*D)
    bf = jnp.concatenate(bs).astype(jnp.float32)
    kv = (jnp.einsum("btd,dc->bct", enc, wf,
                     preferred_element_type=jnp.float32)
          + bf[None, :, None]).astype(enc.dtype)         # (B, 2L*D, T)
    for li in range(cfg.decoder_layers):
        k = kv[:, (2 * li) * d:(2 * li + 1) * d].reshape(
            b, cfg.num_heads, cfg.head_dim, t)           # (B, H, hd, T)
        v = kv[:, (2 * li + 1) * d:(2 * li + 2) * d].reshape(
            b, cfg.num_heads, cfg.head_dim, t)
        if quant == "none":
            out["k"].append(k)
            out["v"].append(v)
            continue
        # Reductions run on the storage dtype and only the (small) scales
        # are f32 — an fp32 copy of K/V here would materialize ~1.2 GB
        # twice (whisper-tiny, batch 128); the per-element convert fuses
        # into the quantizing division instead.
        # K: scale per key vector (over head_dim) — logits_t = <q, k_t>
        # scales linearly in k_scale_t, folded back after the contraction.
        k_scale = jnp.maximum(
            jnp.max(jnp.abs(k), axis=2, keepdims=True).astype(jnp.float32),
            1e-6) / qmax                               # (B,H,1,T)
        # V: scale per output channel (over time) — attn_d = sum_t p_t v_dt
        v_scale = jnp.maximum(
            jnp.max(jnp.abs(v), axis=3, keepdims=True).astype(jnp.float32),
            1e-6) / qmax                               # (B,H,hd,1)
        k_q = jnp.round(k.astype(jnp.float32) / k_scale)
        v_q = jnp.round(v.astype(jnp.float32) / v_scale)
        if quant == "int4":
            from audio_transformers_tpu.ops.decode_attention import \
                pack_int4
            if k.shape[-1] % 2:
                # a zero-padded phantom key would score 0 (not -inf) and
                # leak into the softmax; whisper encoder T is always even
                raise ValueError("kv_quant='int4' needs an even encoder "
                                 f"length, got T={k.shape[-1]}")
            out["k"].append(pack_int4(k_q.astype(jnp.int32)))
            out["v"].append(pack_int4(v_q.astype(jnp.int32)))
            ks = k_scale[:, :, 0, :]                   # (B,H,Teven)
            out["k_scale"].append(jnp.stack(
                [ks[..., 0::2], ks[..., 1::2]], axis=2))  # (B,H,2,T/2)
            out["v_scale"].append(v_scale[:, :, :, 0])
            continue
        out["k"].append(k_q.astype(jnp.int8))
        out["v"].append(v_q.astype(jnp.int8))
        out["k_scale"].append(k_scale[:, :, 0, :])     # (B,H,T)
        out["v_scale"].append(v_scale[:, :, :, 0])     # (B,H,hd)
    return out


def resolve_step_attn(attn_impl: str) -> str:
    """"auto" -> the fused Pallas kernel on TPU, XLA elsewhere.

    A/B this via DecodeConfig.step_attn, NOT an env var: the choice
    changes the traced program, and an env read here would not be part of
    the jit cache key — flipping it between calls with identical static
    args silently reuses the first-compiled program (CLAUDE.md "A/B
    variants MUST occupy distinct jit cache entries")."""
    if attn_impl == "auto":
        return "fused" if jax.default_backend() == "tpu" else "xla"
    return attn_impl


def pad_cross_time(cross: dict) -> dict:
    """Zero-pad the cross K/V time axis to the fused kernel's block
    multiple ONCE, recording the true key count as cross["t_valid"].
    Without this the kernel would pad its loop-invariant operands inside
    the decode loop — a full K/V copy per token (+3.3 ms/step measured
    at batch 128). Only the fused path may consume the padded dict; the
    XLA paths do not mask padded keys."""
    from audio_transformers_tpu.ops.decode_attention import (
        pad_time_for_decode_kernel, preferred_block_t)

    int4 = "k_scale" in cross and cross["k_scale"][0].ndim == 4
    if int4:
        # packed minor axis holds T/2 bytes; pad it to half the (true)
        # time-block multiple so the kernel grid divides evenly. The
        # int4 time block is rounded to a 256 multiple (its packed lane
        # extent is block/2 and Mosaic needs 128 alignment) — mirror of
        # decode_cross_attention's adjustment.
        t = 2 * cross["k"][0].shape[-1]
        blk = preferred_block_t(t)
        blk += (-blk) % 256
        t_pad = -(-t // blk) * blk

        def pad_half(x):
            want = t_pad // 2
            if x.shape[-1] == want:
                return x
            return jnp.pad(
                x, ((0, 0),) * (x.ndim - 1) + ((0, want - x.shape[-1]),))

        out = dict(cross)
        out["k"] = [pad_half(x) for x in cross["k"]]
        out["v"] = [pad_half(x) for x in cross["v"]]
        out["k_scale"] = [pad_half(x) for x in cross["k_scale"]]
        out["t_valid"] = t
        return out
    t = cross["k"][0].shape[-1]
    out = dict(cross)
    out["k"] = [pad_time_for_decode_kernel(x, t) for x in cross["k"]]
    out["v"] = [pad_time_for_decode_kernel(x, t) for x in cross["v"]]
    if "k_scale" in cross:
        out["k_scale"] = [pad_time_for_decode_kernel(x, t)
                          for x in cross["k_scale"]]
    out["t_valid"] = t
    return out


def apply_decoder_step(params: dict, cfg: WhisperConfig, token: jax.Array,
                       cache: dict, cross: dict, *,
                       step_params: Optional[dict] = None,
                       attn_impl: str = "auto",
                       beams: int = 1) -> Tuple[jax.Array, dict]:
    """One decode step. token: (B,) int32; returns (hidden (B, d), cache).

    Writes this step's K/V at cache["index"], attends over the valid
    prefix. Pass `step_params` (from `prepare_decode_params`) to use the
    fused-QKV fast path; built on the fly otherwise.

    attn_impl: "fused" routes cross-attention through the single-query
    Pallas kernel (ops/decode_attention — sublane-oriented reductions;
    the XLA lowering of the same contractions measures ~4x off HBM
    bandwidth and dominates the decode step). "auto" resolves to "fused"
    on TPU, "xla" elsewhere (the kernel runs interpreted off-TPU).
    Self-attention always stays on the XLA path — the cache is short and
    measures at ~3% of the step (scripts/decode_phase_bench.py).

    beams > 1: token and cache hold B*beams rows while `cross` holds the
    UNEXPANDED B encoder rows — every beam of a batch row shares its
    cross K/V through a batched einsum (dot_general with batch dims
    (b, h) and the beam axis free on q), so the dominant per-step K/V
    read happens once per batch row, not once per beam. Beam decode
    always takes the XLA cross path: the fused kernel is single-query
    (M=1, VPU-bound); at M=beams the MXU batched matmul is the right
    engine anyway.
    """
    attn_impl = resolve_step_attn(attn_impl)
    if beams > 1 and attn_impl == "fused":
        attn_impl = "xla"
    sp = step_params if step_params is not None \
        else prepare_decode_params(params, cfg)
    idx = cache["index"]
    b = token.shape[0]
    d = cfg.d_model
    self_quant = "k_scale" in cache
    x = nn.embedding_lookup(sp["embed"], token)  # (B, D)
    x = x + jax.lax.dynamic_slice_in_dim(sp["pos"], idx, 1, axis=0)
    x = x.astype(sp["blocks"][0]["qkv"]["w"].dtype)

    max_len = cache["k"][0].shape[3]
    pos_ids = jnp.arange(max_len)
    attn_mask = (pos_ids <= idx)[None, None, :]  # (1,1,L)

    new_cache = {"index": idx + 1,
                 "k": [], "v": []}
    if self_quant:
        new_cache["k_scale"], new_cache["v_scale"] = [], []
    scale = 1.0 / math.sqrt(cfg.head_dim)
    h_heads, hd = cfg.num_heads, cfg.head_dim

    def _q8(vec):
        """(B, H, hd) -> (int8 (B,H,hd), f32 scale (B,H,1))."""
        v32 = vec.astype(jnp.float32)
        s = jnp.maximum(jnp.max(jnp.abs(v32), axis=-1, keepdims=True),
                        1e-6) / 127.0
        return jnp.round(v32 / s).astype(jnp.int8), s

    for li, bp in enumerate(sp["blocks"]):
        h = nn.layer_norm(bp["self_ln"], x)
        qkv = nn.linear(bp["qkv"], h)  # (B, 3D)
        q = qkv[:, :d].reshape(b, h_heads, hd)
        k_new = qkv[:, d:2 * d].reshape(b, h_heads, hd)
        v_new = qkv[:, 2 * d:].reshape(b, h_heads, hd)
        if self_quant:
            # int8 self-KV: per-time-step scales — quantization of past
            # entries never changes as the cache fills, so the write stays
            # one column per step.
            k_q, ks = _q8(k_new)
            v_q, vs = _q8(v_new)
            k_all = jax.lax.dynamic_update_slice(
                cache["k"][li], k_q[..., None], (0, 0, 0, idx))
            v_all = jax.lax.dynamic_update_slice(
                cache["v"][li], v_q[..., None], (0, 0, 0, idx))
            ks_all = jax.lax.dynamic_update_slice(
                cache["k_scale"][li], ks, (0, 0, idx))
            vs_all = jax.lax.dynamic_update_slice(
                cache["v_scale"][li], vs, (0, 0, idx))
            new_cache["k_scale"].append(ks_all)
            new_cache["v_scale"].append(vs_all)
            q_i8, q_s = _q8(q)
            l_i32 = jnp.einsum("bhd,bhdk->bhk", q_i8, k_all,
                               preferred_element_type=jnp.int32)
            logits = l_i32.astype(jnp.float32) * q_s * ks_all * scale
            logits = jnp.where(attn_mask, logits,
                               jnp.finfo(jnp.float32).min)
            probs = jax.nn.softmax(logits, axis=-1)
            # fold the per-step V scales into the probabilities, then
            # quantize the folded row for the int8 PV contraction
            p = probs * vs_all
            p_s = jnp.maximum(jnp.max(p, axis=-1, keepdims=True),
                              1e-30) / 127.0
            p_i8 = jnp.round(p / p_s).astype(jnp.int8)
            a_i32 = jnp.einsum("bhk,bhdk->bhd", p_i8, v_all,
                               preferred_element_type=jnp.int32)
            attn = (a_i32.astype(jnp.float32) * p_s).astype(x.dtype)
        else:
            k_all = jax.lax.dynamic_update_slice(
                cache["k"][li], k_new[..., None], (0, 0, 0, idx))
            v_all = jax.lax.dynamic_update_slice(
                cache["v"][li], v_new[..., None], (0, 0, 0, idx))
            logits = jnp.einsum("bhd,bhdk->bhk", q, k_all,
                                preferred_element_type=jnp.float32) * scale
            logits = jnp.where(attn_mask, logits,
                               jnp.finfo(jnp.float32).min)
            probs = jax.nn.softmax(logits, axis=-1).astype(v_all.dtype)
            attn = jnp.einsum("bhk,bhdk->bhd", probs, v_all,
                              preferred_element_type=jnp.float32
                              ).astype(x.dtype)
        new_cache["k"].append(k_all)
        new_cache["v"].append(v_all)
        x = x + nn.linear(bp["self_o"], attn.reshape(b, d))

        h = nn.layer_norm(bp["cross_ln"], x)
        cq = nn.linear(bp["cross_q"], h).reshape(b, h_heads, hd)
        cross_quant = "k_scale" in cross
        if attn_impl == "fused":
            # Pallas kernel: sublane-oriented reductions for both
            # contractions, scales folded at the edges (see
            # ops/decode_attention.py). This IS the decode step's cost on
            # TPU — the XLA lowering runs ~4x off HBM bandwidth.
            from audio_transformers_tpu.ops.decode_attention import (
                decode_cross_attention)
            cattn = decode_cross_attention(
                cq, cross["k"][li], cross["v"][li],
                k_scale=cross["k_scale"][li] if cross_quant else None,
                v_scale=cross["v_scale"][li] if cross_quant else None,
                t_valid=cross.get("t_valid"),
                scale=scale).astype(x.dtype)
        elif beams > 1:
            # Beam decode: q carries B*beams rows, cross K/V only B — a
            # batched einsum with the beam axis free on q shares each
            # (b, h) K/V read across all beams (dot_general batch dims
            # (b, h), M=beams).
            nb = b // beams
            cqb = cq.reshape(nb, beams, h_heads, hd)
            kq, vq = cross["k"][li], cross["v"][li]
            int4 = cross_quant and cross["k_scale"][li].ndim == 4
            t_val = cross.get("t_valid")
            if t_val is not None and not int4 \
                    and kq.shape[-1] != t_val:
                # the XLA einsums below do not mask kernel-block padding,
                # and slicing a loop-invariant operand here would copy the
                # whole cache every step
                raise ValueError("beam decode expects unpadded cross K/V "
                                 "(do not pad_cross_time for beams)")
            if int4:
                # int4 + beams: dequantize per step (the nibble-packed
                # layout has no beam-batched einsum). Correctness path —
                # prefer kv_quant="int8" when beam-decoding for speed.
                from audio_transformers_tpu.ops.decode_attention import \
                    unpack_int4
                ksq = cross["k_scale"][li]
                if t_val is not None:
                    kq = kq[..., : t_val // 2]
                    vq = vq[..., : t_val // 2]
                    ksq = ksq[..., : t_val // 2]
                k_s = ksq.transpose(0, 1, 3, 2).reshape(
                    *ksq.shape[:2], -1)                     # (B,H,T)
                kf = unpack_int4(kq).astype(jnp.float32) \
                    * k_s[:, :, None, :]
                vf = unpack_int4(vq).astype(jnp.float32) \
                    * cross["v_scale"][li][:, :, :, None]
                clog = jnp.einsum("bnhd,bhdk->bnhk",
                                  cqb.astype(jnp.float32), kf) * scale
                cp = jax.nn.softmax(clog, axis=-1)
                cattn = jnp.einsum("bnhk,bhdk->bnhd", cp, vf)
            elif cross_quant:
                # int8: quantize q per (b, beam, h) row, int8 QK, fold
                # scales back in fp32; PV dequantizes V inside the dot.
                cq32 = cqb.astype(jnp.float32)
                q_scale = jnp.maximum(jnp.max(jnp.abs(cq32), axis=-1,
                                              keepdims=True), 1e-6) / 127.0
                q_i8 = jnp.round(cq32 / q_scale).astype(jnp.int8)
                cl_i32 = jnp.einsum("bnhd,bhdk->bnhk", q_i8, kq,
                                    preferred_element_type=jnp.int32)
                clog = (cl_i32.astype(jnp.float32) * q_scale
                        * cross["k_scale"][li][:, None, :, :] * scale)
                cp = jax.nn.softmax(clog, axis=-1)
                ca = jnp.einsum("bnhk,bhdk->bnhd", cp,
                                vq.astype(jnp.float32),
                                preferred_element_type=jnp.float32)
                cattn = ca * cross["v_scale"][li][:, None, :, :]
            else:
                clog = jnp.einsum("bnhd,bhdk->bnhk", cqb, kq,
                                  preferred_element_type=jnp.float32
                                  ) * scale
                cp = jax.nn.softmax(clog, axis=-1).astype(vq.dtype)
                cattn = jnp.einsum("bnhk,bhdk->bnhd", cp, vq,
                                   preferred_element_type=jnp.float32)
            cattn = cattn.astype(x.dtype).reshape(b, h_heads, hd)
        elif cross_quant and cross["k_scale"][li].ndim == 4:
            # XLA int4 fallback (off-TPU tests): dequantize via the
            # kernel's oracle — perf is irrelevant on this path.
            from audio_transformers_tpu.ops.decode_attention import (
                decode_cross_attention_reference)
            t_val = cross.get("t_valid")
            kq, vq = cross["k"][li], cross["v"][li]
            ksq = cross["k_scale"][li]
            if t_val is not None:  # drop kernel-block padding
                kq, vq = kq[..., :t_val // 2], vq[..., :t_val // 2]
                ksq = ksq[..., :t_val // 2]
            cattn = decode_cross_attention_reference(
                cq, kq, vq, k_scale=ksq,
                v_scale=cross["v_scale"][li], scale=scale).astype(x.dtype)
        elif cross_quant:
            # XLA int8 fallback: quantize q per (b, h) row, int8
            # contractions, fold the scales back in fp32.
            cq32 = cq.astype(jnp.float32)
            q_scale = jnp.maximum(jnp.max(jnp.abs(cq32), axis=-1,
                                          keepdims=True), 1e-6) / 127.0
            q_i8 = jnp.round(cq32 / q_scale).astype(jnp.int8)
            cl_i32 = jnp.einsum("bhd,bhdk->bhk", q_i8, cross["k"][li],
                                preferred_element_type=jnp.int32)
            clogits = (cl_i32.astype(jnp.float32) * q_scale
                       * cross["k_scale"][li] * scale)
            cprobs = jax.nn.softmax(clogits, axis=-1)
            # per-row scale (max prob / 127): full int8 resolution even
            # when attention is flat and the max prob is far below 1
            p_scale = jnp.max(cprobs, axis=-1, keepdims=True) / 127.0
            p_i8 = jnp.round(cprobs / p_scale).astype(jnp.int8)
            ca_i32 = jnp.einsum("bhk,bhdk->bhd", p_i8, cross["v"][li],
                                preferred_element_type=jnp.int32)
            cattn = (ca_i32.astype(jnp.float32) * p_scale
                     * cross["v_scale"][li]).astype(x.dtype)
        else:
            # XLA fallback: k and v (B,H,hd,T), T on the minor (lane) axis
            clogits = jnp.einsum("bhd,bhdk->bhk", cq, cross["k"][li],
                                 preferred_element_type=jnp.float32) * scale
            cprobs = jax.nn.softmax(clogits, axis=-1).astype(x.dtype)
            cattn = jnp.einsum("bhk,bhdk->bhd", cprobs, cross["v"][li],
                               preferred_element_type=jnp.float32
                               ).astype(x.dtype)
        x = x + nn.linear(bp["cross_o"], cattn.reshape(b, d))

        h = nn.layer_norm(bp["mlp_ln"], x)
        x = x + nn.linear(bp["fc2"], nn.gelu(nn.linear(bp["fc1"], h)))

    x = nn.layer_norm(sp["ln"], x)
    return x, new_cache


# ---------------------------------------------------------------------------
# sharding
# ---------------------------------------------------------------------------


def param_axes(params: dict):
    """TP PartitionSpecs over a "model" axis: attention q/k/v/o over heads,
    MLP over hidden, embedding over vocab. DP-only meshes ignore these
    (SURVEY.md §2c: models are tiny; DP is the workload strategy, TP stays a
    mesh-shape change)."""

    def _axes_for(path: str, x) -> P:
        if path.endswith(("attn/q/w", "attn/k/w", "attn/v/w", "fc1/w")):
            return P(None, "model")
        if path.endswith(("attn/q/b", "attn/v/b", "fc1/b")):
            return P("model")
        if path.endswith(("attn/o/w", "fc2/w")):
            return P("model", None)
        if path.endswith("embed/table"):
            return P("model", None)
        return P()

    return map_with_path(_axes_for, params)
