"""UrbanSound8K classifier: conv front-end -> transformer encoder -> CNN head.

Capability-equivalent to the reference `UrbanSoundModel`
(reference: urban_sounds/model.py:95-214):
  - Conv1dModule: two conv1d over mel channels, second with stride 2,
    each BatchNorm + GELU (model.py:6-31)
  - optional linear projection conv_dim -> encoder_dim (model.py:124)
  - sinusoidal position embeddings — the reference's generator crashes on a
    `torch.arrange` typo (model.py:153); we implement the intended concat
    [sin|cos] embedding (ops.nn.sinusoidal_embeddings_ref)
  - N pre-LN encoder blocks: LN->MHA->residual, LN->MLP(4x, GELU)->residual
    (model.py:33-59)
  - final LayerNorm (model.py:135)
  - CNNModule: conv1d stacks + global average pool (model.py:61-92)
  - linear classifier (model.py:144)

TPU-first differences: channels-last activations throughout (no transposes
around the encoder), one functional pytree, BatchNorm batch-stats reduce
over the *global* sharded batch under DP (sync-BN for free via GSPMD), and
the whole forward is jit-compiled with the mel front-end fused in.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from audio_transformers_tpu.core.config import UrbanSoundConfig
from audio_transformers_tpu.core.pytree import split_keys
from audio_transformers_tpu.ops import nn


def _norm_groups(dim: int) -> int:
    g = 32
    while dim % g:
        g //= 2
    return max(g, 1)


def _norm_init(cfg: UrbanSoundConfig, dim: int) -> Tuple[dict, dict]:
    """norm_type="batch": BatchNorm params + running-stat state (reference
    BatchNorm1d). norm_type="group": GroupNorm params, empty state — the
    DP-friendly deviation (no cross-replica running stats)."""
    if cfg.norm_type == "group":
        return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}, {}
    return nn.batch_norm_init(dim)


def _norm_apply(cfg: UrbanSoundConfig, p: dict, s: dict, x: jax.Array, *,
                training: bool) -> Tuple[jax.Array, dict]:
    if cfg.norm_type == "group":
        return nn.group_norm(p, x, num_groups=_norm_groups(
            p["scale"].shape[0])), s
    return nn.batch_norm(p, s, x, training=training)


def init(key: jax.Array, cfg: UrbanSoundConfig) -> Tuple[dict, dict]:
    """Returns (params, state). state holds BatchNorm running stats."""
    if cfg.norm_type not in ("batch", "group"):
        raise ValueError(f"unknown norm_type {cfg.norm_type!r}")
    ks = split_keys(key, ["conv1", "conv2", "proj", "blocks", "cnn", "cls"])
    params: dict = {}
    state: dict = {}

    params["conv1"] = nn.conv1d_init(ks["conv1"], cfg.n_mels, cfg.conv_dim,
                                     cfg.conv_kernel)
    params["conv2"] = nn.conv1d_init(ks["conv2"], cfg.conv_dim, cfg.conv_dim,
                                     cfg.conv_kernel)
    params["bn1"], state["bn1"] = _norm_init(cfg, cfg.conv_dim)
    params["bn2"], state["bn2"] = _norm_init(cfg, cfg.conv_dim)

    if cfg.conv_dim != cfg.encoder_dim:
        params["proj"] = nn.linear_init(ks["proj"], cfg.conv_dim,
                                        cfg.encoder_dim)

    bkeys = jax.random.split(ks["blocks"], cfg.num_encoder_blocks)
    params["blocks"] = []
    for bk in bkeys:
        sub = split_keys(bk, ["attn", "fc1", "fc2"])
        params["blocks"].append({
            "attn_ln": nn.layer_norm_init(cfg.encoder_dim),
            "attn": nn.mha_init(sub["attn"], cfg.encoder_dim, cfg.num_heads),
            "mlp_ln": nn.layer_norm_init(cfg.encoder_dim),
            "fc1": nn.linear_init(sub["fc1"], cfg.encoder_dim,
                                  4 * cfg.encoder_dim),
            "fc2": nn.linear_init(sub["fc2"], 4 * cfg.encoder_dim,
                                  cfg.encoder_dim),
        })
    params["ln_post"] = nn.layer_norm_init(cfg.encoder_dim)

    params["cnn"] = []
    state["cnn"] = []
    ckeys = jax.random.split(ks["cnn"], len(cfg.cnn_dims))
    in_dim = cfg.encoder_dim
    for ck, dim in zip(ckeys, cfg.cnn_dims):
        bn_p, bn_s = _norm_init(cfg, dim)
        params["cnn"].append({
            "conv": nn.conv1d_init(ck, in_dim, dim, 3),
            "bn": bn_p,
        })
        state["cnn"].append(bn_s)
        in_dim = dim

    params["cls"] = nn.linear_init(ks["cls"], cfg.cnn_dims[-1],
                                   cfg.num_classes)
    # Position table is a deterministic non-trainable buffer (the reference
    # registers it as a torch buffer, model.py:127) — kept in `state` so the
    # optimizer never touches it.
    state["pos"] = nn.sinusoidal_embeddings_ref(cfg.max_positions,
                                                cfg.encoder_dim)
    return params, state


def _encoder_block(p: dict, x: jax.Array, cfg: UrbanSoundConfig, *,
                   training: bool, rng: Optional[jax.Array]) -> jax.Array:
    k0 = k1 = k2 = None
    if rng is not None:
        k0, k1, k2 = jax.random.split(rng, 3)
    h = nn.layer_norm(p["attn_ln"], x)
    # attention-prob dropout matches the reference's
    # MultiheadAttention(dropout=...) (urban_sounds/model.py:39)
    x = x + nn.multihead_attention(
        p["attn"], h, h, num_heads=cfg.num_heads,
        dropout_rate=cfg.dropout if training else 0.0, dropout_rng=k0)
    h = nn.layer_norm(p["mlp_ln"], x)
    h = nn.gelu(nn.linear(p["fc1"], h))
    h = nn.dropout(k1, h, cfg.dropout, training=training)
    h = nn.linear(p["fc2"], h)
    h = nn.dropout(k2, h, cfg.dropout, training=training)
    return x + h


def apply(params: dict, state: dict, cfg: UrbanSoundConfig, mel: jax.Array, *,
          training: bool = False,
          rng: Optional[jax.Array] = None) -> Tuple[jax.Array, dict]:
    """mel: (B, T, n_mels) log-mel features -> (logits (B, classes), state)."""
    new_state = {"cnn": [], "pos": state["pos"]}
    x = mel

    # Conv front-end (time stride 2 on the second conv).
    x = nn.conv1d(params["conv1"], x, padding=cfg.conv_kernel // 2)
    x, new_state["bn1"] = _norm_apply(cfg, params["bn1"], state["bn1"], x,
                                      training=training)
    x = nn.gelu(x)
    x = nn.conv1d(params["conv2"], x, stride=2, padding=cfg.conv_kernel // 2)
    x, new_state["bn2"] = _norm_apply(cfg, params["bn2"], state["bn2"], x,
                                      training=training)
    x = nn.gelu(x)

    if "proj" in params:
        x = nn.linear(params["proj"], x)

    seq_len = x.shape[1]
    x = x + state["pos"][None, :seq_len, :].astype(x.dtype)

    rngs = (jax.random.split(rng, cfg.num_encoder_blocks)
            if rng is not None else [None] * cfg.num_encoder_blocks)
    for p, r in zip(params["blocks"], rngs):
        x = _encoder_block(p, x, cfg, training=training, rng=r)
    x = nn.layer_norm(params["ln_post"], x)

    # CNN head + global average pool over time.
    for p, s in zip(params["cnn"], state["cnn"]):
        x = nn.conv1d(p["conv"], x, padding=1)
        x, ns = _norm_apply(cfg, p["bn"], s, x, training=training)
        new_state["cnn"].append(ns)
        x = nn.gelu(x)
    x = jnp.mean(x, axis=1)

    logits = nn.linear(params["cls"], x)
    return logits, new_state


def param_axes(params: dict):
    """PartitionSpecs for tensor parallelism over a "model" mesh axis.

    The model is tiny (~3.9M params) so DP is the workload's strategy
    (SURVEY.md §2c); these annotations keep TP a mesh-shape change. MHA
    projections shard over heads (fused dim), MLP over the hidden dim.
    """

    def _axes_for(path: str, x) -> P:
        if "blocks" in path:
            if path.endswith("attn/q/w") or path.endswith("attn/k/w") \
                    or path.endswith("attn/v/w"):
                return P(None, "model")
            if path.endswith(("attn/q/b", "attn/k/b", "attn/v/b")):
                return P("model")
            if path.endswith("attn/o/w"):
                return P("model", None)
            if path.endswith("fc1/w"):
                return P(None, "model")
            if path.endswith("fc1/b"):
                return P("model")
            if path.endswith("fc2/w"):
                return P("model", None)
        return P()

    from audio_transformers_tpu.core.pytree import map_with_path
    return map_with_path(_axes_for, params)
