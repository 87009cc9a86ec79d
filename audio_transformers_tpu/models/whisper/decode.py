"""jit-compiled autoregressive decoding with a KV cache.

The reference decodes through HF `generate` — a host Python loop with one
device sync per token (reference: whisper_finetune/evaluate_simple.py:125-135,
evaluate.py:41-58, inference.py:159-216). Here the whole decode is ONE
compiled program: `lax.while_loop` over fixed-size token/hidden/KV buffers
with on-device logit processors (ops/logit_processors.py), early-exiting
when every row has emitted EOS.

The loop also records the decoder's last hidden state for every generated
position, so segment/sequence emotion pooling reuses them directly — the
reference re-encodes the audio and re-runs the decoder a second time for
that (evaluate_simple.py:141-143).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from audio_transformers_tpu.core.config import DecodeConfig, WhisperConfig
from audio_transformers_tpu.models.whisper import model as wm
from audio_transformers_tpu.ops import decode_logits as dl
from audio_transformers_tpu.ops import logit_processors as lp

# Begin-suppress defaults: " " and <|endoftext|> (whisper generation config).
_SPACE_TOKEN = 220

# The standard non-speech suppress list from openai/whisper multilingual
# generation configs (the reference relies on HF loading this from the
# checkpoint's generation_config.json). Pass as `suppress_ids` when decoding
# real pretrained checkpoints; harmless to omit for from-scratch models.
WHISPER_MULTILINGUAL_SUPPRESS: Tuple[int, ...] = (
    1, 2, 7, 8, 9, 10, 14, 25, 26, 27, 28, 29, 31, 58, 59, 60, 61, 62, 63,
    90, 91, 92, 93, 359, 503, 522, 542, 873, 893, 902, 918, 922, 931, 1350,
    1853, 1982, 2460, 2627, 3246, 3253, 3268, 3536, 3846, 3961, 4183, 4667,
    6585, 6647, 7273, 9061, 9383, 10428, 10929, 11938, 12033, 12331, 12562,
    13793, 14157, 14635, 15265, 15618, 16553, 16604, 18362, 18956, 20075,
    21675, 22520, 26130, 26161, 26435, 28279, 29464, 31650, 32302, 32470,
    36865, 42863, 47425, 49870, 50254, 50258, 50358, 50359, 50360, 50361,
    50362,
)


def default_suppress_ids(cfg: WhisperConfig) -> Tuple[int, ...]:
    """The non-speech suppress list a real pretrained whisper checkpoint
    carries in its generation_config.json (the reference gets it implicitly
    through HF generate). Only meaningful for the real multilingual vocab;
    from-scratch/test vocabs get no suppression.

    The table above holds v2 (51865) ids. large-v3 (51866) inserts
    <|yue|> at 50358, shifting the special tokens AFTER it by +1 — text
    tokens (< 50258) and <|startoftranscript|> are unchanged."""
    if cfg.vocab_size == 51865:
        return WHISPER_MULTILINGUAL_SUPPRESS
    if cfg.vocab_size == 51866:
        return tuple(i + 1 if i >= 50358 else i
                     for i in WHISPER_MULTILINGUAL_SUPPRESS)
    return ()


def build_prompt(cfg: WhisperConfig, dcfg: DecodeConfig) -> Tuple[int, ...]:
    """The forced decoder prefix: <|startoftranscript|> [lang] [task]
    [<|notimestamps|>]. Equivalent to HF forced_decoder_ids, which the
    reference has to clear/reset ad hoc (evaluate_simple.py:79-83,
    inference.py:60-66)."""
    prompt = [cfg.decoder_start_token_id]
    if dcfg.forced_language_token is not None:
        prompt.append(dcfg.forced_language_token)
    if dcfg.forced_task_token is not None:
        prompt.append(dcfg.forced_task_token)
    if not dcfg.return_timestamps:
        prompt.append(cfg.no_timestamps_token_id)
    return tuple(prompt)


# Token-buffer length up to which the no-repeat-ngram ban scatters
# directly into its target (B*W updates); above it, the scatter is
# compacted to the top-K flagged windows (see _process_logits).
NGRAM_SCATTER_MAX_LEN = 128


def resolve_logits_impl(dcfg: DecodeConfig) -> str:
    """Resolve DecodeConfig.logits_impl. Sampling always takes "xla":
    temperature needs the full distribution, which the fused kernel
    never materializes. Timestamped greedy decodes are supported — the
    kernel computes the timestamp rules (interval masks + the
    probability rule's online statistics) inside the projection pass
    (ops/decode_logits.py).

    "auto" picks the fused kernel for (a) the repetition-penalty-
    without-ngram chain and (b) any timestamped greedy chain, both
    measured in-pipeline on v5e at B=128: the penalty's (B, V) passes
    force XLA to materialize the logits (1.042 vs 1.073 ms/step at
    int8/L=68), and the timestamp rules cost the XLA path +0.187
    ms/step of unfusable reduction passes (scripts/ts_rule_ab.py,
    L=268) that the kernel absorbs into its single traversal.
    Everywhere else XLA's dot+argmax consumer fusion keeps the bf16
    table VMEM-resident across loop steps and beats the kernel's
    per-call HBM re-stream (noproc 0.986 vs 1.024; penalty+ngram 1.124
    vs 1.158 — the int8 ban-mask build/read outweighs the fused
    pass)."""
    impl = dcfg.logits_impl
    if impl not in ("auto", "fused", "xla"):
        raise ValueError(f"unknown logits_impl {impl!r}")
    sampling = bool(dcfg.temperature and dcfg.temperature > 0.0)
    if impl == "auto":
        pen_only = (dcfg.repetition_penalty != 1.0
                    and not dcfg.no_repeat_ngram_size)
        impl = ("fused" if (pen_only or dcfg.return_timestamps)
                and not sampling
                and jax.default_backend() == "tpu" else "xla")
    if impl == "fused" and sampling:
        return "xla"
    return impl


def _ngram_window_flags(tokens, pos, n, finished=None):
    """no-repeat-ngram window matching over the (B, L) history — the
    shared matcher (lp.ngram_window_match; the parity of every consumer
    rests on one window-selection implementation) plus decode-loop
    masking: rows already `finished` are unflagged. Their post-EOS pad
    runs would otherwise flag ~every window (their next token is forced
    to pad regardless, so banning is moot — but a single finished row
    tripping the top-K overflow would drag every step into the dense
    branch)."""
    flag, cont, starts = lp.ngram_window_match(tokens, pos, n)
    if finished is not None:
        flag &= ~finished[:, None]
    return flag, cont, starts


def _ngram_ban_targets(tokens, pos, n, oob, finished=None):
    """Banned-continuation scatter indices for the no-repeat-ngram rule —
    the ONE place the short/long compaction strategy lives (both the XLA
    logits scatter and the fused kernel's int8 ban mask consume it, and
    their token parity depends on using identical window selection).

    Returns (idx, overflow, (flag, cont)):
      short buffers (<= NGRAM_SCATTER_MAX_LEN): idx (B, W) with
        non-banned slots redirected to `oob` (dropped by FILL_OR_DROP);
        overflow is None — scatter idx unconditionally.
      long buffers: idx (B, K=16) compacted to the top-K flagged windows
        (a step typically flags only a handful); overflow is the scalar
        bool "any row flags > K" — cond-fall back to a dense mask built
        from (flag, cont) so nothing is ever silently dropped."""
    flag, cont, starts = _ngram_window_flags(tokens, pos, n, finished)
    if tokens.shape[1] <= NGRAM_SCATTER_MAX_LEN:
        return jnp.where(flag, cont, oob), None, (flag, cont)
    # clamp to the window count: lax.top_k raises on k > axis size, and
    # NGRAM_SCATTER_MAX_LEN=0 (forcing compaction at short L) is a
    # documented tuning move
    K = min(16, cont.shape[1])
    w_idx = jax.lax.top_k(jnp.where(flag, starts[None, :], -1), K)[0]
    cont_k = jnp.take_along_axis(cont, jnp.maximum(w_idx, 0), axis=1)
    idx = jnp.where(w_idx >= 0, cont_k, oob)          # OOB -> dropped
    return idx, jnp.any(jnp.sum(flag, axis=1) > K), (flag, cont)


def _fused_ban_mask(tokens, pos, n, v_pad, finished):
    """(B, v_pad) int8 no-repeat-ngram ban mask for the fused greedy
    kernel — same compaction as the XLA path (_ngram_ban_targets), but
    targeting an int8 mask instead of the (never materialized) logits."""
    b = tokens.shape[0]
    b_idx = jnp.arange(b)[:, None]
    idx, overflow, (flag, cont) = _ngram_ban_targets(tokens, pos, n,
                                                     v_pad, finished)
    zeros = jnp.zeros((b, v_pad), jnp.int8)
    if overflow is None:
        return zeros.at[b_idx, idx].set(1)

    def sparse(_):
        return zeros.at[b_idx, idx].set(1)

    def dense(_):
        return zeros.at[b_idx, cont].max(flag.astype(jnp.int8))

    return jax.lax.cond(overflow, dense, sparse, 0)


def _process_logits(logits, tokens, pos, cfg: WhisperConfig,
                    dcfg: DecodeConfig, prompt_len: int,
                    suppress_ids: Tuple[int, ...],
                    begin_suppress_ids: Tuple[int, ...],
                    seen=None, finished=None, timestamp_rule=True,
                    ngram_impl: str = "auto"):
    # Fused composition of the HF chain (suppress -> begin-suppress ->
    # repetition penalty -> no-repeat-ngram), identical math. The static
    # suppress masks are one fused elementwise pass over the (B, V)
    # logits.
    #
    # Repetition penalty: `seen` is the (B, V) bool mask of token ids in
    # tokens[:, :pos]. The decode loop CARRIES it and extends it with B
    # updates/step (see `generate`); recomputing it here per step is a
    # (B, L)-update scatter that measured 0.33 ms/step at L=268/B=128
    # (scripts/decode_len_ab.py) — the scatter, not the (B, V)
    # elementwise passes, is the cost. Standalone callers may omit it.
    #
    # no-repeat-ngram keeps a length-dependent crossover (TPU scatter
    # cost is ~linear in UPDATE COUNT, i.e. B*W):
    #   - short buffers: scatter NEG_INF directly into the logits
    #     (non-matching windows redirect out of bounds, which JAX drops
    #     — FILL_OR_DROP — so duplicate ids stay deterministic)
    #   - long buffers: materialize a (B, V) boolean mask (measured: at
    #     L=268/B=128 the fp32 scatters cost 1.75 ms/step vs ~0.3 for
    #     masks; at L=68 the scatter path is ~0.1 ms cheaper)
    # ngram_impl="mask" (beam mode) forces the boolean-mask form
    # unconditionally — see the in-branch comment for the measured
    # scatter+penalty combination pathology it avoids.
    vocab = logits.shape[-1]
    b = logits.shape[0]
    b_idx = jnp.arange(b)[:, None]
    static_mask = None  # (V,) bool, position-independent
    if len(suppress_ids):
        static_mask = jnp.zeros((vocab,), bool).at[
            jnp.asarray(list(suppress_ids), jnp.int32)].set(True)
    mask = None  # (B, V) or (1, V) bool -> NEG_INF
    if len(begin_suppress_ids):
        begin = jnp.zeros((vocab,), bool).at[
            jnp.asarray(list(begin_suppress_ids), jnp.int32)].set(True)
        mask = (pos == prompt_len) & begin[None, :]
    if static_mask is not None:
        mask = static_mask[None, :] if mask is None \
            else mask | static_mask[None, :]
    if mask is not None:
        logits = jnp.where(mask, lp.NEG_INF, logits)
    if dcfg.repetition_penalty != 1.0:
        p = dcfg.repetition_penalty
        if seen is None:
            seen = lp.seen_mask(tokens, pos, vocab)
        logits = jnp.where(seen & (logits > 0), logits / p,
                           jnp.where(seen, logits * p, logits))
    if dcfg.no_repeat_ngram_size and \
            tokens.shape[1] >= dcfg.no_repeat_ngram_size:
        n = dcfg.no_repeat_ngram_size
        if ngram_impl == "mask":
            # beam mode: the bool-mask + where form. Measured EQUAL to
            # the scatter form in-pipeline (16.85 vs 16.89 ms/step at
            # b128/N=4, interleaved on chip — the r4 claim of a +9.4
            # scatter+penalty pathology did not reproduce; the real
            # beam cost was the cache reorder, beam.py). Kept: it
            # composes the finished-row masking without a scatter and
            # is token-equal (tests/test_beam.py::
            # test_matches_hf_with_processors).
            flag, cont, _ = _ngram_window_flags(tokens, pos, n, finished)
            banned = jnp.zeros((b, vocab), bool).at[
                b_idx, cont].max(flag)
            logits = jnp.where(banned, lp.NEG_INF, logits)
        else:
            idx, overflow, (flag, cont) = _ngram_ban_targets(
                tokens, pos, n, vocab, finished)
            if overflow is None:
                logits = logits.at[b_idx, idx].set(lp.NEG_INF)
            else:
                # long buffers: B*K compacted scatter (vs B*W — the
                # dense bool scatter measured 0.29 ms/step at
                # L=268/B=128), exact dense cond-fallback on top-K
                # overflow
                def sparse(lg):
                    return lg.at[b_idx, idx].set(lp.NEG_INF)

                def dense(lg):
                    banned = jnp.zeros((b, vocab), bool).at[
                        b_idx, cont].max(flag)
                    return jnp.where(banned, lp.NEG_INF, lg)

                logits = jax.lax.cond(overflow, dense, sparse, logits)
    if dcfg.return_timestamps and timestamp_rule:
        logits = lp.whisper_timestamp_rules(
            logits, tokens, pos,
            begin_index=prompt_len,
            timestamp_begin=cfg.timestamp_begin_id,
            eos_token_id=cfg.eos_token_id,
            no_timestamps_token_id=cfg.no_timestamps_token_id)
    return logits


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "dcfg", "prompt", "suppress_ids",
                     "begin_suppress_ids", "max_len"))
def generate(params: dict, cfg: WhisperConfig, dcfg: DecodeConfig,
             enc: jax.Array, *,
             prompt: Optional[Tuple[int, ...]] = None,
             suppress_ids: Tuple[int, ...] = (),
             begin_suppress_ids: Optional[Tuple[int, ...]] = None,
             max_len: Optional[int] = None,
             rng: Optional[jax.Array] = None) -> dict:
    """Decode from encoder states. Returns a dict:
      tokens  (B, L) int32 — prompt + generated, pad after EOS
      hiddens (B, L, D)    — decoder last hidden per fed position
      lengths (B,) int32   — valid token count incl. prompt and EOS
    """
    if prompt is None:
        prompt = build_prompt(cfg, dcfg)
    prompt_arr = jnp.asarray(prompt, jnp.int32)
    p_len = len(prompt)
    batch = enc.shape[0]
    L = max_len or min(p_len + dcfg.max_new_tokens, cfg.max_target_positions)
    if begin_suppress_ids is None:
        # whisper generation-config default: suppress " " and EOS at the
        # first generated position; pass an explicit tuple to override
        begin_suppress_ids = ((_SPACE_TOKEN, cfg.eos_token_id)
                              if dcfg.suppress_blank else ())

    tokens = jnp.full((batch, L), cfg.pad_token_id, jnp.int32)
    tokens = tokens.at[:, :p_len].set(prompt_arr[None, :])
    hiddens = jnp.zeros((batch, L, cfg.d_model), enc.dtype)
    # kv_quant covers BOTH caches: the precomputed cross K/V and the
    # incrementally-written self K/V (per-time-step scales). The self
    # cache only quantizes at LONG decode budgets — below ~192 positions
    # the per-step quantize/dequantize VPU work exceeds the bandwidth
    # saved on the tiny cache re-read (it exists for the 256-token
    # segment-eval budget, where the bf16 cache read is ~204 MB/step at
    # batch 128).
    self_quant = dcfg.kv_quant if L >= dcfg.self_kv_min else "none"
    if self_quant == "int4":
        # int4 covers only the (dominant, precomputed) cross K/V; the
        # incrementally-written self cache stays int8 — its re-read is a
        # fraction of the step and nibble-packing a one-column-per-step
        # write would ripple into every past byte.
        self_quant = "int8"
    cache = wm.init_cache(cfg, batch, max_len=L, dtype=enc.dtype,
                          quant=self_quant)
    cross = wm.precompute_cross_attention(params, cfg, enc,
                                          quant=dcfg.kv_quant)
    if wm.resolve_step_attn(dcfg.step_attn) == "fused":
        # pad the time axis for the fused kernel ONCE, outside the loop
        cross = wm.pad_cross_time(cross)
    # Weights cast to the compute dtype ONCE, outside the loop; otherwise
    # every step re-reads the fp32 copies from HBM (decode is
    # bandwidth-bound — this alone is worth ~2x per step in bf16).
    step_params = wm.prepare_decode_params(params, cfg, dtype=enc.dtype)
    finished = jnp.zeros((batch,), bool)
    key = rng if rng is not None else jax.random.PRNGKey(0)
    # Fused greedy step: vocab projection + processors + argmax in one
    # Pallas kernel, (B, V) logits never reach HBM (ops/decode_logits.py;
    # see resolve_logits_impl for the measured scope where it wins). Its
    # padded operands — the transposed table and the additive suppress
    # vectors — are built ONCE here, outside the loop.
    fused_logits = resolve_logits_impl(dcfg) == "fused"
    if fused_logits:
        v_pad = dl.pad_vocab(cfg.vocab_size)
        d_pad = -(-cfg.d_model // 128) * 128
        tbl = step_params["embed"]["table"]  # (V, D) compute dtype
        table_t = jnp.zeros((d_pad, v_pad), tbl.dtype).at[
            :cfg.d_model, :cfg.vocab_size].set(tbl.T)
        add_base = jnp.zeros((v_pad,), jnp.float32)
        if cfg.vocab_size < v_pad:
            add_base = add_base.at[cfg.vocab_size:].set(lp.NEG_INF)
        if len(suppress_ids):
            add_base = add_base.at[
                jnp.asarray(list(suppress_ids), jnp.int32)].set(lp.NEG_INF)
        if dcfg.return_timestamps:
            # the timestamp rules' one position-independent mask:
            # <|notimestamps|> is always suppressed
            add_base = add_base.at[cfg.no_timestamps_token_id].set(
                lp.NEG_INF)
        add_begin = add_base
        if len(begin_suppress_ids):
            add_begin = add_begin.at[
                jnp.asarray(list(begin_suppress_ids), jnp.int32)
            ].set(lp.NEG_INF)
        add_base = add_base[None, :]
        add_begin = add_begin[None, :]
    # Incremental seen-token mask for the repetition penalty: extended
    # with B scatter updates per step as tokens are emitted, instead of
    # rebuilding from the (B, L) history every step (0.33 ms/step at
    # L=268/B=128 — scripts/decode_len_ab.py). Seeded with position 0;
    # prompt-forced and post-EOS pad tokens flow through `nxt`, so the
    # carry stays exactly equal to seen_mask(tokens, pos). The fused path
    # carries it int8 at the kernel's padded vocab width.
    track_seen = dcfg.repetition_penalty != 1.0
    if track_seen:
        seen_width = v_pad if fused_logits else cfg.vocab_size
        seen = jnp.zeros(
            (batch, seen_width), jnp.int8 if fused_logits else bool,
        ).at[jnp.arange(batch), tokens[:, 0]].set(True)
    else:
        seen = jnp.zeros((batch, 1), bool)  # placeholder carry

    def cond(state):
        tokens, hiddens, cache, finished, key, seen = state
        return (cache["index"] < L - 1) & ~jnp.all(finished)

    def body(state):
        tokens, hiddens, cache, finished, key, seen = state
        i = cache["index"]
        tok = jax.lax.dynamic_slice(tokens, (0, i), (batch, 1))[:, 0]
        hidden, cache = wm.apply_decoder_step(params, cfg, tok, cache, cross,
                                              step_params=step_params,
                                              attn_impl=dcfg.step_attn)
        hiddens = jax.lax.dynamic_update_slice(
            hiddens, hidden[:, None, :].astype(hiddens.dtype), (0, i, 0))

        pos = i + 1  # position being generated
        if fused_logits:
            add = add_begin if not len(begin_suppress_ids) else jnp.where(
                pos == p_len, add_begin, add_base)
            ban = None
            if dcfg.no_repeat_ngram_size and \
                    tokens.shape[1] >= dcfg.no_repeat_ngram_size:
                ban = _fused_ban_mask(tokens, pos,
                                      dcfg.no_repeat_ngram_size,
                                      v_pad, finished)
            h = hidden if cfg.d_model == d_pad else jnp.pad(
                hidden, ((0, 0), (0, d_pad - cfg.d_model)))
            ts_bounds = None
            if dcfg.return_timestamps:
                # per-row interval encoding of the timestamp rules,
                # O(B*L) scalar work — the kernel applies them in
                # registers and runs the probability rule online
                ts_bounds = lp.timestamp_row_bounds(
                    tokens, pos, begin_index=p_len,
                    timestamp_begin=cfg.timestamp_begin_id,
                    eos_token_id=cfg.eos_token_id)
            nxt = dl.fused_greedy_step(
                h, table_t, add,
                seen=seen if track_seen else None, ban=ban,
                penalty=dcfg.repetition_penalty,
                ts_bounds=ts_bounds,
                timestamp_begin=(cfg.timestamp_begin_id
                                 if dcfg.return_timestamps else None))
        else:
            # step_params' table is already in the compute dtype — using
            # the raw fp32 table here would cast (read+write the full
            # 51865 x 384 matrix) EVERY step inside the loop
            table = step_params["embed"]["table"].astype(hidden.dtype)
            logits = jnp.einsum("bd,vd->bv", hidden, table,
                                preferred_element_type=jnp.float32)
            sampling = bool(dcfg.temperature and dcfg.temperature > 0.0)
            # Greedy timestamped decode: stop the processor chain before
            # the timestamp rule and take the token from the
            # reductions+argmax form — the full rule's probability
            # branch forces a dependent second (B, V) pass that the
            # greedy token never needs (lp.whisper_timestamp_greedy_token;
            # ties it in XLA — +0.180 vs +0.187 ms/step at b128/L=268,
            # scripts/ts_rule_ab.py — and is the semantics the fused
            # Pallas greedy kernel computes in one real pass).
            fused_ts = dcfg.return_timestamps and not sampling
            logits = _process_logits(logits, tokens, pos, cfg, dcfg, p_len,
                                     suppress_ids, begin_suppress_ids,
                                     seen=seen if track_seen else None,
                                     finished=finished,
                                     timestamp_rule=not fused_ts)

            if sampling:
                key, sub = jax.random.split(key)
                nxt = jax.random.categorical(sub, logits / dcfg.temperature,
                                             axis=-1).astype(jnp.int32)
            elif fused_ts:
                nxt = lp.whisper_timestamp_greedy_token(
                    logits, tokens, pos,
                    begin_index=p_len,
                    timestamp_begin=cfg.timestamp_begin_id,
                    eos_token_id=cfg.eos_token_id,
                    no_timestamps_token_id=cfg.no_timestamps_token_id)
            else:
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)

        # inside the forced prompt, the next token is the prompt token
        in_prompt = pos < p_len
        prompt_tok = prompt_arr[jnp.minimum(pos, p_len - 1)]
        nxt = jnp.where(in_prompt, prompt_tok, nxt)
        nxt = jnp.where(finished, cfg.pad_token_id, nxt)
        tokens = jax.lax.dynamic_update_slice(
            tokens, nxt[:, None], (0, pos))
        if track_seen:
            seen = seen.at[jnp.arange(batch), nxt].set(True)
        finished = finished | (~in_prompt & (nxt == cfg.eos_token_id))
        return tokens, hiddens, cache, finished, key, seen

    tokens, hiddens, cache, finished, key, seen = jax.lax.while_loop(
        cond, body, (tokens, hiddens, cache, finished, key, seen))

    # Feed the final token once more so the hidden state for the last
    # written position exists for pooling. This always runs: the while
    # cond caps index at L-1 on every exit path, so there is no
    # "buffer already full" case to branch on.
    i = cache["index"]
    tok = jax.lax.dynamic_slice(tokens, (0, i), (batch, 1))[:, 0]
    hidden, cache = wm.apply_decoder_step(params, cfg, tok, cache, cross,
                                          step_params=step_params,
                                          attn_impl=dcfg.step_attn)
    hiddens = jax.lax.dynamic_update_slice(
        hiddens, hidden[:, None, :].astype(hiddens.dtype), (0, i, 0))

    positions = jnp.arange(L)[None, :]
    is_eos = (tokens == cfg.eos_token_id) & (positions >= p_len)
    any_eos = jnp.any(is_eos, axis=1)
    first_eos = jnp.argmax(is_eos, axis=1)
    lengths = jnp.where(any_eos, first_eos + 1, L).astype(jnp.int32)

    return {"tokens": tokens, "hiddens": hiddens, "lengths": lengths}


def generate_with_fallback(params: dict, cfg: WhisperConfig,
                           dcfg: DecodeConfig, enc: jax.Array, *,
                           prompt: Optional[Tuple[int, ...]] = None,
                           suppress_ids: Tuple[int, ...] = (),
                           tokenizer=None,
                           rng: Optional[jax.Array] = None,
                           fallback_temperature: float = 0.7) -> dict:
    """Decode with whisper's anti-repetition fallback: rows whose
    transcript's zlib compression ratio exceeds
    `dcfg.compression_ratio_threshold` are re-decoded with temperature
    sampling (0.7). Equivalent to the reference segment evaluator's
    `generate(temperature=0.7, compression_ratio_threshold=2.4, ...)`
    (reference: whisper_finetune/evaluate.py:41-58, HF's whisper
    temperature-fallback ladder).

    TPU note: flagged rows are gathered into a power-of-two bucket (the
    smallest bucket >= the flagged count), the sampling variant re-decodes
    only that bucket, and the results scatter back — fixed shapes (at most
    log2(batch)+1 compiled bucket sizes), so one degenerate row at batch
    128 costs a batch-1 re-decode, not a full second pass. Without a
    tokenizer the ratio is computed over the raw token-id bytes
    (repetitions compress the same way).
    """
    import numpy as np

    from audio_transformers_tpu.infer.metrics import compression_ratio

    out = generate(params, cfg, dcfg, enc, prompt=prompt,
                   suppress_ids=suppress_ids)
    threshold = dcfg.compression_ratio_threshold
    if not threshold:
        return out
    if prompt is None:
        prompt = build_prompt(cfg, dcfg)
    p_len = len(prompt)
    tokens = np.asarray(out["tokens"])
    lengths = np.asarray(out["lengths"])
    flagged = []
    for b in range(tokens.shape[0]):
        ids = tokens[b, p_len: int(lengths[b])]
        if tokenizer is not None:
            sample = tokenizer.decode([int(t) for t in ids])
        else:
            sample = ids.astype(np.int32).tobytes()
        if compression_ratio(sample) > threshold:
            flagged.append(b)
    if not flagged:
        return out

    batch = tokens.shape[0]
    bucket = 1
    while bucket < len(flagged):
        bucket *= 2
    bucket = min(bucket, batch)
    # pad the index list by repeating the first flagged row — for the
    # DECODE shape only. The pad rows are independent temperature samples
    # of the same input (per-row Gumbel noise), so they must NOT be
    # scattered: duplicate scatter indices with differing updates pick an
    # implementation-defined winner per output array, which could mix
    # tokens from one sample with lengths from another. Only the first
    # len(flagged) rows (exactly one per flagged index) merge back.
    idx = np.asarray(
        (flagged + [flagged[0]] * (bucket - len(flagged)))[:bucket],
        np.int32)
    hot = dcfg.replace(temperature=fallback_temperature)
    resampled = generate(params, cfg, hot, jnp.take(enc, idx, axis=0),
                         prompt=prompt, suppress_ids=suppress_ids,
                         rng=rng if rng is not None else jax.random.PRNGKey(0))
    n_fl = len(flagged)
    merged = dict(out)
    for k in ("tokens", "hiddens", "lengths"):
        merged[k] = out[k].at[idx[:n_fl]].set(resampled[k][:n_fl])
    return merged
