"""Beam-search decoding as ONE compiled program.

A capability BEYOND the reference: every reference surface decodes
greedily (whisper_finetune/evaluate_simple.py:125-135 passes num_beams
through HF generate but always leaves it at 1, and even hands greedy a
length_penalty HF then ignores). Serving whisper in production usually
wants beams; this implements HF's `BeamSearchScorer` semantics
(transformers/generation/beam_search.py) TPU-natively:

  - the whole search is a single `lax.while_loop` over fixed-size
    buffers — no host sync per token, no dynamic shapes;
  - beams live as B*N decoder rows; the dominant per-step cost, the
    cross-attention K/V read, is NOT multiplied by N: the cross K/V
    stays unexpanded at B rows and every beam of a batch row shares it
    through a batched einsum (apply_decoder_step(beams=N));
  - the kept-hypothesis set is a fixed (B, N) buffer with replace-the-
    worst updates — exactly HF's keep-top-N `BeamHypotheses` pruning;
  - per-step beam reordering gathers the self-KV cache rows (HF's
    `_reorder_cache`), a fixed-shape `jnp.take`;
  - the winning hypothesis' hidden states for emotion pooling are NOT
    carried through the loop (reordering a (B*N, L, D) buffer every
    step, or snapshotting rows at every hypothesis retirement, would
    dominate) — they are recomputed afterwards with ONE teacher-forced
    decoder pass over the winners, which is a few ms at batch 128
    against a multi-second search.

Token-for-token parity with HF `generate(num_beams=N)` is tested in
tests/test_beam.py (greedy-loop-free: HF's own beam path is the oracle).

HF semantics mirrored exactly:
  - scores are log-softmaxed BEFORE the logit processors (beam mode
    processes log-probs; greedy processes raw logits);
  - 2N candidates per step; EOS candidates ranked in the top N retire
    to the hypothesis set (worse-ranked EOS candidates are dropped),
    non-EOS candidates fill the N continuing beams in rank order;
  - a retired hypothesis scores sum_logprobs / generated_len**lp, with
    generated_len counting the EOS;
  - a batch row is done when it holds N hypotheses and (early_stopping)
    or (the best running score cannot beat the worst kept hypothesis —
    HF's lp>0 heuristic divides by the current length, lp<=0 by the
    max length);
  - at budget exhaustion the N running beams are offered to the
    hypothesis set with the same replace-the-worst rule.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from audio_transformers_tpu.core.config import DecodeConfig, WhisperConfig
from audio_transformers_tpu.models.whisper import model as wm
from audio_transformers_tpu.ops.permute import permute_rows_pallas
from audio_transformers_tpu.models.whisper.decode import (_SPACE_TOKEN,
                                                          _process_logits,
                                                          build_prompt)

_SCORE_FLOOR = -1.0e9   # HF's initial score for beams 1..N-1
_EMPTY = -1.0e30        # empty hypothesis slot (any real score beats it)


_BUCKET = 128  # one TPU vector lane tile per bucket


def resolve_beam_reorder(impl: str) -> str:
    """"auto" -> the one-hot MXU matmul on TPU, jnp.take elsewhere.

    The per-step parent reorder of the self-KV cache is HF's
    `_reorder_cache`. As a row gather (jnp.take) inside the decode
    while_loop it measures +12.1 ms/step at b128/N=4 — 25x the copy's
    bandwidth floor and 70% of the entire beam step — while the SAME
    gather in an isolated scan is ~free (scripts/beam_stage_ab.py: XLA
    lowers the in-loop gather-on-carry pathologically). "mm" expresses
    the permutation as a one-hot matrix multiply on the MXU instead:
    out[r] = sum_s onehot[r, s] * a[s] touches exactly one operand row
    per output row, so it is exact for every cache dtype (bf16 carries
    f32 accumulation; int8 and f32 take dedicated paths — see
    _permute_rows_mxu), and the beam step drops 17.1 -> 6.4 ms/step
    (same harness, same process, production shape). "take" keeps the
    gather form for A/B.

    "pallas" (ops/permute.permute_rows_pallas — the copy as a
    scalar-prefetch gather kernel) is REJECTED as the default, measured
    twice: in production generate_beam it is 13.3 vs mm's 5.9 ms/step
    at b128/N=4 (scripts/beam_reorder_pallas_ab.py — the opaque custom
    call defeats XLA's while-loop carry aliasing, so every carried
    buffer is copied around the kernel each step), and even isolated
    it runs ~4 us per grid point on 52 kB row copies
    (scripts/pallas_permute_probe.py). It stays available as the exact
    per-dtype copy oracle — it caught the f32 demotion bug below."""
    if impl == "auto":
        return "mm" if jax.default_backend() == "tpu" else "take"
    if impl not in ("mm", "take", "pallas"):
        raise ValueError(f"unknown beam_reorder {impl!r}")
    return impl


def _permute_rows_mxu(a: jax.Array, onehot: jax.Array) -> jax.Array:
    """Row permutation as a one-hot matmul (see resolve_beam_reorder).
    `onehot` is (rows, rows) bf16; promotion keeps f32 operands in f32,
    and bool rounds-trip exactly through bf16 (integer values).

    int8 buffers (the quantized self-KV cache) promote through the
    bf16 one-hot (|v| <= 127 is exact in bf16). An int8 x int8 -> int32
    dot_general was tried and REJECTED: despite half the operand bytes
    it measures 11.74 vs 9.65 ms/step on the long-budget int8 beam
    (scripts/reorder_i8_decomp_ab.py — the int8 matmul lowering loses
    more to layout/conversion work than it saves in reads).

    f32 buffers (the int8 cache's scale vectors) need
    precision=HIGHEST: TPU matmuls at default precision round f32
    operands to bf16, which silently degraded the scales every reorder
    step (caught on chip by scripts/beam_reorder_pallas_ab.py's
    token-equality gate; the 6-pass HIGHEST decomposition reconstructs
    v * 1.0 exactly — chip-verified against jnp.take,
    scripts/reorder_exactness_chip_check.py — and costs nothing
    measurable: same decomp script, 9.652 with vs 9.56 pre-fix)."""
    if a.dtype == jnp.float32:
        return jnp.tensordot(onehot.astype(jnp.float32), a, axes=1,
                             precision=jax.lax.Precision.HIGHEST)
    return jnp.tensordot(onehot, a, axes=1).astype(a.dtype)


def resolve_beam_topk(impl: str) -> str:
    """"auto" -> the hierarchical per-beam top-k on TPU, HF's merged
    candidate buffer elsewhere.

    "merged" follows HF literally: materialize (logp + score) as a
    (B, N*V) f32 buffer and top-2N it. At b128/N=4 that is a 106 MB
    buffer per step whose width (4*51865) is not lane-aligned, so the
    reshape relayouts on top of the extra read+write. "perbeam" top-2N's
    each (B*N, V) logp row first — adding a per-row constant cannot
    change within-row order, so the beam score is added to the 2N
    surviving values instead of 26.5M candidates — then exactly merges
    the N*2N finalists per batch row (beam-major concat = the merged
    buffer's flattened index order, and _masked_argmax_top_k keeps
    first-occurrence tie stability). Measured 6.24 -> 5.94 ms/step at
    b128/N=4 interleaved on chip (scripts/beam_stage_ab.py hyp_mmS vs
    hyp_mmT2; the block-diag reorder variants measured +9.5 ms/step and
    were rejected).

    Tie caveat (the one semantic deviation, unobservable in practice):
    if f32 rounding of logp + score maps two UNEQUAL logp values in the
    same beam onto the same sum, "merged" keeps the lower vocab index
    first while "perbeam" keeps the higher-logp one; both report the
    identical score. Verified token-equal to HF and to "merged" at full
    geometry (tests/test_beam.py, tests/test_full_geometry_parity.py)."""
    if impl == "auto":
        return "perbeam" if jax.default_backend() == "tpu" else "merged"
    if impl not in ("merged", "perbeam"):
        raise ValueError(f"unknown beam_topk {impl!r}")
    return impl


def _per_beam_top_k(logp: jax.Array, scores: jax.Array, k: int,
                    n_beams: int):
    """Hierarchical top-k over the implicit (B, N*V) candidate grid
    without materializing it (see resolve_beam_topk). `logp` is
    (B*N, V) f32, `scores` (B, N) f32; returns ((B, k) values,
    (B, k) int32 indices into the flattened N*V grid)."""
    n_rows, vocab = logp.shape
    batch = n_rows // n_beams
    vals, idxs = _stable_top_k(logp, k)                   # per-beam rows
    vals = vals + scores.reshape(n_rows, 1)
    gidx = idxs + (jnp.arange(n_rows) % n_beams)[:, None] * vocab
    vals = vals.reshape(batch, n_beams * k)               # beam-major
    gidx = gidx.reshape(batch, n_beams * k)
    top_s, ci = _masked_argmax_top_k(vals, k)
    return top_s, jnp.take_along_axis(gidx, ci, axis=1)


def _masked_argmax_top_k(x: jax.Array, k: int):
    """Exact top-k over the last axis with lax.top_k's stable
    first-occurrence tie order — as k sequential masked argmaxes.

    jax.lax.top_k over the beam-candidate row lowers to a FULL variadic
    sort on TPU: at B=128, N=4, V=51865 that is a 26.5M-element sort
    per decode step, measured at ~60 ms/step — the entire beam-search
    budget (BENCH r4 validation run: 66.2 ms/step vs greedy's 1.9).
    k argmax passes are k linear VPU reductions over the same row
    (~0.13 ms each at this geometry) and XLA updates the masked buffer
    in place after the first copy.

    Ties: argmax returns the first maximum, and masking the winner to
    -inf makes the next pass return the next occurrence — exactly the
    sorted-stable order lax.top_k documents (asserted against it in
    tests/test_beam.py)."""
    b = x.shape[0]
    rows = jnp.arange(b)
    vals, idxs = [], []
    cur = x
    for _ in range(k):
        i = jnp.argmax(cur, axis=-1)
        vals.append(jnp.take_along_axis(cur, i[:, None], axis=1)[:, 0])
        idxs.append(i.astype(jnp.int32))
        cur = cur.at[rows, i].set(-jnp.inf)
    return jnp.stack(vals, axis=1), jnp.stack(idxs, axis=1)


def _stable_top_k(x: jax.Array, k: int):
    """Exact stable top-k in ~ONE pass over the buffer: bucketized
    two-level selection.

    The k-masked-argmax form still reads the full (B, N*V) f32
    candidate buffer k times (8 x 106 MB/step at the bench geometry).
    This version reads it ONCE: split each row into 128-wide buckets,
    reduce to per-bucket maxima (the single full pass), pick the top-k
    buckets from the tiny maxima row, gather those k*128 candidates,
    and finish exactly on the small union.

    Exactness incl. lax.top_k's first-occurrence tie order:
      - every bucket holding one of the true top-k elements has max >=
        the k-th value, and at most k-1 buckets can have max strictly
        above it, so the top-k buckets (earliest-first on maxima ties,
        which _masked_argmax_top_k provides) cover all first
        occurrences of the top-k values;
      - sorting the chosen bucket indices ascending makes the gathered
        union scan in original flattened order, so the final stable
        top-k over the union reproduces the global stable order.
    Asserted against lax.top_k (random + adversarial-tie rows) in
    tests/test_beam.py.

    Caveat (unreachable from beam search, where rows are dense
    log-probs): rows with fewer than k finite values may return the
    padded -inf tail's indices (>= row length) instead of masked
    in-range positions."""
    b, n = x.shape
    nb = -(-n // _BUCKET)
    if nb <= 2 * k:
        # small rows: the direct passes are cheaper than two levels
        return _masked_argmax_top_k(x, k)
    pad = nb * _BUCKET - n
    xp = jnp.pad(x, ((0, 0), (0, pad)),
                 constant_values=-jnp.inf) if pad else x
    xb = xp.reshape(b, nb, _BUCKET)
    bmax = jnp.max(xb, axis=-1)                       # the one full pass
    _, bidx = _masked_argmax_top_k(bmax, k)
    bsel = jnp.sort(bidx, axis=1)                     # ascending order
    cand = jnp.take_along_axis(
        xb, bsel[:, :, None], axis=1).reshape(b, k * _BUCKET)
    vals, ci = _masked_argmax_top_k(cand, k)
    gi = (jnp.take_along_axis(bsel, ci // _BUCKET, axis=1) * _BUCKET
          + ci % _BUCKET)
    return vals, gi.astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "dcfg", "prompt", "suppress_ids",
                     "begin_suppress_ids", "max_len"))
def generate_beam(params: dict, cfg: WhisperConfig, dcfg: DecodeConfig,
                  enc: jax.Array, *,
                  prompt: Optional[Tuple[int, ...]] = None,
                  suppress_ids: Tuple[int, ...] = (),
                  begin_suppress_ids: Optional[Tuple[int, ...]] = None,
                  max_len: Optional[int] = None) -> dict:
    """Beam-search decode from encoder states. Returns a dict shaped like
    `decode.generate`'s so every evaluator/pipeline consumer works
    unchanged:
      tokens  (B, L) int32 — the best hypothesis, pad after EOS
      hiddens (B, L, D)    — teacher-forced decoder hiddens of `tokens`
      lengths (B,) int32   — valid token count incl. prompt and EOS
    plus the full kept set for callers that want alternatives:
      beam_tokens (B, N, L), beam_scores (B, N) — length-normalized,
      empty slots at -1e30 — and beam_lengths (B, N).
    """
    n_beams = dcfg.num_beams
    if n_beams < 2:
        raise ValueError("generate_beam needs num_beams >= 2; use "
                         "decode.generate for greedy/sampling")
    if dcfg.temperature and dcfg.temperature > 0.0:
        raise ValueError("beam search is deterministic; temperature>0 "
                         "with num_beams>1 is not supported")
    if dcfg.kv_quant == "int4":
        import warnings
        warnings.warn(
            "num_beams>1 with kv_quant='int4' routes cross-attention "
            "through the dequantize-per-step correctness path (the "
            "nibble-packed layout has no beam-batched einsum) — prefer "
            "kv_quant='int8' when beam-decoding for speed",
            stacklevel=2)
    if prompt is None:
        prompt = build_prompt(cfg, dcfg)
    prompt_arr = jnp.asarray(prompt, jnp.int32)
    p_len = len(prompt)
    batch = enc.shape[0]
    n_rows = batch * n_beams
    vocab = cfg.vocab_size
    lp = float(dcfg.length_penalty)
    L = max_len or min(p_len + dcfg.max_new_tokens, cfg.max_target_positions)
    if begin_suppress_ids is None:
        begin_suppress_ids = ((_SPACE_TOKEN, cfg.eos_token_id)
                              if dcfg.suppress_blank else ())

    tokens = jnp.full((n_rows, L), cfg.pad_token_id, jnp.int32)
    tokens = tokens.at[:, :p_len].set(prompt_arr[None, :])
    # HF beam-score init: beam 0 at 0, the rest at -1e9 so the identical
    # post-prompt beams don't fill the first top-k with duplicates
    scores = jnp.full((batch, n_beams), _SCORE_FLOOR, jnp.float32)
    scores = scores.at[:, 0].set(0.0)
    # Beams gate self-KV quantization on beam_self_kv_min (default 0:
    # always quantize alongside the cross KV), NOT greedy's self_kv_min:
    # the parent reorder rewrites the whole self cache every step, so
    # halving its bytes pays at any L (scripts/beam_reorder_pallas_ab.py)
    self_quant = dcfg.kv_quant if L >= dcfg.beam_self_kv_min else "none"
    if self_quant == "int4":
        self_quant = "int8"      # same rationale as decode.generate
    cache = wm.init_cache(cfg, n_rows, max_len=L, dtype=enc.dtype,
                          quant=self_quant)
    # cross K/V stay at B rows — shared across beams inside the step
    # (never pad_cross_time: beams always take the XLA einsum path)
    cross = wm.precompute_cross_attention(params, cfg, enc,
                                          quant=dcfg.kv_quant)
    step_params = wm.prepare_decode_params(params, cfg, dtype=enc.dtype)

    hyp_tokens = jnp.full((batch, n_beams, L), cfg.pad_token_id, jnp.int32)
    hyp_scores = jnp.full((batch, n_beams), _EMPTY, jnp.float32)
    hyp_lens = jnp.zeros((batch, n_beams), jnp.int32)
    done = jnp.zeros((batch,), bool)

    reorder_impl = resolve_beam_reorder(dcfg.beam_reorder)
    topk_perbeam = resolve_beam_topk(dcfg.beam_topk) == "perbeam"
    track_seen = dcfg.repetition_penalty != 1.0
    if track_seen:
        seen = jnp.zeros((n_rows, vocab), bool).at[
            jnp.arange(n_rows), tokens[:, 0]].set(True)
    else:
        seen = jnp.zeros((n_rows, 1), bool)

    b1 = jnp.arange(batch)
    b2 = b1[:, None]
    beam_iota = jnp.arange(n_beams)[None, :]

    def _offer(hyp_tokens, hyp_scores, hyp_lens, accept, norm, hist,
               length):
        """Replace-the-worst hypothesis update (HF BeamHypotheses.add:
        add iff fewer than N kept or score beats the worst; empty slots
        at -1e30 make both one rule). accept/norm/length (B,), hist
        (B, L)."""
        worst_slot = jnp.argmin(hyp_scores, axis=1)            # (B,)
        cur_worst = jnp.take_along_axis(hyp_scores,
                                        worst_slot[:, None], 1)[:, 0]
        do = accept & (norm > cur_worst)
        cur_tok = hyp_tokens[b1, worst_slot]                   # (B, L)
        hyp_tokens = hyp_tokens.at[b1, worst_slot].set(
            jnp.where(do[:, None], hist, cur_tok))
        hyp_scores = hyp_scores.at[b1, worst_slot].set(
            jnp.where(do, norm, cur_worst))
        hyp_lens = hyp_lens.at[b1, worst_slot].set(
            jnp.where(do, length, hyp_lens[b1, worst_slot]))
        return hyp_tokens, hyp_scores, hyp_lens

    def cond(state):
        tokens, scores, cache, hyp_t, hyp_s, hyp_l, done, seen = state
        return (cache["index"] < L - 1) & ~jnp.all(done)

    def body(state):
        tokens, scores, cache, hyp_tokens, hyp_scores, hyp_lens, done, \
            seen = state
        i = cache["index"]
        tok = jax.lax.dynamic_slice(tokens, (0, i), (n_rows, 1))[:, 0]
        hidden, cache = wm.apply_decoder_step(
            params, cfg, tok, cache, cross, step_params=step_params,
            attn_impl="xla", beams=n_beams)
        pos = i + 1

        table = step_params["embed"]["table"].astype(hidden.dtype)
        logits = jnp.einsum("bd,vd->bv", hidden, table,
                            preferred_element_type=jnp.float32)
        # HF beam mode: log-softmax FIRST, processors on the log-probs
        logp = jax.nn.log_softmax(logits, axis=-1)
        row_done = jnp.repeat(done, n_beams)
        # ngram_impl="mask": the bool-mask + where composition measures
        # EQUAL to the f32 scatter here (16.85 vs 16.89 ms/step,
        # interleaved on chip — the r4 claim that it fixed a +9.4
        # combination pathology did not reproduce); kept because it
        # composes the finished-row masking without a scatter. The beam
        # step's real cost was the cache reorder (resolve_beam_reorder).
        logp = _process_logits(logp, tokens, pos, cfg, dcfg, p_len,
                               suppress_ids, begin_suppress_ids,
                               seen=seen if track_seen else None,
                               finished=row_done, ngram_impl="mask")

        if topk_perbeam:
            top_s, top_i = _per_beam_top_k(logp, scores, 2 * n_beams,
                                           n_beams)             # sorted
        else:
            cand = (logp + scores.reshape(n_rows, 1)).reshape(
                batch, n_beams * vocab)
            top_s, top_i = _stable_top_k(cand, 2 * n_beams)     # sorted
        cand_beam = (top_i // vocab).astype(jnp.int32)
        cand_tok = (top_i % vocab).astype(jnp.int32)
        is_eos = cand_tok == cfg.eos_token_id

        # continuing beams: the first N non-EOS candidates, in rank order
        rank_ne = jnp.cumsum(~is_eos, axis=1)                  # 1-based
        slot = jnp.where(~is_eos & (rank_ne <= n_beams),
                         rank_ne - 1, n_beams)                 # N = drop
        sel = jnp.zeros((batch, n_beams + 1), jnp.int32).at[b2, slot].set(
            jnp.broadcast_to(jnp.arange(2 * n_beams)[None, :],
                             slot.shape))[:, :n_beams]
        nxt_scores = jnp.take_along_axis(top_s, sel, axis=1)
        nxt_tok = jnp.take_along_axis(cand_tok, sel, axis=1)
        parent = jnp.take_along_axis(cand_beam, sel, axis=1)

        # EOS candidates ranked in the top N retire to the hypothesis
        # set, in rank order (HF: worse-than-top-N EOS are dropped)
        in_prompt = pos < p_len
        gen_len = jnp.maximum(pos + 1 - p_len, 1).astype(jnp.float32)
        denom = gen_len ** lp
        tok3 = tokens.reshape(batch, n_beams, L)
        eos_col = jnp.full((batch, 1), cfg.eos_token_id, jnp.int32)
        for j in range(n_beams):
            accept = is_eos[:, j] & ~done & ~in_prompt
            hist = jax.lax.dynamic_update_slice(
                tok3[b1, cand_beam[:, j]], eos_col, (0, pos))
            hyp_tokens, hyp_scores, hyp_lens = _offer(
                hyp_tokens, hyp_scores, hyp_lens, accept,
                top_s[:, j] / denom, hist, pos + 1)

        # stop rule (HF BeamHypotheses.is_done; the early_stopping=False
        # heuristic divides the best running score by the CURRENT
        # generated length — the max-length variant is HF's "never" mode,
        # not implemented here)
        full = jnp.sum(hyp_scores > _EMPTY / 2, axis=1) == n_beams
        if dcfg.early_stopping:
            newly = full
        else:
            attain = top_s[:, 0] / denom
            newly = full & (jnp.min(hyp_scores, axis=1) >= attain)
        done = done | (newly & ~in_prompt)

        # forced-prompt phase and finished batches: freeze the beams
        forced = prompt_arr[jnp.minimum(pos, p_len - 1)]
        freeze = in_prompt | done[:, None]
        nxt_tok = jnp.where(done[:, None], cfg.pad_token_id,
                            jnp.where(in_prompt, forced, nxt_tok))
        parent = jnp.where(freeze, beam_iota, parent)
        nxt_scores = jnp.where(freeze, scores, nxt_scores)

        # reorder every per-beam buffer by the chosen parents (HF
        # _reorder_cache), then append this step's tokens. The cache
        # buffers go through the Pallas gather-copy (or the one-hot MXU
        # matmul), NOT jnp.take: the in-loop gather-on-carry is the beam
        # step's dominant pathology (+12.1 of 16.9 ms/step at b128/N=4 —
        # resolve_beam_reorder).
        flat_parent = (b2 * n_beams + parent).reshape(-1)
        tokens = jnp.take(tokens, flat_parent, axis=0)
        tokens = jax.lax.dynamic_update_slice(
            tokens, nxt_tok.reshape(-1)[:, None], (0, pos))
        if reorder_impl == "pallas":
            # one kernel call copies every cache buffer AND the seen
            # mask at HBM bandwidth (ops/permute.py)
            flat = [a for v in cache.values()
                    if isinstance(v, list) for a in v]
            if track_seen:
                flat.append(seen)
            flat = permute_rows_pallas(flat, flat_parent)
            if track_seen:
                seen = flat.pop()
            it = iter(flat)
            cache = {k: ([next(it) for _ in v]
                         if isinstance(v, list) else v)
                     for k, v in cache.items()}
        elif reorder_impl == "mm":
            onehot = jax.nn.one_hot(flat_parent, n_rows, dtype=jnp.bfloat16)
            cache = {k: ([_permute_rows_mxu(a, onehot) for a in v]
                         if isinstance(v, list) else v)
                     for k, v in cache.items()}
            if track_seen:
                # the (B*N, V) bool mask rides the MXU too
                # (6.42 -> 6.20 ms/step at b128/N=4,
                # scripts/beam_stage_ab.py hyp_mm vs hyp_mmS; bool
                # round-trips bf16 exactly)
                seen = _permute_rows_mxu(seen, onehot)
        else:
            cache = {k: ([jnp.take(a, flat_parent, axis=0) for a in v]
                         if isinstance(v, list) else v)
                     for k, v in cache.items()}
            if track_seen:
                seen = jnp.take(seen, flat_parent, axis=0)
        if track_seen:
            seen = seen.at[jnp.arange(n_rows),
                           nxt_tok.reshape(-1)].set(True)
        return (tokens, nxt_scores, cache, hyp_tokens, hyp_scores,
                hyp_lens, done, seen)

    tokens, scores, cache, hyp_tokens, hyp_scores, hyp_lens, done, seen = \
        jax.lax.while_loop(cond, body, (tokens, scores, cache, hyp_tokens,
                                        hyp_scores, hyp_lens, done, seen))

    # budget exhausted: offer the N running beams (HF finalize), beam 0
    # first — no EOS is appended (the buffer is exactly full)
    fin_len = cache["index"] + 1
    denom_f = jnp.maximum(fin_len - p_len, 1).astype(jnp.float32) ** lp
    tok3 = tokens.reshape(batch, n_beams, L)
    for n in range(n_beams):
        hyp_tokens, hyp_scores, hyp_lens = _offer(
            hyp_tokens, hyp_scores, hyp_lens, ~done,
            scores[:, n] / denom_f, tok3[:, n], fin_len)

    best = jnp.argmax(hyp_scores, axis=1)
    out_tokens = hyp_tokens[b1, best]
    out_lens = hyp_lens[b1, best]

    # hiddens for pooling: ONE teacher-forced pass over the winners (see
    # module docstring — carrying hiddens through the loop would dominate)
    hiddens = wm.apply_decoder(params, cfg, enc, out_tokens,
                               attn_impl="xla").astype(enc.dtype)

    return {"tokens": out_tokens, "hiddens": hiddens, "lengths": out_lens,
            "beam_tokens": hyp_tokens, "beam_scores": hyp_scores,
            "beam_lengths": hyp_lens}
