"""Full-stage attribution of the beam-search decode step (VERDICT r4 #1).

Production beam-4 measures ~16.9 ms/step at the bench config (b128, bf16
KV, pen 1.15 + ngram 3) vs greedy's 1.95 — ~15 ms/step of overhead that
scripts/beam_phase_ab.py never decomposed (it only toggled processors).
This script rebuilds the beam loop CUMULATIVELY, one stage at a time, so
every stage gets a measured marginal and the stage marginals sum to the
production step:

  step      decoder step at B*N rows (cross K/V shared at B rows)
  logits    + (B*N, V) vocab projection + f32 log-softmax
  procs     + the processor chain (pen 1.15 + ngram bool-mask, carried
              seen mask) — production's ngram_impl="mask" composition
  topk      + candidate buffer (logp + scores, reshape to (B, N*V)) +
              bucketized stable top-2N + slot selection
  reorder   + per-step parent gather of tokens / self-KV cache / seen
  hyp       + EOS retirement (_offer x N) + done logic  ~= production
  prod      the real generate_beam, as the harness-validity check

Methodology (CLAUDE.md): every variant is one jitted program per token
budget; two budgets are differenced ((64 - 16)/48) so dispatch and fetch
cancel; variants run interleaved round-robin, min per (variant, budget)
across rounds, difference the mins. All stage loops consume their carries
(acc folds a column of every live buffer) so nothing is DCE'd or hoisted.

--micro additionally probes isolated suspects inside scan bodies:
  the unaligned (B*N, V) -> (B, N*V) f32 reshape (51865 % 128 != 0 forces
  a cross-lane relayout), the 8-buffer cache row-gather, and the f32
  log-softmax passes.
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--beams", type=int, default=4)
    p.add_argument("--reps", type=int, default=2)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--micro", action="store_true")
    p.add_argument("--stages", type=str, default="",
                   help="comma list to restrict (default: all)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from audio_transformers_tpu.core.profiling import (
        enable_compilation_cache)
    enable_compilation_cache()

    from audio_transformers_tpu.core.config import (DecodeConfig,
                                                    EmotionWhisperConfig,
                                                    MelConfig)
    from audio_transformers_tpu.models import whisper as wm
    from audio_transformers_tpu.models.whisper import beam as wbeam
    from audio_transformers_tpu.models.whisper import decode as wdecode
    from audio_transformers_tpu.models.whisper import emotion as emo
    from audio_transformers_tpu.ops.logit_processors import NEG_INF
    from audio_transformers_tpu.ops.mel import log_mel

    on_tpu = jax.default_backend() == "tpu"
    cfg = EmotionWhisperConfig()
    w = cfg.whisper
    mel_cfg = MelConfig.whisper()
    compute = jnp.bfloat16 if on_tpu else jnp.float32
    B = args.batch if on_tpu else 4
    N = args.beams
    REPS = args.reps if on_tpu else 1
    HI, LO = (64, 16) if on_tpu else (10, 4)

    rng = np.random.default_rng(0)
    waveform = jnp.asarray(
        (rng.standard_normal((B, mel_cfg.sample_rate * 30)) * 0.1)
        .astype(np.float32))
    params = emo.init(jax.random.PRNGKey(0), cfg)
    mel0 = jax.jit(lambda wv: log_mel(wv, mel_cfg, precision="high")
                   .astype(compute))(waveform)
    enc0 = wm.encode_jit(params["whisper"], w, mel0, attn_impl="auto")
    enc0.block_until_ready()

    dcfg = DecodeConfig(max_new_tokens=HI, num_beams=N,
                        repetition_penalty=1.15, no_repeat_ngram_size=3)
    prompt = wdecode.build_prompt(w, dcfg)
    prompt_arr = jnp.asarray(prompt, jnp.int32)
    p_len = len(prompt)
    vocab = w.vocab_size
    n_rows = B * N

    def sync(x):
        return float(np.asarray(x.reshape(-1)[0], np.float32))

    def min_time(call, reps):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(call())
            best = min(best, time.perf_counter() - t0)
        return best

    # ------------------------------------------------------------------
    # cumulative stage harness: one jitted fn per (stage, budget)
    # ------------------------------------------------------------------
    STAGE_ORDER = ["step", "logits", "procs", "topk", "reorder", "hyp"]
    # bisect/fix variants: (cumulative level, reorder implementation)
    #   tok        gather tokens only
    #   tok+seen   + seen mask gather
    #   tok+cache  + self-KV cache gather (jnp.take)
    #   take       all three via jnp.take (production form)
    #   mm         cache via one-hot MXU matmul, tokens/seen via take
    STAGE_IMPL = {
        "ro_tok": (4, "tok"), "ro_seen": (4, "tok+seen"),
        "ro_cache": (4, "tok+cache"), "reorder": (4, "take"),
        "ro_mm": (4, "mm"), "hyp": (5, "take"), "hyp_mm": (5, "mm"),
        # further fix candidates on top of the cache mm:
        #   mmS   seen mask also reordered via one-hot matmul
        #   mmST  + the top-k bucket gather as a one-hot matmul too
        "hyp_mmS": (5, "mmS"), "hyp_mmST": (5, "mmST"),
        #   mmB   mmS with the one-hot collapsed to its block-diagonal:
        #         parents never cross batch rows, so the (B*N, B*N)
        #         matmul is really B independent (N, N) mixes — einsum
        #         "bnm,bmf->bnf" does 1/B the MXU FLOPs for the same
        #         bytes (the copy is HBM-bound either way; this tests
        #         whether the 512x512 form pays a compute tax)
        "hyp_mmB": (5, "mmB"),
        #   mmT2  mmS + hierarchical per-beam top-k: stable top-2N per
        #         (B*N, V) row (lane-aligned, no merged (B, N*V) buffer,
        #         no logp+scores materialization — a per-row constant
        #         cannot change within-row order, so scores add to the
        #         2N selected values instead of 106 MB of candidates),
        #         then an exact tiny merge of N*2N per batch row
        #         (beam-major concat keeps lax.top_k's flattened-order
        #         tie stability)
        "hyp_mmT2": (5, "mmT2"),
        #   mmT2B the combined candidate: per-beam top-k + block-diag mm
        "hyp_mmT2B": (5, "mmT2B"),
        #   mmT2dv mmT2 with the projection as hidden @ table_t where
        #         table_t is the TRANSPOSED vocab-padded (D, v_pad)
        #         table (the production form the fused-selection
        #         experiment switched to) — isolates the einsum/layout
        #         change from the selection change
        "hyp_mmT2dv": (5, "mmT2dv"),
        #   mmF   mmT2dv + _select_candidates_fused (local, REJECTED):
        #         processed logp never materialized — procs replayed
        #         inside the bucket-max pass and on the gathered
        #         windows; measured +0.5 ms/step vs mmT2 on chip
        "hyp_mmF": (5, "mmF"),
    }

    def _select_candidates_fused(logits_pad, mask_row, seen_, banned,
                                 penalty, scores, k):
        """REJECTED experiment (kept here as its reproducer): per-beam
        selection with the processed log-prob buffer recomputed inside
        each consumer instead of materialized — max/logsumexp passes
        over the raw logits, one fused procs->bucket-max pass, then the
        identical elementwise chain replayed on the gathered top-k
        bucket windows. Token-equal to the mmT2 form, but it MEASURES
        +0.5 ms/step on chip (mmT2 5.95 / mmT2dv 6.00 / mmF 6.50,
        b128/N=4): XLA already fuses log-softmax + processors into the
        bucket-max consumer, so the hand fusion only adds the window
        re-processing and an extra raw-logits traversal."""
        n_rows_, v_pad_ = logits_pad.shape
        BUCKET = wbeam._BUCKET
        real = logits_pad[:, :vocab]
        m = jnp.max(real, axis=1, keepdims=True)
        ls = jnp.log(jnp.sum(jnp.exp(real - m), axis=1, keepdims=True))
        pad_col = (jnp.arange(v_pad_) >= vocab)[None, :]

        def proc(x, msk, sn, bn, padc):
            mm_ = m.reshape(m.shape[0], *([1] * (x.ndim - 1)))
            ls_ = ls.reshape(ls.shape[0], *([1] * (x.ndim - 1)))
            y = (x - mm_) - ls_
            y = jnp.where(msk, NEG_INF, y)
            if sn is not None:
                y = jnp.where(sn & (y > 0), y / penalty,
                              jnp.where(sn, y * penalty, y))
            if bn is not None:
                y = jnp.where(bn, NEG_INF, y)
            return jnp.where(padc, -jnp.inf, y)

        nb = v_pad_ // BUCKET
        y_b = proc(logits_pad, mask_row, seen_, banned, pad_col)
        bmax = jnp.max(y_b.reshape(n_rows_, nb, BUCKET), axis=-1)
        _, bidx = wbeam._masked_argmax_top_k(bmax, k)
        bsel = jnp.sort(bidx, axis=1)

        def win(a):
            return jnp.take_along_axis(
                a.reshape(n_rows_, nb, BUCKET), bsel[:, :, None], axis=1)

        def win_row(v):
            return jnp.take(jnp.broadcast_to(v, (1, v_pad_))
                            .reshape(nb, BUCKET), bsel, axis=0)

        wy = proc(win(logits_pad), win_row(mask_row),
                  None if seen_ is None else win(seen_),
                  None if banned is None else win(banned),
                  win_row(pad_col)).reshape(n_rows_, k * BUCKET)
        vals, ci = wbeam._masked_argmax_top_k(wy, k)
        idxs = (jnp.take_along_axis(bsel, ci // BUCKET, axis=1)
                * BUCKET + ci % BUCKET).astype(jnp.int32)
        vals = vals + scores.reshape(n_rows_, 1)
        gidx = idxs + (jnp.arange(n_rows_) % N)[:, None] * vocab
        vals = vals.reshape(n_rows_ // N, N * k)
        gidx = gidx.reshape(n_rows_ // N, N * k)
        top_s, ci2 = wbeam._masked_argmax_top_k(vals, k)
        return top_s, jnp.take_along_axis(gidx, ci2, axis=1)

    def _per_beam_top_k(logp, scores, k):
        n_rows_, vocab_ = logp.shape
        nb_ = n_rows_ // N
        vals, idxs = wbeam._stable_top_k(logp, k)         # per-beam rows
        vals = vals + scores.reshape(n_rows_, 1)
        gidx = idxs + (jnp.arange(n_rows_) % N)[:, None] * vocab_
        vals = vals.reshape(nb_, N * k)
        gidx = gidx.reshape(nb_, N * k)
        v2, ci = wbeam._masked_argmax_top_k(vals, k)
        return v2, jnp.take_along_axis(gidx, ci, axis=1)

    def _stable_top_k_mm(x, k):
        """_stable_top_k with the chosen-bucket gather expressed as a
        one-hot matmul (exact: one nonzero per output row)."""
        b, n = x.shape
        BUCKET = wbeam._BUCKET
        nb = -(-n // BUCKET)
        pad = nb * BUCKET - n
        xp = jnp.pad(x, ((0, 0), (0, pad)),
                     constant_values=-jnp.inf) if pad else x
        xb = xp.reshape(b, nb, BUCKET)
        bmax = jnp.max(xb, axis=-1)
        _, bidx = wbeam._masked_argmax_top_k(bmax, k)
        bsel = jnp.sort(bidx, axis=1)
        oh = jax.nn.one_hot(bsel, nb, dtype=x.dtype)      # (b, k, nb)
        cand = jnp.einsum("bkn,bnl->bkl", oh, xb).reshape(b, k * BUCKET)
        vals, ci = wbeam._masked_argmax_top_k(cand, k)
        gi = (jnp.take_along_axis(bsel, ci // BUCKET, axis=1) * BUCKET
              + ci % BUCKET)
        return vals, gi.astype(jnp.int32)

    @functools.partial(jax.jit, static_argnames=("stage", "budget"))
    def run_stage(params, enc, *, stage: str, budget: int):
        lvl, ro_impl = STAGE_IMPL.get(stage,
                                      (STAGE_ORDER.index(stage)
                                       if stage in STAGE_ORDER else 0,
                                       "take"))
        L = p_len + budget
        lp_pen = float(dcfg.length_penalty)
        tokens = jnp.full((n_rows, L), w.pad_token_id, jnp.int32)
        tokens = tokens.at[:, :p_len].set(prompt_arr[None, :])
        scores = jnp.full((B, N), wbeam._SCORE_FLOOR, jnp.float32)
        scores = scores.at[:, 0].set(0.0)
        cache = wm.init_cache(w, n_rows, max_len=L, dtype=enc.dtype)
        cross = wm.precompute_cross_attention(params, w, enc)
        step_params = wm.prepare_decode_params(params, w, dtype=enc.dtype)
        sup = ()
        bsup = ((wdecode._SPACE_TOKEN, w.eos_token_id)
                if dcfg.suppress_blank else ())
        v_pad = -(-vocab // wbeam._BUCKET) * wbeam._BUCKET
        table_t = jnp.pad(
            jnp.transpose(step_params["embed"]["table"].astype(enc.dtype)),
            ((0, 0), (0, v_pad - vocab)))
        sup_vec = jnp.zeros((v_pad,), bool)
        if len(sup):
            sup_vec = sup_vec.at[jnp.asarray(list(sup), jnp.int32)].set(True)
        begin_vec = jnp.zeros((v_pad,), bool)
        if len(bsup):
            begin_vec = begin_vec.at[
                jnp.asarray(list(bsup), jnp.int32)].set(True)
        seen_w = v_pad if ro_impl == "mmF" else vocab
        seen = jnp.zeros((n_rows, seen_w), bool).at[
            jnp.arange(n_rows), tokens[:, 0]].set(True)
        hyp_tokens = jnp.full((B, N, L), w.pad_token_id, jnp.int32)
        hyp_scores = jnp.full((B, N), wbeam._EMPTY, jnp.float32)
        hyp_lens = jnp.zeros((B, N), jnp.int32)
        done = jnp.zeros((B,), bool)
        b1 = jnp.arange(B)
        b2 = b1[:, None]
        beam_iota = jnp.arange(N)[None, :]
        acc0 = jnp.float32(0.0)

        def body(state):
            (tokens, scores, cache, hyp_tokens, hyp_scores, hyp_lens,
             done, seen, acc) = state
            i = cache["index"]
            tok = jax.lax.dynamic_slice(tokens, (0, i), (n_rows, 1))[:, 0]
            hidden, cache = wm.apply_decoder_step(
                params, w, tok, cache, cross, step_params=step_params,
                attn_impl="xla", beams=N)
            pos = i + 1
            in_prompt = pos < p_len
            forced = prompt_arr[jnp.minimum(pos, p_len - 1)]

            if lvl == 0:      # decoder step only
                nxt_rows = (jnp.argmax(hidden, axis=-1).astype(jnp.int32)
                            % 100 + 1000)
                acc += jnp.sum(hidden[:, 0].astype(jnp.float32)) * 1e-30
                nxt_rows = jnp.where(in_prompt, forced, nxt_rows)
                tokens = jax.lax.dynamic_update_slice(
                    tokens, nxt_rows[:, None], (0, pos))
                return (tokens, scores, cache, hyp_tokens, hyp_scores,
                        hyp_lens, done, seen, acc)

            if ro_impl in ("mmT2dv", "mmF"):
                logits = jnp.einsum("bd,dv->bv", hidden, table_t,
                                    preferred_element_type=jnp.float32)
            else:
                table = step_params["embed"]["table"].astype(hidden.dtype)
                logits = jnp.einsum("bd,vd->bv", hidden, table,
                                    preferred_element_type=jnp.float32)

            if ro_impl == "mmF":
                # the fused-selection experiment: replicate production's
                # topk_fused branch exactly
                row_done = jnp.repeat(done, N)
                msk = (sup_vec[None, :]
                       | ((pos == p_len) & begin_vec[None, :]))
                flag, fcont, _ = wdecode._ngram_window_flags(
                    tokens, pos, dcfg.no_repeat_ngram_size, row_done)
                banned = jnp.zeros((n_rows, v_pad), bool).at[
                    jnp.arange(n_rows)[:, None], fcont].max(flag)
                top_s, top_i = _select_candidates_fused(
                    logits, msk, seen, banned,
                    float(dcfg.repetition_penalty), scores, 2 * N)
                acc += jnp.sum(top_s[:, :1]) * 1e-30
            else:
                logp = jax.nn.log_softmax(
                    logits[:, :vocab] if ro_impl == "mmT2dv" else logits,
                    axis=-1)
                # keep the normalizer alive whatever the consumer below
                acc += jnp.sum(jax.lax.dynamic_slice(
                    logp, (0, 0), (n_rows, 1))) * 1e-30

            if lvl >= 2 and ro_impl != "mmF":   # + processors
                row_done = jnp.repeat(done, N)
                logp = wdecode._process_logits(
                    logp, tokens, pos, w, dcfg, p_len, sup, bsup,
                    seen=seen, finished=row_done, ngram_impl="mask")

            if lvl == 1 or lvl == 2:
                nxt_rows = jnp.argmax(logp, axis=-1).astype(jnp.int32)
                nxt_rows = jnp.where(in_prompt, forced, nxt_rows)
                tokens = jax.lax.dynamic_update_slice(
                    tokens, nxt_rows[:, None], (0, pos))
                seen = seen.at[jnp.arange(n_rows), nxt_rows].set(True)
                return (tokens, scores, cache, hyp_tokens, hyp_scores,
                        hyp_lens, done, seen, acc)

            # lvl >= 3: candidate buffer + stable top-2N + slot selection
            if ro_impl == "mmF":
                pass                          # selected above, fused
            elif ro_impl in ("mmT2", "mmT2B", "mmT2dv"):
                top_s, top_i = _per_beam_top_k(logp, scores, 2 * N)
            else:
                cand = (logp + scores.reshape(n_rows, 1)).reshape(
                    B, N * vocab)
                topk_fn = (_stable_top_k_mm if ro_impl == "mmST"
                           else wbeam._stable_top_k)
                top_s, top_i = topk_fn(cand, 2 * N)
            cand_beam = (top_i // vocab).astype(jnp.int32)
            cand_tok = (top_i % vocab).astype(jnp.int32)
            is_eos = cand_tok == w.eos_token_id
            rank_ne = jnp.cumsum(~is_eos, axis=1)
            slot = jnp.where(~is_eos & (rank_ne <= N), rank_ne - 1, N)
            sel = jnp.zeros((B, N + 1), jnp.int32).at[b2, slot].set(
                jnp.broadcast_to(jnp.arange(2 * N)[None, :],
                                 slot.shape))[:, :N]
            nxt_scores = jnp.take_along_axis(top_s, sel, axis=1)
            nxt_tok = jnp.take_along_axis(cand_tok, sel, axis=1)
            parent = jnp.take_along_axis(cand_beam, sel, axis=1)

            if lvl >= 5:      # + EOS retirement and the stop rule
                gen_len = jnp.maximum(pos + 1 - p_len, 1) \
                    .astype(jnp.float32)
                denom = gen_len ** lp_pen
                tok3 = tokens.reshape(B, N, L)
                eos_col = jnp.full((B, 1), w.eos_token_id, jnp.int32)
                for j in range(N):
                    accept = is_eos[:, j] & ~done & ~in_prompt
                    hist = jax.lax.dynamic_update_slice(
                        tok3[b1, cand_beam[:, j]], eos_col, (0, pos))
                    hyp_tokens, hyp_scores, hyp_lens = _offer(
                        hyp_tokens, hyp_scores, hyp_lens, accept,
                        top_s[:, j] / denom, hist, pos + 1)
                full = jnp.sum(hyp_scores > wbeam._EMPTY / 2, axis=1) == N
                attain = top_s[:, 0] / denom
                newly = full & (jnp.min(hyp_scores, axis=1) >= attain)
                done = done | (newly & ~in_prompt)

            freeze = in_prompt | done[:, None]
            nxt_tok = jnp.where(done[:, None], w.pad_token_id,
                                jnp.where(in_prompt, forced, nxt_tok))
            parent = jnp.where(freeze, beam_iota, parent)
            nxt_scores = jnp.where(freeze, scores, nxt_scores)

            if lvl >= 4:      # + the per-step parent reorder
                flat_parent = (b2 * N + parent).reshape(-1)
                tokens = jnp.take(tokens, flat_parent, axis=0)
                if ro_impl in ("tok+cache", "take"):
                    cache = {k: ([jnp.take(a, flat_parent, axis=0)
                                  for a in v]
                                 if isinstance(v, list) else v)
                             for k, v in cache.items()}
                elif ro_impl in ("mm", "mmS", "mmST", "mmT2", "mmT2dv",
                                 "mmF"):
                    onehot = jax.nn.one_hot(flat_parent, n_rows,
                                            dtype=jnp.bfloat16)

                    def mm_gather(a):
                        out = jnp.tensordot(
                            onehot.astype(a.dtype)
                            if a.dtype == jnp.int8 else onehot,
                            a, axes=1)
                        return out.astype(a.dtype)

                    cache = {k: ([mm_gather(a) for a in v]
                                 if isinstance(v, list) else v)
                             for k, v in cache.items()}
                elif ro_impl in ("mmB", "mmT2B"):
                    oh_b = jax.nn.one_hot(parent, N, dtype=jnp.bfloat16)

                    def mm_gather(a):
                        oh = (oh_b.astype(a.dtype)
                              if a.dtype == jnp.int8 else oh_b)
                        f = a.reshape(B, N, -1)
                        out = jnp.einsum("bnm,bmf->bnf", oh, f)
                        return out.reshape(a.shape).astype(a.dtype)

                    cache = {k: ([mm_gather(a) for a in v]
                                 if isinstance(v, list) else v)
                             for k, v in cache.items()}
                if ro_impl in ("mmS", "mmST", "mmT2", "mmB", "mmT2B",
                               "mmT2dv", "mmF"):
                    seen = mm_gather(seen)
                elif ro_impl in ("tok+seen", "take", "mm"):
                    seen = jnp.take(seen, flat_parent, axis=0)
            tokens = jax.lax.dynamic_update_slice(
                tokens, nxt_tok.reshape(-1)[:, None], (0, pos))
            seen = seen.at[jnp.arange(n_rows),
                           nxt_tok.reshape(-1)].set(True)
            return (tokens, nxt_scores, cache, hyp_tokens, hyp_scores,
                    hyp_lens, done, seen, acc)

        def _offer(hyp_tokens, hyp_scores, hyp_lens, accept, norm, hist,
                   length):
            worst_slot = jnp.argmin(hyp_scores, axis=1)
            cur_worst = jnp.take_along_axis(hyp_scores,
                                            worst_slot[:, None], 1)[:, 0]
            do = accept & (norm > cur_worst)
            cur_tok = hyp_tokens[b1, worst_slot]
            hyp_tokens = hyp_tokens.at[b1, worst_slot].set(
                jnp.where(do[:, None], hist, cur_tok))
            hyp_scores = hyp_scores.at[b1, worst_slot].set(
                jnp.where(do, norm, cur_worst))
            hyp_lens = hyp_lens.at[b1, worst_slot].set(
                jnp.where(do, length, hyp_lens[b1, worst_slot]))
            return hyp_tokens, hyp_scores, hyp_lens

        def cond(state):
            cache = state[2]
            done = state[6]
            return (cache["index"] < L - 1) & ~jnp.all(done)

        state = (tokens, scores, cache, hyp_tokens, hyp_scores, hyp_lens,
                 done, seen, acc0)
        state = jax.lax.while_loop(cond, body, state)
        tokens, scores, _, _, hyp_scores, _, _, _, acc = (
            state[0], state[1], state[2], state[3], state[4], state[5],
            state[6], state[7], state[8])
        out = (jnp.sum(tokens).astype(jnp.float32) * 1e-30
               + jnp.sum(scores) * 1e-30 + acc)
        if lvl >= 5:
            out = out + jnp.sum(hyp_scores) * 1e-30
        return out.reshape(1)

    def run_prod(budget: int):
        d2 = dcfg.replace(max_new_tokens=budget)
        return wbeam.generate_beam(params["whisper"], w, d2, enc0,
                                   prompt=prompt)["lengths"]

    ALL = (STAGE_ORDER[:4]
           + ["ro_tok", "ro_seen", "ro_cache", "reorder", "ro_mm",
              "hyp", "hyp_mm", "hyp_mmS", "hyp_mmST", "hyp_mmB",
              "hyp_mmT2", "hyp_mmT2B", "hyp_mmT2dv", "hyp_mmF"])
    stages = ([s for s in ALL if s in args.stages.split(",")]
              if args.stages else ALL) + ["prod"]

    def call(stage, budget):
        if stage == "prod":
            return run_prod(budget)
        return run_stage(params["whisper"], enc0, stage=stage,
                         budget=budget)

    for s in stages:
        for budget in (HI, LO):
            t0 = time.perf_counter()
            sync(call(s, budget))
            print(f"compiled {s}/{budget} ({time.perf_counter()-t0:.1f}s)",
                  flush=True)

    best = {}
    for r in range(args.rounds):
        for s in stages:
            for budget in (HI, LO):
                k = (s, budget)
                best[k] = min(best.get(k, float("inf")),
                              min_time(lambda: call(s, budget), REPS))
        print(f"round {r} done", flush=True)

    print(f"\n== per-step totals (B={B}, N={N}, budgets {HI}/{LO}) ==")
    prev = 0.0
    for s in stages:
        hi, lo = best[(s, HI)], best[(s, LO)]
        ms = (hi - lo) / (HI - LO) * 1e3
        marg = ms - prev if s != "prod" else float("nan")
        print(f"{s:8s} {ms:7.3f} ms/step   marginal {marg:+7.3f}   "
              f"(totals {hi*1e3:.0f} / {lo*1e3:.0f} ms)", flush=True)
        if s != "prod":
            prev = ms

    # ------------------------------------------------------------------
    # micro probes
    # ------------------------------------------------------------------
    if args.micro:
        print("\n== micro probes (scan-chained, differenced) ==")

        def scan_probe(make_body, init, hi=24, lo=8):
            ts = {}
            for n in (hi, lo):
                @functools.partial(jax.jit, static_argnames=("n",))
                def fn(x, n=n):
                    def body(c, _):
                        return make_body(c), None
                    c, _ = jax.lax.scan(body, x, None, length=n)
                    return jax.tree.leaves(c)[0].reshape(-1)[:1] \
                        .astype(jnp.float32)
                sync(fn(init))
                ts[n] = min_time(lambda fn=fn: fn(init), REPS + 1)
            return (ts[hi] - ts[lo]) / (hi - lo) * 1e3

        x_rows = jnp.asarray(
            rng.standard_normal((n_rows, vocab)).astype(np.float32))

        # the unaligned merge reshape (B*N, V) -> (B, N*V)
        def reshape_body(c):
            y = (x_rows + c[0, 0] * 1e-30).reshape(B, N * vocab)
            m = jnp.max(y, axis=-1)
            return c + m[:: B // 4, None] * 1e-30  # consume, keep shape
        ms = scan_probe(reshape_body, jnp.zeros((4, 1), jnp.float32))
        print(f"reshape (B*N,V)->(B,N*V) + rowmax : {ms:7.3f} ms")

        # the same rowmax without the reshape
        def nomerge_body(c):
            y = x_rows + c[0, 0] * 1e-30
            m = jnp.max(y, axis=-1)
            return c + m[:4, None] * 1e-30
        ms = scan_probe(nomerge_body, jnp.zeros((4, 1), jnp.float32))
        print(f"rowmax over (B*N,V) baseline      : {ms:7.3f} ms")

        # f32 log-softmax over (B*N, V)
        def lsm_body(c):
            y = jax.nn.log_softmax(x_rows + c[0, 0] * 1e-30, axis=-1)
            return c + y[:4, :1] * 1e-30
        ms = scan_probe(lsm_body, jnp.zeros((4, 1), jnp.float32))
        print(f"log_softmax (B*N,V) f32           : {ms:7.3f} ms")

        # the 8-buffer self-KV row gather at L = p_len + HI
        L = p_len + HI
        bufs = [jnp.asarray(rng.standard_normal(
            (n_rows, w.num_heads, w.head_dim, L)).astype(np.float32)
            .astype(jnp.bfloat16)) for _ in range(8)]
        perm = jnp.asarray(rng.integers(0, n_rows, n_rows), jnp.int32)

        def take_body(c):
            return [jnp.take(a, perm, axis=0) for a in c]
        ms = scan_probe(take_body, bufs)
        nbytes = sum(int(np.prod(a.shape)) * 2 for a in bufs)
        print(f"8x cache row-gather (L={L})        : {ms:7.3f} ms "
              f"({nbytes/1e6:.0f} MB logical r+w)")

        # seen-mask gather + scatter
        seen0 = jnp.zeros((n_rows, vocab), bool)
        def seen_body(c):
            y = jnp.take(c, perm, axis=0)
            return y.at[jnp.arange(n_rows), perm % vocab].set(True)
        ms = scan_probe(seen_body, seen0)
        print(f"seen (B*N,V) bool gather+scatter  : {ms:7.3f} ms")


if __name__ == "__main__":
    main()
