"""Decode-parity tests (SURVEY.md §4 prescription (d)).

Token-level parity is checked against HF's own logits processors and a
step-by-step torch greedy loop over the same random-weight model — i.e.
exactly what `generate` does minus its hub-dependent meta-behavior (no
network in this environment).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_transformers_tpu.core.config import DecodeConfig
from audio_transformers_tpu.models import whisper as wm
from audio_transformers_tpu.models.whisper import decode as wdecode
from audio_transformers_tpu.models.whisper.load import (config_from_hf,
                                                        from_torch_state_dict)
from audio_transformers_tpu.ops import logit_processors as lp


@pytest.fixture(scope="module")
def hf_pair():
    import torch
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration

    hf_cfg = HFConfig(
        vocab_size=500, num_mel_bins=80, d_model=64,
        encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_ffn_dim=128, decoder_ffn_dim=128,
        max_source_positions=50, max_target_positions=32,
        pad_token_id=0, bos_token_id=0, eos_token_id=0,
        decoder_start_token_id=1,
    )
    torch.manual_seed(0)
    tm = WhisperForConditionalGeneration(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg)
    params, _ = from_torch_state_dict(tm.state_dict(), cfg)
    return tm, cfg, params


def _mel(batch, t, n_mels, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((batch, t, n_mels)).astype(np.float32)


def _hf_greedy(tm, mel_cf, prompt, max_new, processors, eos_id, pad_id):
    """Reference greedy loop: torch forward + official HF processors."""
    import torch

    ids = torch.tensor([list(prompt)] * mel_cf.shape[0], dtype=torch.long)
    finished = torch.zeros(ids.shape[0], dtype=torch.bool)
    with torch.no_grad():
        for _ in range(max_new):
            logits = tm(input_features=mel_cf,
                        decoder_input_ids=ids).logits[:, -1, :]
            for proc in processors:
                logits = proc(ids, logits)
            nxt = logits.argmax(-1)
            nxt = torch.where(finished, torch.full_like(nxt, pad_id), nxt)
            ids = torch.cat([ids, nxt[:, None]], dim=1)
            finished |= nxt == eos_id
            if bool(finished.all()):
                break
    return ids.numpy()


class TestGreedyParity:
    @pytest.mark.parametrize("ngram,penalty", [(0, 1.0), (3, 1.0),
                                               (0, 1.15), (3, 1.15)])
    def test_matches_hf_processors(self, hf_pair, ngram, penalty):
        import torch
        from transformers.generation.logits_process import (
            NoRepeatNGramLogitsProcessor, RepetitionPenaltyLogitsProcessor)

        tm, cfg, params = hf_pair
        mel = _mel(3, 2 * cfg.max_source_positions, cfg.n_mels, seed=11)
        prompt = (cfg.decoder_start_token_id,)
        max_new = 16

        procs = []
        if penalty != 1.0:
            procs.append(RepetitionPenaltyLogitsProcessor(penalty))
        if ngram:
            procs.append(NoRepeatNGramLogitsProcessor(ngram))
        want = _hf_greedy(tm, torch.from_numpy(mel.transpose(0, 2, 1)),
                          prompt, max_new, procs, cfg.eos_token_id,
                          cfg.pad_token_id)

        dcfg = DecodeConfig(max_new_tokens=max_new, temperature=0.0,
                            no_repeat_ngram_size=ngram,
                            repetition_penalty=penalty,
                            return_timestamps=False)
        enc = wm.encode(params, cfg, jnp.asarray(mel))
        # bypass build_prompt's notimestamps (toy vocab has none meaningful)
        out = wdecode.generate(params, cfg, dcfg, enc, prompt=prompt,
                               begin_suppress_ids=())
        got = np.asarray(out["tokens"])
        lengths = np.asarray(out["lengths"])
        for b in range(3):
            n = min(lengths[b], want.shape[1])
            np.testing.assert_array_equal(
                got[b, :n], want[b, :n],
                err_msg=f"row {b}: ours {got[b, :n]} vs hf {want[b, :n]}")

    def test_lengths_and_padding(self, hf_pair):
        _, cfg, params = hf_pair
        mel = _mel(2, 2 * cfg.max_source_positions, cfg.n_mels, seed=5)
        dcfg = DecodeConfig(max_new_tokens=12)
        enc = wm.encode(params, cfg, jnp.asarray(mel))
        out = wdecode.generate(params, cfg, dcfg, enc,
                               prompt=(cfg.decoder_start_token_id,),
                               begin_suppress_ids=())
        tokens = np.asarray(out["tokens"])
        lengths = np.asarray(out["lengths"])
        for b in range(2):
            if lengths[b] < tokens.shape[1]:
                assert tokens[b, lengths[b] - 1] == cfg.eos_token_id
                assert (tokens[b, lengths[b]:] == cfg.pad_token_id).all()


class TestTimestampRules:
    def _gen_config(self, cfg):
        from transformers import GenerationConfig
        g = GenerationConfig()
        g.no_timestamps_token_id = cfg.no_timestamps_token_id
        g.eos_token_id = cfg.eos_token_id
        g.max_initial_timestamp_index = 50
        g.decoder_start_token_id = cfg.decoder_start_token_id
        return g

    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_matches_hf_timestamp_processor(self, hf_pair, seed):
        import torch
        from transformers.generation.logits_process import (
            WhisperTimeStampLogitsProcessor)

        _, cfg, _ = hf_pair
        # timestamps occupy the top of the toy vocab; eos must be nonzero
        # here (HF's processor does `eos or bos`, so eos=0 degenerates)
        cfg = cfg.replace(no_timestamps_token_id=399, timestamp_begin_id=400,
                          eos_token_id=398)
        begin = 2
        rng = np.random.default_rng(seed)
        length = 10
        # random histories with a plausible mix of text and timestamps
        toks = rng.integers(2, cfg.vocab_size, (2, length)).astype(np.int64)
        toks[:, 0] = cfg.decoder_start_token_id
        # sprinkle timestamps (non-decreasing)
        for b in range(2):
            t0 = 400 + int(rng.integers(0, 40))
            toks[b, 2] = t0
            if seed % 2:
                toks[b, 3] = t0 + int(rng.integers(0, 30))
        for pos in range(begin, length):
            logits = rng.standard_normal((2, cfg.vocab_size)).astype(np.float32)

            proc = WhisperTimeStampLogitsProcessor(
                self._gen_config(cfg), begin_index=begin)
            want = proc(torch.from_numpy(toks[:, :pos]),
                        torch.from_numpy(logits.copy())).numpy()

            buf = np.zeros((2, length), np.int32)
            buf[:, :pos] = toks[:, :pos]
            got = np.asarray(lp.whisper_timestamp_rules(
                jnp.asarray(logits), jnp.asarray(buf), jnp.asarray(pos),
                begin_index=begin,
                timestamp_begin=cfg.timestamp_begin_id,
                eos_token_id=cfg.eos_token_id,
                no_timestamps_token_id=cfg.no_timestamps_token_id,
                max_initial_timestamp_index=50))

            # compare argmax decisions and mask patterns
            finite_want = np.isfinite(np.where(want < -1e30, -np.inf, want))
            finite_got = np.isfinite(np.where(got < -1e30, -np.inf, got))
            np.testing.assert_array_equal(
                finite_got, finite_want,
                err_msg=f"mask mismatch at pos={pos}")
            np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))

    @pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5])
    def test_greedy_token_matches_full_rule_argmax(self, hf_pair, seed):
        """whisper_timestamp_greedy_token (the decode loop's fused
        reductions+argmax form) must pick the exact token that
        argmax(whisper_timestamp_rules(...)) picks — including positions
        where the probability rule forces timestamps (biasing the
        timestamp half upward below makes force_ts fire on a meaningful
        fraction of rows)."""
        _, cfg, _ = hf_pair
        cfg = cfg.replace(no_timestamps_token_id=399, timestamp_begin_id=400,
                          eos_token_id=398)
        begin = 2
        rng = np.random.default_rng(100 + seed)
        length = 12
        toks = rng.integers(2, cfg.vocab_size, (4, length)).astype(np.int32)
        toks[:, 0] = cfg.decoder_start_token_id
        for b in range(4):
            t0 = 400 + int(rng.integers(0, 40))
            toks[b, 2] = t0
            if (seed + b) % 2:
                toks[b, 3] = t0 + int(rng.integers(0, 30))
        kw = dict(begin_index=begin,
                  timestamp_begin=cfg.timestamp_begin_id,
                  eos_token_id=cfg.eos_token_id,
                  no_timestamps_token_id=cfg.no_timestamps_token_id,
                  max_initial_timestamp_index=50)
        for pos in range(begin, length):
            logits = rng.standard_normal((4, cfg.vocab_size)) \
                .astype(np.float32)
            # push some rows toward force_ts (timestamp mass dominates)
            logits[::2, cfg.timestamp_begin_id:] += 2.0
            buf = np.zeros((4, length), np.int32)
            buf[:, :pos] = toks[:, :pos]
            full = np.asarray(lp.whisper_timestamp_rules(
                jnp.asarray(logits), jnp.asarray(buf), jnp.asarray(pos),
                **kw))
            got = np.asarray(lp.whisper_timestamp_greedy_token(
                jnp.asarray(logits), jnp.asarray(buf), jnp.asarray(pos),
                **kw))
            np.testing.assert_array_equal(
                got, full.argmax(-1).astype(np.int32),
                err_msg=f"fused greedy token mismatch at pos={pos}")

    @pytest.mark.parametrize("seed", [0, 1, 2])
    @pytest.mark.parametrize("max_initial", [None, 3, 50])
    def test_row_bounds_equal_mask_predicate(self, hf_pair, seed,
                                             max_initial):
        """timestamp_row_bounds (the kernel's three-interval encoding)
        must reproduce _timestamp_mask_cond exactly, minus the static
        <|notimestamps|> term it delegates to the additive vector."""
        _, cfg, _ = hf_pair
        cfg = cfg.replace(no_timestamps_token_id=399, timestamp_begin_id=400,
                          eos_token_id=398)
        tb = cfg.timestamp_begin_id
        begin = 2
        rng = np.random.default_rng(200 + seed)
        length = 12
        vocab = cfg.vocab_size
        toks = rng.integers(2, vocab, (4, length)).astype(np.int32)
        toks[:, 0] = cfg.decoder_start_token_id
        toks[1, 2] = 410                  # lone timestamp
        toks[2, 2], toks[2, 3] = 410, 420  # pair
        for pos in range(begin, length):
            buf = np.zeros((4, length), np.int32)
            buf[:, :pos] = toks[:, :pos]
            want = np.asarray(lp._timestamp_mask_cond(
                jnp.asarray(buf), jnp.asarray(pos), vocab=vocab,
                begin_index=begin, timestamp_begin=tb,
                eos_token_id=cfg.eos_token_id,
                no_timestamps_token_id=cfg.no_timestamps_token_id,
                max_initial_timestamp_index=max_initial))
            tlo, thi, tcap = (np.asarray(x)[:, None]
                              for x in lp.timestamp_row_bounds(
                jnp.asarray(buf), jnp.asarray(pos), begin_index=begin,
                timestamp_begin=tb, eos_token_id=cfg.eos_token_id,
                max_initial_timestamp_index=max_initial))
            g = np.arange(vocab)[None, :]
            got = (g < tlo) | ((g >= tb) & (g < thi)) | (g > tcap)
            got = got | (g == cfg.no_timestamps_token_id)  # delegated
            np.testing.assert_array_equal(got, want,
                                          err_msg=f"pos={pos}")


def test_timestamped_decode_produces_valid_structure(hf_pair):
    """End-to-end timestamped greedy decode on the toy model: timestamps
    non-decreasing, first generated token is a timestamp."""
    _, cfg, params = hf_pair
    cfg = cfg.replace(no_timestamps_token_id=399, timestamp_begin_id=400)
    mel = _mel(2, 2 * cfg.max_source_positions, cfg.n_mels, seed=9)
    dcfg = DecodeConfig(max_new_tokens=20, return_timestamps=True)
    enc = wm.encode(params, cfg, jnp.asarray(mel))
    prompt = (cfg.decoder_start_token_id,)
    out = wdecode.generate(params, cfg, dcfg, enc, prompt=prompt,
                           begin_suppress_ids=())
    tokens = np.asarray(out["tokens"])
    lengths = np.asarray(out["lengths"])
    for b in range(2):
        gen = tokens[b, 1: lengths[b]]
        assert gen[0] >= cfg.timestamp_begin_id, gen
        ts = [t for t in gen if t >= cfg.timestamp_begin_id]
        assert ts == sorted(ts), ts


class TestTemperatureFallback:
    """compression_ratio_threshold triggers a temperature re-decode of
    degenerate rows only (reference evaluate.py:41-58 semantics)."""

    class _FakeTok:
        """Flags row content by what it decodes to: ids are ignored, the
        first call returns degenerate text, later calls clean text."""

        def __init__(self):
            self.calls = 0

        def decode(self, ids):
            self.calls += 1
            if self.calls == 1:
                return "ha ha ha " * 60          # compresses far above 2.4
            return f"clean unique text {self.calls} with entropy 9q3z"

    def _enc(self, cfg, params, batch=2):
        rng = np.random.default_rng(0)
        mel = jnp.asarray(rng.standard_normal(
            (batch, 2 * cfg.max_source_positions, cfg.n_mels))
            .astype(np.float32))
        return wm.encode(params, cfg, mel)

    def test_flagged_row_redecoded_clean_row_kept(self, hf_pair):
        _, cfg, params = hf_pair
        enc = self._enc(cfg, params)
        dcfg = DecodeConfig(max_new_tokens=12,
                            compression_ratio_threshold=2.4)
        greedy = wdecode.generate(params, cfg, dcfg, enc)
        # the fallback gathers flagged rows into a minimal bucket: one
        # flagged row -> a batch-1 temperature decode of that row
        hot = wdecode.generate(params, cfg,
                               dcfg.replace(temperature=0.7), enc[:1],
                               rng=jax.random.PRNGKey(0))
        out = wdecode.generate_with_fallback(
            params, cfg, dcfg, enc, tokenizer=self._FakeTok(),
            rng=jax.random.PRNGKey(0))
        # row 0 was flagged -> temperature decode; row 1 stays greedy
        np.testing.assert_array_equal(np.asarray(out["tokens"][0]),
                                      np.asarray(hot["tokens"][0]))
        np.testing.assert_array_equal(np.asarray(out["tokens"][1]),
                                      np.asarray(greedy["tokens"][1]))
        np.testing.assert_array_equal(np.asarray(out["lengths"]),
                                      np.asarray([hot["lengths"][0],
                                                  greedy["lengths"][1]]))

    def test_fallback_bucket_is_minimal(self, hf_pair, monkeypatch):
        """One flagged row in a batch of 5 re-decodes a power-of-two bucket
        (here 1), not the whole batch (VERDICT r2 weak #4)."""
        _, cfg, params = hf_pair
        enc = self._enc(cfg, params, batch=5)
        dcfg = DecodeConfig(max_new_tokens=12,
                            compression_ratio_threshold=2.4)

        class FlagThird:
            def decode(self, ids):  # flag only row index 2
                if not hasattr(self, "n"):
                    self.n = 0
                self.n += 1
                return ("ha ha ha " * 60 if self.n == 3
                        else f"clean text {self.n} 9q3z")

        calls = []
        real_generate = wdecode.generate

        def spy(params, cfg, dcfg, enc, **kw):
            calls.append(enc.shape[0])
            return real_generate(params, cfg, dcfg, enc, **kw)

        monkeypatch.setattr(wdecode, "generate", spy)
        greedy = real_generate(params, cfg, dcfg, enc)
        out = wdecode.generate_with_fallback(params, cfg, dcfg, enc,
                                             tokenizer=FlagThird())
        assert calls == [5, 1], calls
        for b in (0, 1, 3, 4):
            np.testing.assert_array_equal(np.asarray(out["tokens"][b]),
                                          np.asarray(greedy["tokens"][b]))

    def test_bucket_pad_rows_never_leak_into_the_merge(self, hf_pair):
        """3 flagged rows bucket to 4; the pad slot repeats the first
        flagged row but is an INDEPENDENT temperature sample of it — only
        resampled rows 0..2 may merge back (duplicate scatter indices
        with differing updates would mix fields between samples)."""
        _, cfg, params = hf_pair
        enc = self._enc(cfg, params, batch=5)
        dcfg = DecodeConfig(max_new_tokens=12,
                            compression_ratio_threshold=2.4)

        class FlagThree:
            def __init__(self):
                self.n = 0

            def decode(self, ids):  # flag rows 0, 2, 4
                self.n += 1
                return ("ha ha ha " * 60 if self.n in (1, 3, 5)
                        else f"clean text {self.n} 9q3z")

        rng = jax.random.PRNGKey(7)
        out = wdecode.generate_with_fallback(
            params, cfg, dcfg, enc, tokenizer=FlagThree(), rng=rng)
        # reproduce the fallback's exact bucketed sampling decode:
        # idx = [0, 2, 4, 0] (pad repeats the first flagged row)
        idx = jnp.asarray([0, 2, 4, 0], jnp.int32)
        hot = wdecode.generate(params, cfg, dcfg.replace(temperature=0.7),
                               jnp.take(enc, idx, axis=0), rng=rng)
        for slot, row in ((0, 0), (1, 2), (2, 4)):
            np.testing.assert_array_equal(
                np.asarray(out["tokens"][row]),
                np.asarray(hot["tokens"][slot]),
                err_msg=f"row {row} must come from bucket slot {slot}, "
                        f"never the pad slot")
            assert int(out["lengths"][row]) == int(hot["lengths"][slot])

    def test_no_threshold_is_plain_greedy(self, hf_pair):
        _, cfg, params = hf_pair
        enc = self._enc(cfg, params)
        dcfg = DecodeConfig(max_new_tokens=12)
        greedy = wdecode.generate(params, cfg, dcfg, enc)
        out = wdecode.generate_with_fallback(params, cfg, dcfg, enc,
                                             tokenizer=self._FakeTok())
        np.testing.assert_array_equal(np.asarray(out["tokens"]),
                                      np.asarray(greedy["tokens"]))

    def test_clean_rows_skip_redecode(self, hf_pair):
        """No flagged rows -> the sampling variant is never compiled/run."""
        _, cfg, params = hf_pair
        enc = self._enc(cfg, params)
        dcfg = DecodeConfig(max_new_tokens=12,
                            compression_ratio_threshold=2.4)

        class CleanTok:
            def decode(self, ids):
                return f"all clean {sorted(set(ids))} xyzw"

        greedy = wdecode.generate(params, cfg, dcfg, enc)
        out = wdecode.generate_with_fallback(params, cfg, dcfg, enc,
                                             tokenizer=CleanTok())
        np.testing.assert_array_equal(np.asarray(out["tokens"]),
                                      np.asarray(greedy["tokens"]))

    def test_default_suppress_ids_by_vocab(self):
        from audio_transformers_tpu.core.config import WhisperConfig

        assert wdecode.default_suppress_ids(WhisperConfig.tiny()) \
            == wdecode.WHISPER_MULTILINGUAL_SUPPRESS
        assert wdecode.default_suppress_ids(WhisperConfig.test()) == ()


class TestInt8CrossKV:
    """DecodeConfig.kv_quant="int8": quantized cross-attention K/V
    (per-key / per-channel scales, int8 matmuls) must stay numerically
    close to the exact path and produce near-identical greedy decodes."""

    def test_step_hidden_close_to_exact(self, hf_pair):
        _, cfg, params = hf_pair
        mel = _mel(3, 2 * cfg.max_source_positions, cfg.n_mels, seed=11)
        enc = wm.encode(params, cfg, jnp.asarray(mel))
        exact = wm.precompute_cross_attention(params, cfg, enc)
        quant = wm.precompute_cross_attention(params, cfg, enc,
                                              quant="int8")
        tok = jnp.asarray([1, 2, 3], jnp.int32)
        sp = wm.prepare_decode_params(params, cfg)
        h_exact, _ = wm.apply_decoder_step(
            params, cfg, tok, wm.init_cache(cfg, 3, max_len=8), exact,
            step_params=sp)
        h_quant, _ = wm.apply_decoder_step(
            params, cfg, tok, wm.init_cache(cfg, 3, max_len=8), quant,
            step_params=sp)
        err = np.abs(np.asarray(h_quant) - np.asarray(h_exact))
        ref = np.abs(np.asarray(h_exact)).mean()
        assert err.mean() / ref < 0.05, (err.mean(), ref)

    def test_generate_matches_greedy_tokens(self, hf_pair):
        _, cfg, params = hf_pair
        mel = _mel(2, 2 * cfg.max_source_positions, cfg.n_mels, seed=12)
        enc = wm.encode(params, cfg, jnp.asarray(mel))
        base = DecodeConfig(max_new_tokens=10)
        out = wdecode.generate(params, cfg, base, enc,
                               prompt=(cfg.decoder_start_token_id,),
                               begin_suppress_ids=())
        out_q = wdecode.generate(params, cfg,
                                 base.replace(kv_quant="int8"), enc,
                                 prompt=(cfg.decoder_start_token_id,),
                                 begin_suppress_ids=())
        t, tq = np.asarray(out["tokens"]), np.asarray(out_q["tokens"])
        # random-weight logits are near-degenerate, so allow a small
        # divergence; with real checkpoints the argmax gap is far wider
        agree = (t == tq).mean()
        assert agree >= 0.8, (agree, t, tq)

    def test_unknown_quant_rejected(self, hf_pair):
        _, cfg, params = hf_pair
        mel = _mel(1, 2 * cfg.max_source_positions, cfg.n_mels)
        enc = wm.encode(params, cfg, jnp.asarray(mel))
        with pytest.raises(ValueError):
            wm.precompute_cross_attention(params, cfg, enc, quant="fp4")
        with pytest.raises(ValueError):
            wm.init_cache(cfg, 2, max_len=8, quant="fp4")

    def test_int4_generate_close_to_exact(self, hf_pair):
        """kv_quant="int4" (nibble-packed cross K/V, quarter traffic):
        greedy decodes stay near-identical to exact on the toy model, and
        the self cache falls back to int8 (packing an incremental write
        would ripple past bytes)."""
        _, cfg, params = hf_pair
        mel = _mel(2, 2 * cfg.max_source_positions, cfg.n_mels, seed=21)
        enc = wm.encode(params, cfg, jnp.asarray(mel))
        base = DecodeConfig(max_new_tokens=10)
        out = wdecode.generate(params, cfg, base, enc,
                               prompt=(cfg.decoder_start_token_id,),
                               begin_suppress_ids=())
        out_q = wdecode.generate(params, cfg,
                                 base.replace(kv_quant="int4"), enc,
                                 prompt=(cfg.decoder_start_token_id,),
                                 begin_suppress_ids=())
        t, tq = np.asarray(out["tokens"]), np.asarray(out_q["tokens"])
        agree = (t == tq).mean()
        assert agree >= 0.7, (agree, t, tq)

    @pytest.mark.parametrize("quant,attn_impl", [
        ("int8", "fused"),   # the production TPU pairing
        ("int4", "fused"),
        ("int4", "xla"),     # the off-TPU int4 fallback slices t_valid
    ])
    def test_pad_cross_time_preserves_step(self, hf_pair, quant,
                                           attn_impl):
        """Kernel-block time padding (pad_cross_time) must not change the
        decoder step for the consumers that accept a padded dict: the
        fused kernel masks by t_valid (the plain-XLA int8 path does NOT —
        generate only pads when it resolves to the fused kernel); the
        int4 XLA fallback slices the padding off. For int4 the packed
        minor axis pads to half the 256-rounded block."""
        _, cfg, params = hf_pair
        mel = _mel(2, 2 * cfg.max_source_positions, cfg.n_mels, seed=31)
        enc = wm.encode(params, cfg, jnp.asarray(mel))
        cross = wm.precompute_cross_attention(params, cfg, enc, quant=quant)
        padded = wm.pad_cross_time(cross)
        assert padded["t_valid"] == enc.shape[1]
        assert padded["k"][0].shape[-1] > cross["k"][0].shape[-1]
        sp = wm.prepare_decode_params(params, cfg)
        tok = jnp.asarray([3, 7], jnp.int32)
        h_plain, _ = wm.apply_decoder_step(
            params, cfg, tok, wm.init_cache(cfg, 2, max_len=8), cross,
            step_params=sp, attn_impl=attn_impl)
        h_padded, _ = wm.apply_decoder_step(
            params, cfg, tok, wm.init_cache(cfg, 2, max_len=8), padded,
            step_params=sp, attn_impl=attn_impl)
        np.testing.assert_allclose(np.asarray(h_padded),
                                   np.asarray(h_plain),
                                   rtol=2e-4, atol=2e-5)

    def test_int4_rejects_odd_encoder_length(self, hf_pair):
        _, cfg, params = hf_pair
        mel = _mel(1, 2 * cfg.max_source_positions, cfg.n_mels)
        enc = wm.encode(params, cfg, jnp.asarray(mel))[:, :49]  # odd T
        with pytest.raises(ValueError, match="even encoder length"):
            wm.precompute_cross_attention(params, cfg, enc, quant="int4")

    def test_int8_self_kv_steps_close_to_exact(self, hf_pair):
        """kv_quant also covers the incrementally-written self-attention
        cache (per-time-step scales): multi-step hidden states must stay
        numerically close to the exact path."""
        _, cfg, params = hf_pair
        mel = _mel(3, 2 * cfg.max_source_positions, cfg.n_mels, seed=13)
        enc = wm.encode(params, cfg, jnp.asarray(mel))
        cross = wm.precompute_cross_attention(params, cfg, enc)
        sp = wm.prepare_decode_params(params, cfg)
        cache_e = wm.init_cache(cfg, 3, max_len=8)
        cache_q = wm.init_cache(cfg, 3, max_len=8, quant="int8")
        toks = np.asarray([[1, 2, 3, 4, 5], [9, 8, 7, 6, 5],
                           [4, 4, 4, 4, 4]], np.int32)
        for t in range(5):
            tok = jnp.asarray(toks[:, t])
            h_e, cache_e = wm.apply_decoder_step(params, cfg, tok, cache_e,
                                                 cross, step_params=sp)
            h_q, cache_q = wm.apply_decoder_step(params, cfg, tok, cache_q,
                                                 cross, step_params=sp)
            err = np.abs(np.asarray(h_q) - np.asarray(h_e)).mean()
            ref = np.abs(np.asarray(h_e)).mean()
            assert err / ref < 0.05, (t, err, ref)
        assert cache_q["k"][0].dtype == jnp.int8
        assert int(cache_q["index"]) == 5


def test_fused_processor_chain_matches_sequential():
    """_process_logits composes suppress -> begin-suppress -> penalty ->
    ngram into one pass; it must equal the sequential reference processors
    bit-for-bit on random inputs (larger vocab than the HF parity model)."""
    from audio_transformers_tpu.core.config import (DecodeConfig,
                                                    WhisperConfig)

    rng = np.random.default_rng(7)
    b, vocab, length = 4, 2048, 24
    logits = jnp.asarray(rng.standard_normal((b, vocab)).astype(np.float32))
    tokens = jnp.asarray(rng.integers(0, vocab, (b, length)).astype(np.int32))
    cfg = WhisperConfig.test()
    dcfg = DecodeConfig(no_repeat_ngram_size=3, repetition_penalty=1.15)
    suppress = (5, 17, 1999)
    begin = (220, 3)
    for pos in (2, 5, 23):
        got = wdecode._process_logits(logits, tokens, jnp.int32(pos), cfg,
                                      dcfg, 5, suppress, begin)
        want = lp.suppress_tokens(logits, suppress)
        want = lp.suppress_tokens_at(want, begin, jnp.int32(pos), 5)
        want = lp.repetition_penalty(want, tokens, jnp.int32(pos), 1.15)
        want = lp.no_repeat_ngram(want, tokens, jnp.int32(pos), 3)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want),
                                      err_msg=f"pos={pos}")


def test_ngram_compaction_at_short_buffers(monkeypatch):
    """NGRAM_SCATTER_MAX_LEN=0 (forcing top-K compaction everywhere) is a
    documented tuning move; with fewer than K windows the top-K must
    clamp instead of tracing lax.top_k(k > axis) into a crash, and the
    result must still equal the sequential processors."""
    from audio_transformers_tpu.core.config import (DecodeConfig,
                                                    WhisperConfig)

    monkeypatch.setattr(wdecode, "NGRAM_SCATTER_MAX_LEN", 0)
    rng = np.random.default_rng(3)
    b, vocab, length = 2, 512, 12  # W = 12 - 3 + 1 = 10 < K=16
    logits = jnp.asarray(rng.standard_normal((b, vocab)).astype(np.float32))
    tokens = jnp.asarray(rng.integers(0, 8, (b, length)).astype(np.int32))
    cfg = WhisperConfig.test()
    dcfg = DecodeConfig(no_repeat_ngram_size=3)
    for pos in (3, 7, length - 1):
        got = wdecode._process_logits(logits, tokens, jnp.int32(pos),
                                      cfg, dcfg, 3, (), ())
        want = lp.no_repeat_ngram(logits, tokens, jnp.int32(pos), 3)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want),
                                      err_msg=f"pos={pos}")


def test_long_buffer_ngram_sparse_and_dense_fallback():
    """The long-buffer (>128) ngram path compacts the scatter to the top-K
    flagged windows and cond-falls back to the dense mask when any row
    flags more than K. Both branches must equal the sequential processor:
    random tokens exercise the sparse branch; a degenerate alternating row
    (half of all windows match the suffix) forces the dense branch."""
    from audio_transformers_tpu.core.config import (DecodeConfig,
                                                    WhisperConfig)

    rng = np.random.default_rng(11)
    b, vocab, length = 4, 2048, 160
    logits = jnp.asarray(rng.standard_normal((b, vocab)).astype(np.float32))
    cfg = WhisperConfig.test()
    dcfg = DecodeConfig(no_repeat_ngram_size=3, repetition_penalty=1.15)

    sparse_tokens = jnp.asarray(
        rng.integers(0, vocab, (b, length)).astype(np.int32))
    dense_tokens = np.asarray(sparse_tokens).copy()
    dense_tokens[0] = np.resize([7, 9], length)  # ~79 matching windows > K
    dense_tokens = jnp.asarray(dense_tokens)

    for tokens in (sparse_tokens, dense_tokens):
        for pos in (3, 130, length - 1):
            got = wdecode._process_logits(logits, tokens, jnp.int32(pos),
                                          cfg, dcfg, 3, (), ())
            want = lp.repetition_penalty(logits, tokens, jnp.int32(pos),
                                         1.15)
            want = lp.no_repeat_ngram(want, tokens, jnp.int32(pos), 3)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want),
                                          err_msg=f"pos={pos}")


class TestFusedGreedyLogits:
    """The fused vocab-projection+processors+argmax kernel
    (ops/decode_logits.py) must pick the same token as the XLA chain —
    both standalone and end-to-end through `generate(logits_impl=...)`.
    Runs in Pallas interpret mode on the CPU mesh; the Mosaic compile is
    covered on real TPU by bench/A-B scripts."""

    def test_kernel_matches_reference(self):
        from audio_transformers_tpu.ops.decode_logits import (
            NEG_INF, fused_greedy_step, fused_greedy_step_reference,
            pad_vocab)

        rng = np.random.default_rng(0)
        b, d, vocab = 5, 128, 3100
        v_pad = pad_vocab(vocab)
        hidden = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
        table_t = jnp.asarray(rng.standard_normal((d, v_pad)) * 0.05,
                              jnp.float32)
        add = np.zeros((1, v_pad), np.float32)
        add[0, vocab:] = NEG_INF
        add[0, [1, 2, 3050]] = NEG_INF
        add = jnp.asarray(add)
        seen = jnp.asarray(rng.integers(0, 2, (b, v_pad)), jnp.int8)
        ban = jnp.zeros((b, v_pad), jnp.int8).at[0, 7].set(1).at[3, 123].set(1)
        for kw in [dict(), dict(seen=seen, penalty=1.15),
                   dict(seen=seen, penalty=1.15, ban=ban), dict(ban=ban)]:
            got = fused_greedy_step(hidden, table_t, add, **kw)
            want = fused_greedy_step_reference(hidden, table_t, add, **kw)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want),
                                          err_msg=str(sorted(kw)))

    def test_kernel_real_vocab_geometry(self):
        """One step at the production geometry (V=51865 -> 51 vocab
        tiles, D=384): exercises the multi-tile running argmax and the
        padded-tail masking at real scale (interpret mode)."""
        from audio_transformers_tpu.ops.decode_logits import (
            NEG_INF, fused_greedy_step, fused_greedy_step_reference,
            pad_vocab)

        rng = np.random.default_rng(5)
        b, d, vocab = 4, 384, 51865
        v_pad = pad_vocab(vocab)
        hidden = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
        table_t = jnp.asarray(rng.standard_normal((d, v_pad)) * 0.05,
                              jnp.float32)
        add = np.zeros((1, v_pad), np.float32)
        add[0, vocab:] = NEG_INF
        add[0, wdecode.WHISPER_MULTILINGUAL_SUPPRESS] = NEG_INF
        add = jnp.asarray(add)
        seen = jnp.asarray(rng.integers(0, 2, (b, v_pad)), jnp.int8)
        got = fused_greedy_step(hidden, table_t, add, seen=seen,
                                penalty=1.15)
        want = fused_greedy_step_reference(hidden, table_t, add,
                                           seen=seen, penalty=1.15)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_kernel_tie_breaks_to_lowest_index(self):
        from audio_transformers_tpu.ops.decode_logits import (
            NEG_INF, fused_greedy_step, pad_vocab)

        # identical columns across two vocab tiles: argmax must take the
        # lowest index, like jnp.argmax
        d, vocab = 128, 2048
        v_pad = pad_vocab(vocab)
        hidden = jnp.ones((2, d), jnp.float32)
        col = np.zeros((d,), np.float32)
        col[0] = 1.0
        table = np.zeros((d, v_pad), np.float32)
        table[:, 40] = col       # tile 0
        table[:, 1500] = col     # tile 1 (same score)
        add = np.zeros((1, v_pad), np.float32)
        add[0, vocab:] = NEG_INF
        got = fused_greedy_step(jnp.asarray(hidden), jnp.asarray(table),
                                jnp.asarray(add))
        np.testing.assert_array_equal(np.asarray(got), [40, 40])

    @pytest.mark.parametrize("kw", [
        dict(),
        dict(repetition_penalty=1.15),
        dict(repetition_penalty=1.15, no_repeat_ngram_size=3),
        dict(no_repeat_ngram_size=2),
        dict(suppress_blank=False),
    ])
    def test_generate_token_parity(self, hf_pair, kw):
        _, cfg, params = hf_pair
        mel = jnp.asarray(_mel(3, 2 * cfg.max_source_positions, cfg.n_mels,
                               seed=23))
        enc = wm.encode_jit(params, cfg, mel, attn_impl="xla")
        outs = {}
        for impl in ("xla", "fused"):
            dcfg = DecodeConfig(max_new_tokens=20, logits_impl=impl, **kw)
            outs[impl] = wdecode.generate(params, cfg, dcfg, enc,
                                          prompt=(1, 3),
                                          suppress_ids=(7, 9, 250))
        np.testing.assert_array_equal(np.asarray(outs["xla"]["tokens"]),
                                      np.asarray(outs["fused"]["tokens"]))
        np.testing.assert_array_equal(np.asarray(outs["xla"]["lengths"]),
                                      np.asarray(outs["fused"]["lengths"]))

    def test_generate_long_buffer_parity(self):
        """A 150-token decode (> the 128 short/long ngram crossover) with a
        tiny vocab and EOS suppressed: exercises the top-K-compacted int8
        ban-mask build and its dense cond-fallback inside the fused path."""
        from audio_transformers_tpu.core.config import WhisperConfig

        cfg = WhisperConfig.test().replace(
            vocab_size=64, max_target_positions=256)
        params = wm.init(jax.random.PRNGKey(1), cfg)
        rng = np.random.default_rng(0)
        mel = jnp.asarray(rng.standard_normal(
            (2, 2 * cfg.max_source_positions, cfg.n_mels)), jnp.float32)
        enc = wm.encode_jit(params, cfg, mel, attn_impl="xla")
        outs = {}
        for impl in ("xla", "fused"):
            dcfg = DecodeConfig(max_new_tokens=148, logits_impl=impl,
                                no_repeat_ngram_size=3,
                                repetition_penalty=1.3)
            outs[impl] = wdecode.generate(params, cfg, dcfg, enc,
                                          prompt=(1, 3),
                                          suppress_ids=(cfg.eos_token_id,))
        assert int(outs["xla"]["lengths"].max()) == 150  # ran to budget
        np.testing.assert_array_equal(np.asarray(outs["xla"]["tokens"]),
                                      np.asarray(outs["fused"]["tokens"]))

    def test_resolve_gating(self):
        assert wdecode.resolve_logits_impl(
            DecodeConfig(logits_impl="fused", temperature=0.7)) == "xla"
        # timestamped GREEDY decodes run in the kernel; sampling never
        assert wdecode.resolve_logits_impl(
            DecodeConfig(logits_impl="fused", return_timestamps=True)) \
            == "fused"
        assert wdecode.resolve_logits_impl(
            DecodeConfig(logits_impl="fused", return_timestamps=True,
                         temperature=0.7)) == "xla"
        assert wdecode.resolve_logits_impl(
            DecodeConfig(logits_impl="fused")) == "fused"
        # "auto" is backend-sensitive: XLA on the CPU test mesh
        assert wdecode.resolve_logits_impl(
            DecodeConfig(logits_impl="auto")) == "xla"
        assert wdecode.resolve_logits_impl(
            DecodeConfig(logits_impl="auto", return_timestamps=True)) \
            == "xla"

    def test_kernel_matches_reference_timestamps(self):
        """Timestamp rules inside the kernel (interval bounds + online
        probability rule) vs the XLA oracle, across bound patterns:
        inert, begin-position (text banned + cap), post-pair (all ts
        banned), monotonic floor, and rows biased so force_ts fires."""
        from audio_transformers_tpu.ops.decode_logits import (
            NEG_INF, fused_greedy_step, fused_greedy_step_reference,
            pad_vocab)

        rng = np.random.default_rng(7)
        b, d, vocab, tb = 8, 128, 3100, 2800
        imax = np.iinfo(np.int32).max
        v_pad = pad_vocab(vocab)
        hidden = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
        table = rng.standard_normal((d, v_pad)) * 0.05
        # bias some rows' timestamp columns so lse_ts > max_text
        table[:, tb:vocab] += 0.08
        table_t = jnp.asarray(table, jnp.float32)
        add = np.zeros((1, v_pad), np.float32)
        add[0, vocab:] = NEG_INF
        add[0, 2799] = NEG_INF  # "no_timestamps" slot
        add = jnp.asarray(add)
        tlo = np.zeros((b,), np.int32)
        thi = np.full((b,), tb, np.int32)
        tcap = np.full((b,), imax, np.int32)
        tlo[1] = tb          # at-begin: only timestamps
        tcap[1] = tb + 50
        thi[2] = imax        # post-pair: no timestamps
        thi[3] = tb + 700    # monotonic floor
        tlo[4] = 2750        # post-single-ts: no normal text (< "eos")
        bounds = tuple(jnp.asarray(x) for x in (tlo, thi, tcap))
        seen = jnp.asarray(rng.integers(0, 2, (b, v_pad)), jnp.int8)
        for kw in [dict(), dict(seen=seen, penalty=1.15)]:
            got = fused_greedy_step(hidden, table_t, add,
                                    ts_bounds=bounds, timestamp_begin=tb,
                                    **kw)
            want = fused_greedy_step_reference(
                hidden, table_t, add, ts_bounds=bounds,
                timestamp_begin=tb, **kw)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want),
                                          err_msg=str(sorted(kw)))
            # the pattern above must actually exercise both argmax
            # regions, or this test proves nothing about force_ts
            assert np.any(np.asarray(want) >= tb)
            assert np.any(np.asarray(want) < tb)

    def test_kernel_ts_real_vocab_geometry(self):
        """Timestamp path at the production geometry (V=51865, tb=50364
        — the ts region spans the tile-49/50 boundary), interpret mode."""
        from audio_transformers_tpu.ops.decode_logits import (
            NEG_INF, fused_greedy_step, fused_greedy_step_reference,
            pad_vocab)

        rng = np.random.default_rng(11)
        b, d, vocab, tb = 4, 384, 51865, 50364
        imax = np.iinfo(np.int32).max
        v_pad = pad_vocab(vocab)
        hidden = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
        table = rng.standard_normal((d, v_pad)) * 0.05
        table[:, tb:vocab] += 0.06  # make force_ts reachable
        table_t = jnp.asarray(table, jnp.float32)
        add = np.zeros((1, v_pad), np.float32)
        add[0, vocab:] = NEG_INF
        add[0, 50363] = NEG_INF
        add = jnp.asarray(add)
        tlo = np.array([0, tb, 0, 0], np.int32)
        thi = np.array([tb, tb, imax, tb + 800], np.int32)
        tcap = np.array([imax, tb + 50, imax, imax], np.int32)
        bounds = tuple(jnp.asarray(x) for x in (tlo, thi, tcap))
        got = fused_greedy_step(hidden, table_t, add, ts_bounds=bounds,
                                timestamp_begin=tb)
        want = fused_greedy_step_reference(hidden, table_t, add,
                                           ts_bounds=bounds,
                                           timestamp_begin=tb)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_ts_reference_matches_rule_twin(self, hf_pair):
        """The kernel's semantics contract: oracle(bounds from
        timestamp_row_bounds, <|notimestamps|> folded into add) must
        pick the same token as lp.whisper_timestamp_greedy_token — the
        function the XLA decode path uses and the HF fuzz covers."""
        from audio_transformers_tpu.ops.decode_logits import (
            NEG_INF, fused_greedy_step_reference, pad_vocab)

        _, cfg, _ = hf_pair
        cfg = cfg.replace(no_timestamps_token_id=399, timestamp_begin_id=400,
                          eos_token_id=398)
        tb, begin = cfg.timestamp_begin_id, 2
        vocab = cfg.vocab_size
        v_pad = pad_vocab(vocab)
        rng = np.random.default_rng(3)
        length = 12
        toks = rng.integers(2, vocab, (4, length)).astype(np.int32)
        toks[:, 0] = cfg.decoder_start_token_id
        toks[1, 2] = 410
        toks[2, 2] = 410
        toks[2, 3] = 420
        add = np.zeros((1, v_pad), np.float32)
        add[0, vocab:] = NEG_INF
        add[0, cfg.no_timestamps_token_id] = NEG_INF
        add = jnp.asarray(add)
        # identity "projection": hidden IS the padded logits row
        eye = jnp.eye(v_pad, dtype=jnp.float32)
        for pos in range(begin, length):
            logits = (rng.standard_normal((4, vocab)) * 2).astype(np.float32)
            logits[::2, tb:] += 3.0  # force_ts on some rows
            hidden = jnp.asarray(np.pad(logits,
                                        ((0, 0), (0, v_pad - vocab))))
            buf = np.zeros((4, length), np.int32)
            buf[:, :pos] = toks[:, :pos]
            bounds = lp.timestamp_row_bounds(
                jnp.asarray(buf), jnp.asarray(pos), begin_index=begin,
                timestamp_begin=tb, eos_token_id=cfg.eos_token_id)
            got = np.asarray(fused_greedy_step_reference(
                hidden, eye, add, ts_bounds=bounds, timestamp_begin=tb))
            want = np.asarray(lp.whisper_timestamp_greedy_token(
                jnp.asarray(logits), jnp.asarray(buf), jnp.asarray(pos),
                begin_index=begin, timestamp_begin=tb,
                eos_token_id=cfg.eos_token_id,
                no_timestamps_token_id=cfg.no_timestamps_token_id,
                max_initial_timestamp_index=50))
            np.testing.assert_array_equal(got, want,
                                          err_msg=f"pos={pos}")

    def test_generate_token_parity_timestamps(self, hf_pair):
        """End-to-end: fused timestamped greedy decode token-equals the
        XLA path through `generate`, with the full processor stack on."""
        _, cfg, params = hf_pair
        cfg = cfg.replace(no_timestamps_token_id=399, timestamp_begin_id=400)
        mel = jnp.asarray(_mel(3, 2 * cfg.max_source_positions, cfg.n_mels,
                               seed=31))
        enc = wm.encode_jit(params, cfg, mel, attn_impl="xla")
        outs = {}
        for impl in ("xla", "fused"):
            dcfg = DecodeConfig(max_new_tokens=24, logits_impl=impl,
                                return_timestamps=True,
                                repetition_penalty=1.1,
                                no_repeat_ngram_size=3)
            outs[impl] = wdecode.generate(params, cfg, dcfg, enc,
                                          prompt=(cfg.decoder_start_token_id,),
                                          begin_suppress_ids=())
        np.testing.assert_array_equal(np.asarray(outs["xla"]["tokens"]),
                                      np.asarray(outs["fused"]["tokens"]))
        np.testing.assert_array_equal(np.asarray(outs["xla"]["lengths"]),
                                      np.asarray(outs["fused"]["lengths"]))
