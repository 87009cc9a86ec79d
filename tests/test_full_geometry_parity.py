"""Full-geometry HF decode parity (VERDICT r2 missing #2).

Every other parity test runs a toy config (vocab 500, d=64). This one runs
the REAL whisper-tiny geometry — vocab 51865, d_model 384, 4+4 layers,
1500 encoder positions — with the real special-token ids: timestamp_begin
50364, <|notimestamps|> 50363, the public multilingual suppress table, and
the begin-suppress pair (220, 50257). Weights are a constructor-default
(random) torch whisper-tiny imported via `from_torch_state_dict`, so the
test runs offline; determinism comes from fixed seeds.

The oracle is HF's own decode loop: `GenerationMixin.generate` (KV-cached,
greedy) with the official logits processors — exactly what the reference's
eval drives through `model.whisper.generate`
(reference: whisper_finetune/evaluate_simple.py:125-135 greedy,
evaluate.py:41-58 timestamped). transformers' WhisperGenerationMixin wraps
this same loop in audio-segmentation meta-machinery (language detection,
seek loop) that needs trained weights to be meaningful; the parity surface
is the decode itself, so the test drives GenerationMixin directly with the
explicit processor list.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from audio_transformers_tpu.core.config import DecodeConfig
from audio_transformers_tpu.models import whisper as wm
from audio_transformers_tpu.models.whisper import decode as wdecode
from audio_transformers_tpu.models.whisper.load import (config_from_hf,
                                                        from_torch_state_dict)

pytestmark = pytest.mark.slow

BATCH = 2
MAX_NEW = 24


@pytest.fixture(scope="module")
def tiny_pair():
    import torch
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration

    # Real whisper-tiny geometry + the real checkpoint's special ids
    # (constructor defaults are GPT2-style: eos 50256, dst 50257 — the
    # checkpoint uses eos/pad 50257, dst 50258; BASELINE.md model row).
    hf_cfg = HFConfig(
        vocab_size=51865, num_mel_bins=80, d_model=384,
        encoder_layers=4, decoder_layers=4,
        encoder_attention_heads=6, decoder_attention_heads=6,
        encoder_ffn_dim=1536, decoder_ffn_dim=1536,
        max_source_positions=1500, max_target_positions=448,
        pad_token_id=50257, bos_token_id=50257, eos_token_id=50257,
        decoder_start_token_id=50258,
        begin_suppress_tokens=[220, 50257],
    )
    torch.manual_seed(0)
    tm = WhisperForConditionalGeneration(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg)
    assert cfg.timestamp_begin_id == 50364  # real id, from the default cfg
    assert cfg.no_timestamps_token_id == 50363
    params, _ = from_torch_state_dict(tm.state_dict(), cfg)
    rng = np.random.default_rng(3)
    mel = rng.standard_normal((BATCH, 3000, 80)).astype(np.float32)
    return tm, cfg, params, mel


def _hf_generate(tm, mel, prompt, processors, max_new):
    import torch
    from transformers import GenerationConfig
    from transformers.generation.logits_process import LogitsProcessorList
    from transformers.generation.utils import GenerationMixin

    gc = GenerationConfig(
        max_new_tokens=max_new, do_sample=False, num_beams=1,
        pad_token_id=50257, eos_token_id=50257,
        decoder_start_token_id=50258)
    ids = torch.tensor([list(prompt)] * mel.shape[0])
    with torch.no_grad():
        out = GenerationMixin.generate(
            tm, input_features=torch.from_numpy(mel.transpose(0, 2, 1)),
            decoder_input_ids=ids, generation_config=gc,
            logits_processor=LogitsProcessorList(processors))
    return out.numpy()  # (B, prompt + generated), truncated at longest row


def _compare(ours: dict, want: np.ndarray, prompt_len: int):
    got = np.asarray(ours["tokens"])
    lengths = np.asarray(ours["lengths"])
    for b in range(want.shape[0]):
        # HF pads rows that hit EOS early with pad_token_id to the longest
        # row, exactly like our fixed buffer does — compare the overlap.
        n = min(int(lengths[b]), want.shape[1])
        assert n > prompt_len, (b, n)
        np.testing.assert_array_equal(
            got[b, :n], want[b, :n],
            err_msg=f"row {b}: ours {got[b, :n].tolist()} "
                    f"vs hf {want[b, :n].tolist()}")


def test_greedy_parity_real_geometry(tiny_pair):
    """Greedy + suppress table + begin-suppress + repetition penalty 1.15 +
    no-repeat-ngram 3 — the reference's sequence-eval decode surface
    (evaluate_simple.py:125-135) at real vocab."""
    from transformers.generation.logits_process import (
        NoRepeatNGramLogitsProcessor, RepetitionPenaltyLogitsProcessor,
        SuppressTokensAtBeginLogitsProcessor, SuppressTokensLogitsProcessor)

    tm, cfg, params, mel = tiny_pair
    dcfg = DecodeConfig(max_new_tokens=MAX_NEW, no_repeat_ngram_size=3,
                        repetition_penalty=1.15, return_timestamps=False,
                        forced_language_token=cfg.lang_en_token_id,
                        forced_task_token=cfg.transcribe_token_id)
    prompt = wdecode.build_prompt(cfg, dcfg)  # SOT, en, transcribe, no-ts
    assert prompt == (50258, 50259, 50359, 50363)
    supp = wdecode.default_suppress_ids(cfg)
    assert len(supp) > 80  # the real multilingual table is active

    procs = [
        SuppressTokensLogitsProcessor(list(supp), device="cpu"),
        SuppressTokensAtBeginLogitsProcessor([220, 50257],
                                             begin_index=len(prompt),
                                             device="cpu"),
        RepetitionPenaltyLogitsProcessor(1.15),
        NoRepeatNGramLogitsProcessor(3),
    ]
    want = _hf_generate(tm, mel, prompt, procs, MAX_NEW)

    enc = wm.encode(params, cfg, jnp.asarray(mel))
    out = wdecode.generate(params, cfg, dcfg, enc, prompt=prompt,
                           suppress_ids=supp)
    _compare(out, want, len(prompt))


def test_timestamp_parity_real_geometry(tiny_pair):
    """Timestamped decode (timestamp_begin 50364, pair rules, monotonic
    floor, initial-timestamp cap) — the reference's segment-eval decode
    surface (evaluate.py:41-58) at real vocab."""
    from transformers import GenerationConfig
    from transformers.generation.logits_process import (
        NoRepeatNGramLogitsProcessor, RepetitionPenaltyLogitsProcessor,
        SuppressTokensAtBeginLogitsProcessor, SuppressTokensLogitsProcessor,
        WhisperTimeStampLogitsProcessor)

    tm, cfg, params, mel = tiny_pair
    dcfg = DecodeConfig(max_new_tokens=MAX_NEW, no_repeat_ngram_size=3,
                        repetition_penalty=1.1, return_timestamps=True,
                        forced_language_token=cfg.lang_en_token_id,
                        forced_task_token=cfg.transcribe_token_id)
    prompt = wdecode.build_prompt(cfg, dcfg)  # SOT, en, transcribe
    assert prompt == (50258, 50259, 50359)
    supp = wdecode.default_suppress_ids(cfg)

    ts_gc = GenerationConfig(
        no_timestamps_token_id=cfg.no_timestamps_token_id,
        eos_token_id=cfg.eos_token_id,
        decoder_start_token_id=cfg.decoder_start_token_id,
        max_initial_timestamp_index=50)
    procs = [
        SuppressTokensLogitsProcessor(list(supp), device="cpu"),
        SuppressTokensAtBeginLogitsProcessor([220, 50257],
                                             begin_index=len(prompt),
                                             device="cpu"),
        RepetitionPenaltyLogitsProcessor(1.1),
        NoRepeatNGramLogitsProcessor(3),
        WhisperTimeStampLogitsProcessor(ts_gc, begin_index=len(prompt)),
    ]
    want = _hf_generate(tm, mel, prompt, procs, MAX_NEW)

    enc = wm.encode(params, cfg, jnp.asarray(mel))
    out = wdecode.generate(params, cfg, dcfg, enc, prompt=prompt,
                           suppress_ids=supp)
    _compare(out, want, len(prompt))

    # the decode really exercised the timestamp vocab
    toks = np.asarray(out["tokens"])
    assert (toks[:, len(prompt)] >= cfg.timestamp_begin_id).all()


def test_beam_parity_real_geometry(tiny_pair):
    """Beam search (num_beams=3, suppress table + begin-suppress) vs HF's
    own beam path at real vocab — exercises the 3x51865-wide candidate
    top-k, EOS retirement with the real eos id 50257, and the shared
    cross-K/V beam einsum at whisper-tiny geometry."""
    import torch
    from transformers import GenerationConfig
    from transformers.generation.logits_process import (
        LogitsProcessorList, SuppressTokensAtBeginLogitsProcessor,
        SuppressTokensLogitsProcessor)
    from transformers.generation.utils import GenerationMixin

    from audio_transformers_tpu.models.whisper import beam as wbeam

    tm, cfg, params, mel = tiny_pair
    dcfg = DecodeConfig(max_new_tokens=MAX_NEW, num_beams=3,
                        return_timestamps=False,
                        forced_language_token=cfg.lang_en_token_id,
                        forced_task_token=cfg.transcribe_token_id)
    prompt = wdecode.build_prompt(cfg, dcfg)
    supp = wdecode.default_suppress_ids(cfg)

    gc = GenerationConfig(
        max_new_tokens=MAX_NEW, do_sample=False, num_beams=3,
        length_penalty=1.0, early_stopping=False,
        pad_token_id=50257, eos_token_id=50257,
        decoder_start_token_id=50258)
    procs = LogitsProcessorList([
        SuppressTokensLogitsProcessor(list(supp), device="cpu"),
        SuppressTokensAtBeginLogitsProcessor([220, 50257],
                                             begin_index=len(prompt),
                                             device="cpu"),
    ])
    ids = torch.tensor([list(prompt)] * mel.shape[0], dtype=torch.long)
    with torch.no_grad():
        want = GenerationMixin.generate(
            tm, input_features=torch.from_numpy(mel.transpose(0, 2, 1)),
            decoder_input_ids=ids, generation_config=gc,
            logits_processor=procs).numpy()

    enc = wm.encode(params, cfg, jnp.asarray(mel))
    # both candidate-selection forms at real vocab: "merged" is HF's
    # (B, N*V) buffer, "perbeam" the TPU-default hierarchical top-k
    # (beam.resolve_beam_topk) — the bucketized per-row path only
    # triggers at real vocab width, so cover it here, not just in the
    # toy-geometry tests
    for topk in ("merged", "perbeam"):
        out = wbeam.generate_beam(params, cfg,
                                  dcfg.replace(beam_topk=topk), enc,
                                  prompt=prompt, suppress_ids=supp)
        _compare(out, want, len(prompt))
