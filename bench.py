"""Headline benchmark: whisper-tiny end-to-end inference throughput on one
TPU chip, plus MFU and train-step visibility.

Pipeline measured per batch of 30 s clips: fused mel front-end -> encoder
-> KV-cached greedy decode (64 tokens, jit'd while_loop with the full
logit-processor stack the reference uses via HF generate) -> emotion head.

Prints ONE JSON line. Required fields:
  {"metric": "whisper_tiny_rtfx_30s", "value": <x realtime per chip>,
   "unit": "x_realtime", "vs_baseline": value / 20.0}
plus measured extras: mfu (pipeline FLOPs from XLA cost analysis over the
v5e bf16 peak), pipeline_ms, rtfx_int8_kv / rtfx_int4_kv (same pipeline
with quantized cross-KV decode, DecodeConfig.kv_quant),
decode_ms_per_step_b128 (+ int8/int4 variants), train_step_ms_b16/b64 +
train_mfu, classifier step, and the host loader at 1 and 8 threads
(loader_clips_per_sec_1t/_8t).

Baseline: the reference publishes no throughput number (BASELINE.md); the
driver's north star is >= 20x realtime per chip, so vs_baseline is the
ratio against that target. NOTE: the headline decodes 64 new tokens per
clip; the reference eval protocol decodes up to 100-128 — per-token decode
cost is what transfers, reported separately.

Timing rules (axon tunnel):
- block_until_ready returns early; every timing window ends with a host
  fetch of ONE scalar from the last rep's output.
- each dispatched executable costs ~15-40 ms of tunnel RPC overhead, so
  repetitions are chained INSIDE one executable (lax.scan) and two chain
  lengths are differenced — the reported times are pure device time.
- every timing is the MIN over individually-synced reps (_min_time): the
  tunnel stalls intermittently (48 s observed on a trivial fetch), and a
  single enqueue-all window would average any stall into the result.
"""

from __future__ import annotations

import json
import time

import numpy as np

V5E_PEAK_BF16 = 197e12  # FLOP/s, one v5e chip


def _sync_scalar(x) -> float:
    return float(np.asarray(x.reshape(-1)[0], np.float32))


def _min_time(call, reps: int) -> float:
    """Min over `reps` individually-synced timings. The tunnel stalls
    intermittently (a trivial fetch was observed to take 48 s during
    congestion); a single enqueue-all window averages any stall into the
    result, while the min survives as long as ANY rep lands in a calm
    window. The per-rep fetch latency this adds cancels in the two-chain
    differencing every caller applies."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync_scalar(call())
        best = min(best, time.perf_counter() - t0)
    return best


def _wait_for_backend(budget_s: float = 900.0) -> bool:
    """The axon tunnel goes down for stretches (backend init raises
    UNAVAILABLE, or jax.devices() hangs outright); retry for a while so a
    transient outage at bench time doesn't lose the round's artifact.
    Probes in a SUBPROCESS: jax caches a failed backend init for the
    process lifetime, so the first in-process attempt must not happen
    until a probe has succeeded. Returns False when the budget runs out
    without one live probe — the caller must then pin CPU rather than
    attempt the real init, which can hang the process forever.

    The probe demands a NON-CPU device: when the tunnel plugin fails to
    initialize, jax silently falls back to CPU with exit code 0, which
    would otherwise count as a live probe and drop the degraded-run
    marker from the artifact."""
    import subprocess
    import sys
    probe = ("import jax, sys; sys.exit(0 if any("
             "d.platform != 'cpu' for d in jax.devices()) else 3)")
    deadline = time.time() + budget_s
    while True:
        try:
            ok = subprocess.run(
                [sys.executable, "-c", probe],
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                timeout=180,
            ).returncode == 0
        except subprocess.TimeoutExpired:  # init can hang, not just raise
            ok = False
        if ok:
            return True
        if time.time() >= deadline:
            return False
        print(f"# backend unavailable, retrying "
              f"({int(deadline - time.time())}s left)", flush=True)
        time.sleep(30)


def main():
    import os

    import jax
    import jax.numpy as jnp

    # A CPU-only environment (JAX_PLATFORMS unset or "cpu") is a
    # legitimate dev run, not an outage — don't probe, don't mark
    # degraded; on_tpu=False already scales the shapes down.
    expect_accel = os.environ.get(
        "JAX_PLATFORMS", "").strip().lower() not in ("", "cpu")
    backend_probed = not expect_accel or _wait_for_backend(
        float(os.environ.get("ATX_BENCH_BACKEND_BUDGET_S", "900")))
    if not backend_probed:
        # Every probe failed: the in-process init would hang or raise the
        # same way, losing the round's artifact entirely. Pin CPU (the
        # tunnel plugin re-registers itself when JAX_PLATFORMS merely says
        # "cpu", so drop the var and pin via jax.config — same recipe as
        # tests/conftest.py) and emit an honest degraded line instead.
        os.environ.pop("JAX_PLATFORMS", None)
        jax.config.update("jax_platforms", "cpu")

    from audio_transformers_tpu.core.profiling import (
        enable_compilation_cache)

    # ~13 jitted programs; the tunnel's remote compiler can take minutes
    # when congested — the persistent disk cache makes warm re-runs
    # compile-free.
    enable_compilation_cache()

    from audio_transformers_tpu.core.config import (DecodeConfig,
                                                    EmotionWhisperConfig,
                                                    MelConfig,
                                                    OptimizerConfig,
                                                    TrainConfig)
    from audio_transformers_tpu.models import whisper as wm
    from audio_transformers_tpu.models.whisper import decode as wdecode
    from audio_transformers_tpu.models.whisper import emotion as emo
    from audio_transformers_tpu.ops.mel import log_mel
    from audio_transformers_tpu.train.optim import build_optimizer
    from audio_transformers_tpu.train.whisper_emotion import make_steps

    on_tpu = jax.default_backend() == "tpu"
    cfg = EmotionWhisperConfig()
    w = cfg.whisper
    mel_cfg = MelConfig.whisper()

    batch = 128 if on_tpu else 2
    clip_secs = 30.0
    lo, hi, reps = (1, 5, 4) if on_tpu else (1, 2, 1)
    rng = np.random.default_rng(0)
    waveform = jnp.asarray(
        (rng.standard_normal((batch, int(mel_cfg.sample_rate * clip_secs)))
         * 0.1).astype(np.float32))

    params = emo.init(jax.random.PRNGKey(0), cfg)
    compute = jnp.bfloat16 if on_tpu else jnp.float32

    from audio_transformers_tpu.ops.mel import precision_for

    def pipeline(params, waveform, dcfg, prompt):
        mel = log_mel(waveform, mel_cfg,
                      precision=precision_for(compute)).astype(compute)
        enc = wm.encode(params["whisper"], w, mel, attn_impl="auto")
        out = wdecode.generate(params["whisper"], w, dcfg, enc,
                               prompt=prompt)
        emotion = emo.sequence_emotion_from_hiddens(params, out["hiddens"])
        return out["tokens"], out["lengths"], emotion

    def chained_pipeline_s(kv_quant: str) -> float:
        """Steady-state seconds per pipeline invocation (scan-chained,
        differenced between two chain lengths)."""
        dcfg = DecodeConfig(max_new_tokens=64, no_repeat_ngram_size=3,
                            repetition_penalty=1.15, kv_quant=kv_quant)
        prompt = wdecode.build_prompt(w, dcfg)
        ts = {}
        for n in (lo, hi):
            @jax.jit
            def fn(params, waveform, n=n):
                def body(c, _):
                    # the carry perturbation keeps each iteration live
                    # (not CSE'd/hoisted); numerically it is a no-op
                    _, lengths, _ = pipeline(params, waveform + c * 1e-30,
                                             dcfg, prompt)
                    return jnp.sum(lengths).astype(jnp.float32) * 1e-30, \
                        None
                c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
                return c.reshape(1)
            _sync_scalar(fn(params, waveform))  # compile + warm
            ts[n] = _min_time(lambda fn=fn: fn(params, waveform), reps)
        return (ts[hi] - ts[lo]) / (hi - lo)

    audio_secs = batch * clip_secs
    dt = chained_pipeline_s("none")
    rtfx = audio_secs / dt
    result = {
        "metric": "whisper_tiny_rtfx_30s",
        "value": round(rtfx, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtfx / 20.0, 3),
        "pipeline_ms": round(dt * 1e3, 2),
        "batch": batch,
        "backend": jax.default_backend(),
    }
    # Contention markers (VERDICT r4 #3): host fields (loader numbers are
    # host-load-sensitive on this 1-core box — a contended run measured
    # 914 clips/s where the quiet host measures ~1,800) and a trivial-jit
    # tunnel round-trip (decode fields inflate when the tunnel is
    # congested; a quiet tunnel probes ~25-40 ms). Read them before
    # trusting a regression: host_load ~> 1.5 or tunnel_probe_ms >> 50
    # means the RUN was degraded, not the code.
    try:
        result["host_load"] = round(os.getloadavg()[0], 2)
    except OSError:
        pass
    try:
        probe = jax.jit(lambda x: x + 1.0)
        _sync_scalar(probe(jnp.ones((1,), jnp.float32)))  # compile
        result["tunnel_probe_ms"] = round(_min_time(
            lambda: probe(jnp.ones((1,), jnp.float32)), 3) * 1e3, 1)
    except Exception:
        pass
    if not backend_probed:
        result["errors"] = [
            "tpu backend unavailable after retry budget; "
            "degraded cpu-fallback run (numbers are NOT tpu numbers)"]
    def extra(key, fn):
        """Record a non-headline metric; a failure (e.g. a congested
        compile timing out upstream, or a kernel variant failing on a
        new libtpu) must not take the headline JSON line down with it."""
        try:
            result[key] = fn()
        except Exception as e:  # pragma: no cover - depends on env
            result.setdefault("errors", []).append(
                f"{key}: {type(e).__name__}")

    if on_tpu:
        extra("rtfx_int8_kv",
              lambda: round(audio_secs / chained_pipeline_s("int8"), 2))
        extra("rtfx_int4_kv",
              lambda: round(audio_secs / chained_pipeline_s("int4"), 2))

    # FLOP count for MFU from XLA's own cost model (counts the decode loop
    # body once per trip via the while-loop trip-count bound).
    dcfg = DecodeConfig(max_new_tokens=64, no_repeat_ngram_size=3,
                        repetition_penalty=1.15)
    prompt = wdecode.build_prompt(w, dcfg)
    single = jax.jit(lambda p, wv: pipeline(p, wv, dcfg, prompt))
    try:
        cost = single.lower(params, waveform).compile().cost_analysis()
        if cost:
            cost = cost[0] if isinstance(cost, (list, tuple)) else cost
            flops_per_batch = float(cost.get("flops", 0.0)) or None
            if flops_per_batch and on_tpu:
                result["mfu"] = round(flops_per_batch / dt / V5E_PEAK_BF16,
                                      4)
                # same useful math, int8 cross/self-KV time base — the
                # serving configuration's utilization
                if "rtfx_int8_kv" in result:
                    dt_q8 = audio_secs / result["rtfx_int8_kv"]
                    result["mfu_int8"] = round(
                        flops_per_batch / dt_q8 / V5E_PEAK_BF16, 4)
    except Exception:
        pass

    # --- decode per-step cost (differencing two token budgets) ----------
    def decode_ms_per_step(kv_quant: str) -> float:
        mel = log_mel(waveform, mel_cfg).astype(compute)
        enc = wm.encode_jit(params["whisper"], w, mel, attn_impl="auto")

        def timed(n_tokens: int) -> float:
            d2 = dcfg.replace(max_new_tokens=n_tokens, kv_quant=kv_quant)
            o = wdecode.generate(params["whisper"], w, d2, enc,
                                 prompt=prompt)
            _sync_scalar(o["lengths"])
            return _min_time(
                lambda: wdecode.generate(params["whisper"], w, d2, enc,
                                         prompt=prompt)["lengths"],
                4 if on_tpu else 1)

        return (timed(64) - timed(16)) / 48 * 1e3

    extra("decode_ms_per_step_b128",
          lambda: round(decode_ms_per_step("none"), 3))
    if on_tpu:
        extra("decode_ms_per_step_b128_int8kv",
              lambda: round(decode_ms_per_step("int8"), 3))
        extra("decode_ms_per_step_b128_int4kv",
              lambda: round(decode_ms_per_step("int4"), 3))

    # --- eval-serving decode config: the segment evaluator's defaults
    # (infer/evaluate.py evaluate_segment_level — timestamps on, rep
    # penalty 1.1, ngram 3, 256 new tokens; mirrors the reference's
    # actual evaluation decode, whisper_finetune/evaluate.py:41-58) with
    # int8 KV. Guards the r3 long-budget processor wins (incremental
    # seen mask, compacted ngram scatter, raw-logit ts rule) against
    # regression. Differenced over the 64->256 token range so the
    # reported cost is the long-L steady state.
    def decode_ms_per_step_ts256() -> float:
        mel = log_mel(waveform, mel_cfg).astype(compute)
        enc = wm.encode_jit(params["whisper"], w, mel, attn_impl="auto")

        def timed(n_tokens: int) -> float:
            d2 = DecodeConfig(max_new_tokens=n_tokens,
                              return_timestamps=True,
                              no_repeat_ngram_size=3,
                              repetition_penalty=1.1, kv_quant="int8")
            p2 = wdecode.build_prompt(w, d2)
            o = wdecode.generate(params["whisper"], w, d2, enc, prompt=p2)
            _sync_scalar(o["lengths"])
            return _min_time(
                lambda: wdecode.generate(params["whisper"], w, d2, enc,
                                         prompt=p2)["lengths"],
                4 if on_tpu else 1)

        return (timed(256) - timed(64)) / 192 * 1e3

    if on_tpu:
        extra("decode_ms_per_step_b128_int8_ts256",
              lambda: round(decode_ms_per_step_ts256(), 3))

    # --- beam-search decode cost (num_beams=4, the production serving
    # alternative to greedy; same processor stack as the greedy decode
    # number). beam4 and greedy run ROUND-ROBIN IN THIS ONE PROCESS and
    # the ratio is computed from those interleaved mins, so tunnel
    # congestion can never fake (or hide) a multiple — VERDICT r4 #2.
    # PARITY.md's beam cost claim is backed by beam4_over_greedy.
    def beam_greedy_fields() -> dict:
        from audio_transformers_tpu.models.whisper import beam as wbeam
        mel = log_mel(waveform, mel_cfg).astype(compute)
        enc = wm.encode_jit(params["whisper"], w, mel, attn_impl="auto")

        def call(kind: str, n_tokens: int):
            d2 = dcfg.replace(max_new_tokens=n_tokens,
                              num_beams=4 if kind == "beam" else 1)
            fn = (wbeam.generate_beam if kind == "beam"
                  else wdecode.generate)
            return fn(params["whisper"], w, d2, enc,
                      prompt=prompt)["lengths"]

        kinds = ("beam", "greedy")
        for kind in kinds:            # compile + warm
            for n in (64, 16):
                _sync_scalar(call(kind, n))
        best = {}
        for _ in range(4 if on_tpu else 1):
            for kind in kinds:
                for n in (64, 16):
                    best[(kind, n)] = min(
                        best.get((kind, n), float("inf")),
                        _min_time(lambda: call(kind, n), 1))
        ms = {kind: (best[(kind, 64)] - best[(kind, 16)]) / 48 * 1e3
              for kind in kinds}
        return {
            "decode_ms_per_step_b128_beam4": round(ms["beam"], 3),
            "decode_ms_per_step_b128_greedy_rr": round(ms["greedy"], 3),
            "beam4_over_greedy": round(ms["beam"] / ms["greedy"], 2),
        }

    if on_tpu:
        try:
            result.update(beam_greedy_fields())
        except Exception as e:  # pragma: no cover - env-dependent
            result.setdefault("errors", []).append(
                f"beam_greedy: {type(e).__name__}")

    # beam-4 at the SERVING config (int8 KV, like the headline decode
    # field — the bf16 field above exists for the clean ratio against
    # bf16 greedy)
    def decode_ms_per_step_beam4_int8() -> float:
        from audio_transformers_tpu.models.whisper import beam as wbeam
        mel = log_mel(waveform, mel_cfg).astype(compute)
        enc = wm.encode_jit(params["whisper"], w, mel, attn_impl="auto")

        def timed(n_tokens: int) -> float:
            d2 = dcfg.replace(max_new_tokens=n_tokens, num_beams=4,
                              kv_quant="int8")
            o = wbeam.generate_beam(params["whisper"], w, d2, enc,
                                    prompt=prompt)
            _sync_scalar(o["lengths"])
            return _min_time(
                lambda: wbeam.generate_beam(params["whisper"], w, d2, enc,
                                            prompt=prompt)["lengths"],
                4 if on_tpu else 1)

        return (timed(64) - timed(16)) / 48 * 1e3

    if on_tpu:
        extra("decode_ms_per_step_b128_beam4_int8",
              lambda: round(decode_ms_per_step_beam4_int8(), 3))

    # --- interactive serving latency (batch 1, the reference demo's
    # shape): full pipeline for ONE 30 s clip, chained+differenced like
    # the throughput number so the reported time is pure device time ----
    def serve_latency_b1_ms() -> float:
        wf1 = waveform[:1]
        dcfg1 = DecodeConfig(max_new_tokens=64, no_repeat_ngram_size=3,
                             repetition_penalty=1.15, kv_quant="int8")
        prompt1 = wdecode.build_prompt(w, dcfg1)
        ts1 = {}
        for n in (lo, hi):
            @jax.jit
            def fn1(params, wv, n=n):
                def body(c, _):
                    _, lengths, _ = pipeline(params, wv + c * 1e-30,
                                             dcfg1, prompt1)
                    return jnp.sum(lengths).astype(jnp.float32) * 1e-30, \
                        None
                c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
                return c.reshape(1)
            _sync_scalar(fn1(params, wf1))
            ts1[n] = _min_time(lambda fn1=fn1: fn1(params, wf1), reps)
        return round((ts1[hi] - ts1[lo]) / (hi - lo) * 1e3, 2)

    if on_tpu:
        extra("serve_latency_b1_ms", serve_latency_b1_ms)

    # --- train step (dual-loss fine-tune, flash attention) --------------
    # b16 is the reference protocol scale; b64 answers "is training
    # actually fast at a production batch" (VERDICT r2 weak #5), with
    # train_mfu from the same XLA cost-analysis route as inference MFU.
    tcfg = TrainConfig(batch_size=16, compute_dtype=str(np.dtype(compute)),
                       optimizer=OptimizerConfig(name="adamw",
                                                 learning_rate=1e-4,
                                                 schedule="constant"))
    tx = build_optimizer(tcfg.optimizer)
    train_step, _ = make_steps(cfg, mel_cfg, tcfg, tx)

    def make_tbatch(tb: int) -> dict:
        labels = np.full((tb, 48), w.pad_token_id, np.int32)
        labels[:, 0] = w.decoder_start_token_id
        labels[:, 1:40] = rng.integers(100, 5000, (tb, 39))
        labels[:, 40] = w.eos_token_id
        wv = np.tile(np.asarray(waveform),
                     (tb // batch + 1, 1))[:tb] if tb > batch \
            else np.asarray(waveform[:tb])
        return {
            "waveform": jnp.asarray(wv),
            "labels": jnp.asarray(labels),
            "emotion_labels": jnp.asarray(
                rng.integers(0, cfg.num_emotion_classes, tb)
                .astype(np.int32)),
            "valid": jnp.ones((tb,), bool),
        }

    def chained_train_s(tbatch: dict) -> float:
        ts = {}
        for n in (lo, hi):
            @jax.jit
            def fn(params, batch, n=n):
                opt_state = tx.init(params)
                def body(carry, _):
                    p, s = carry
                    p, s, m = train_step(p, s, dict(batch))
                    return (p, s), m["loss"]
                (_, _), losses = jax.lax.scan(body, (params, opt_state),
                                              None, length=n)
                return losses[-1].reshape(1)
            _sync_scalar(fn(params, tbatch))
            ts[n] = _min_time(lambda fn=fn: fn(params, tbatch), reps)
        return (ts[hi] - ts[lo]) / (hi - lo)

    tb16 = 16 if on_tpu else 2
    tdt = chained_train_s(make_tbatch(tb16))
    result["train_step_ms_b16"] = round(tdt * 1e3, 2)
    result["train_clips_per_sec"] = round(tb16 / tdt, 1)

    if on_tpu:
        tb64 = 64
        tbatch64 = make_tbatch(tb64)
        tdt64 = chained_train_s(tbatch64)
        result["train_step_ms_b64"] = round(tdt64 * 1e3, 2)
        result["train_clips_per_sec_b64"] = round(tb64 / tdt64, 1)
        try:
            opt_state = jax.jit(tx.init)(params)
            cost = train_step.lower(params, opt_state, tbatch64) \
                .compile().cost_analysis()
            if cost:
                cost = cost[0] if isinstance(cost, (list, tuple)) else cost
                flops = float(cost.get("flops", 0.0)) or None
                if flops:
                    result["train_mfu"] = round(
                        flops / tdt64 / V5E_PEAK_BF16, 4)
        except Exception:
            pass

    # --- UrbanSound classifier train step (batch 64, 4 s @ 22.05 kHz) ----
    from audio_transformers_tpu.core.config import UrbanSoundConfig
    from audio_transformers_tpu.train.classifier import (
        make_steps as make_cls_steps)

    ucfg = UrbanSoundConfig()
    umel = MelConfig.urbansound()
    ub = 64 if on_tpu else 4
    utcfg = TrainConfig(batch_size=ub, compute_dtype=str(np.dtype(compute)),
                        optimizer=OptimizerConfig(name="adam",
                                                  learning_rate=1e-3,
                                                  schedule="constant"))
    utx = build_optimizer(utcfg.optimizer)
    cls_step, _ = make_cls_steps(ucfg, umel, utcfg, utx)
    from audio_transformers_tpu.models import urbansound
    uparams, ustate = urbansound.init(jax.random.PRNGKey(0), ucfg)
    ubatch = {
        "waveform": jnp.asarray(
            (rng.standard_normal((ub, int(umel.sample_rate * 4.0)))
             * 0.1).astype(np.float32)),
        "label": jnp.asarray(
            rng.integers(0, ucfg.num_classes, ub).astype(np.int32)),
        "valid": jnp.ones((ub,), bool),
    }

    def chained_cls_s() -> float:
        ts = {}
        for n in (lo, hi):
            @jax.jit
            def fn(params, state, batch, n=n):
                opt_state = utx.init(params)
                def body(carry, _):
                    p, s, o = carry
                    p, s, o, m = cls_step(p, s, o, dict(batch),
                                          jax.random.PRNGKey(0))
                    return (p, s, o), m["loss"]
                (_, _, _), losses = jax.lax.scan(
                    body, (params, state, opt_state), None, length=n)
                return losses[-1].reshape(1)
            _sync_scalar(fn(uparams, ustate, ubatch))
            ts[n] = _min_time(lambda fn=fn: fn(uparams, ustate, ubatch),
                              reps)
        return (ts[hi] - ts[lo]) / (hi - lo)

    cdt = chained_cls_s()
    result["classifier_step_ms_b64"] = round(cdt * 1e3, 2)
    result["classifier_clips_per_sec"] = round(ub / cdt, 1)

    # --- host input pipeline: C++ loader clips/s (decode+resample+pad) ---
    # The device consumes train_clips_per_sec; the host must at least match
    # it or training is input-bound (SURVEY §7 hard-part #6).
    try:
        import tempfile

        from audio_transformers_tpu.data import native_loader as nl
        from audio_transformers_tpu.utils.audio import synth_clip, write_wav

        if nl.available():
            with tempfile.TemporaryDirectory() as td:
                import os as _os
                paths = []
                for i in range(64):
                    p = _os.path.join(td, f"clip{i}.wav")
                    write_wav(p, synth_clip(4.0, 22050, seed=i), 22050)
                    paths.append(p)
                list(nl.iter_clips(paths, target_rate=16000,
                                   target_len=16000 * 4))  # warm
                for nt, key in ((1, "loader_clips_per_sec_1t"),
                                (8, "loader_clips_per_sec_8t")):
                    best = 0.0
                    for _ in range(2):
                        t0 = time.perf_counter()
                        n_ok = sum(1 for _, _, ok in nl.iter_clips(
                            paths * 4, target_rate=16000,
                            target_len=16000 * 4, num_threads=nt) if ok)
                        dt_l = time.perf_counter() - t0
                        best = max(best, n_ok / dt_l)
                    result[key] = round(best, 1)
                result["loader_host_cores"] = _os.cpu_count()
    except Exception:
        pass

    print(json.dumps(result))


if __name__ == "__main__":
    main()
