"""Benchmark: streaming TTS throughput + latency on one TPU chip.

Prints ONE JSON line:
  {"metric": "audio_seconds_per_second_per_chip", "value": N, "unit": "audio-s/s",
   "vs_baseline": N, ...extras}

Methodology: whole-generation wall time over the PRODUCTION block schedule —
progressive KV-capacity growth (256 -> 384 -> 512 slot buckets as the cache
fills), FIRST_BLOCK single-frame dispatches, then 8-frame lax.scan blocks of
the fused step (FlowLM decode + EOS + LSD flow + full Mimi codec decode),
starting from a realistic post-prompt watermark (192 slots of voice + text)
and generating 320 frames (25.6 s of audio). Each configuration reports the
median of 3 full runs with a device fetch as the completion barrier; a 320-
frame run amortizes dispatch/fetch latency and medians reject tunnel hiccups.
(Round 2 measured a fixed 768-slot cache read every step — a schedule real
generations never execute; this drives exactly what the drivers do.)

Primary value = bf16 weights, batch 1 (single-utterance streaming, BASELINE
config #1). Extras: f32 (the waveform-parity dtype), int8 weight-only at
b1/b32/b64/b128 and bf16 b32/b128 (configs #2/#5 large-batch serving),
italian_24l b1 bf16 + int8 (config #4 model), long-text sustained RTF with EOS
disabled plus the per-sentence-chunk fixed overhead (config #4 mechanism,
measured separately — see measure_long_text_split), and first-chunk latency
(text prompt + first frame). vs_baseline is against the reference's published
6.33x real-time (M4 CPU, docs/quantization.md:53-57).

Weights are random — throughput and latency are weight-value independent.
"""

from __future__ import annotations

import contextlib
import json
import logging
import time

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def _quiet_no_eos():
    """Sections that run with eos_threshold=+inf intentionally never emit EOS;
    silence the expected per-chunk warnings so the bench tail stays clean."""
    lg = logging.getLogger("pocket_tts_tpu.pipeline.tts")
    old = lg.level
    lg.setLevel(logging.ERROR)
    try:
        yield
    finally:
        lg.setLevel(old)

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REFERENCE_RTS = 6.33  # reference real-time factor (M4, f32)
FRAME_SECONDS = 0.08
START_SLOTS = 192  # post-prompt watermark: ~13 s voice state + text bucket
GEN_FRAMES = 320  # 25.6 s of audio per run


def build_model(dtype, quantize: bool, config_name: str = "english.yaml"):
    from pocket_tts_tpu.config import CONFIGS_DIR, load_config
    from pocket_tts_tpu.models.flow_lm import build_flow_lm_specs, init_flow_lm_params
    from pocket_tts_tpu.models.mimi import build_mimi_specs, init_mimi_params
    from pocket_tts_tpu.pipeline.tts import GenerationParams, TTSModel
    from pocket_tts_tpu.quant import quantize_flow_lm_int8

    cfg = load_config(CONFIGS_DIR / config_name)
    specs = build_flow_lm_specs(cfg)
    mimi_specs = build_mimi_specs(cfg.mimi)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))

    def cast(t):
        return jax.tree.map(
            lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, t
        )

    params = cast(init_flow_lm_params(specs, k1))
    mimi_params = cast(init_mimi_params(mimi_specs, k2))
    if quantize:
        params = quantize_flow_lm_int8(params)
    model = TTSModel(specs, mimi_specs, params, mimi_params, tokenizer=None,
                     config=cfg, gen_params=GenerationParams())
    return model, dtype


def post_prompt_state(model, batch: int, start_slots: int, dtype):
    """A state as the drivers see it after voice + text prompts: start_slots
    valid slots at positions 0..start_slots-1, capacity = their bucket."""
    from pocket_tts_tpu.models.flow_lm import init_flow_lm_state
    from pocket_tts_tpu.pipeline.tts import CAPACITY_BUCKETS, _bucket

    cap0 = _bucket(start_slots, CAPACITY_BUCKETS)
    lm = init_flow_lm_state(model.specs, batch, cap0, dtype)
    pos = jnp.where(
        jnp.arange(cap0)[None, :] < start_slots,
        jnp.arange(cap0, dtype=jnp.int32)[None, :],
        -1,
    )
    lm.pos = jnp.broadcast_to(pos, (batch, cap0))
    lm.offset = jnp.full((batch,), start_slots, jnp.int32)
    lm.write_pos = jnp.asarray(start_slots, jnp.int32)
    return lm


def measure_throughput(model, dtype, batch: int, start_slots: int = START_SLOTS,
                       gen_frames: int = GEN_FRAMES, trials: int | None = None):
    """Median wall time of the production block schedule (see module docstring).

    Small batches get more trials: their runs are short (~0.2 s), so tunnel
    latency jitter dominates the median at 3 trials (observed b1 spread
    122-151 audio-s/s across bench invocations)."""
    if trials is None:
        trials = 7 if batch <= 4 else 3
    from pocket_tts_tpu.models.mimi import init_decoder_state
    from pocket_tts_tpu.pipeline.tts import _block_size

    ldim = model.specs.ldim

    def run_once():
        lm = post_prompt_state(model, batch, start_slots, dtype)
        mimi = init_decoder_state(model.mimi_specs, batch, dtype)
        prev = jnp.zeros((batch, ldim), jnp.float32)
        is_bos = jnp.ones((batch,), bool)
        frames = 0
        t0 = time.monotonic()
        while frames < gen_frames:
            K = _block_size(frames)
            lm = model._ensure_capacity(lm, start_slots + frames + K)
            if K == 1:
                noise = jnp.zeros((batch, ldim), jnp.float32)
                _, eos, _, lm, mimi = model._fused_step_fn()(
                    model.params, model.mimi_params, lm, mimi, prev, is_bos, noise)
            else:
                noise = jnp.zeros((K, batch, ldim), jnp.float32)
                _, eos, _, lm, mimi = model._multi_step_fn(K)(
                    model.params, model.mimi_params, lm, mimi, prev, is_bos, noise)
            is_bos = jnp.zeros((batch,), bool)
            frames += K
        np.asarray(eos)  # completion barrier (block_until_ready lies on axon)
        return time.monotonic() - t0

    run_once()  # compile every capacity bucket
    ts = sorted(run_once() for _ in range(trials))
    wall = ts[len(ts) // 2]
    frame_ms = wall / gen_frames * 1000
    return {
        "frame_ms": frame_ms,
        "audio_s_per_s": batch * gen_frames * FRAME_SECONDS / wall,
    }


class _StubTokenizer:
    """Word/punctuation tokenizer with an encode/decode round trip, so the
    real sentence splitter exercises its boundary-run logic without a
    sentencepiece model (timing is token-value independent)."""

    def __init__(self):
        import re

        self._split = re.compile(r"[^\s.!?,;:…]+|[.!?,;:…]").findall
        self._vocab: dict[str, int] = {}
        self._pieces: dict[int, str] = {}

    def _id(self, piece: str) -> int:
        if piece not in self._vocab:
            i = len(self._vocab) + 3
            self._vocab[piece] = i
            self._pieces[i] = piece
        return self._vocab[piece]

    def encode(self, text: str) -> list[int]:
        return [1] + [self._id(p) for p in self._split(text)]  # 1 = dummy prefix

    def decode(self, ids: list[int]) -> str:
        return " ".join(self._pieces.get(i, "") for i in ids if i != 1)


def _long_text_run(model, dtype, sentences: int):
    """One long-text pass through the real driver (sentence splitter, state
    carry, capacity re-bucketing). Returns (wall_s, audio_s, max_gap_ms,
    n_chunks)."""
    text = " ".join(
        "The quick brown fox jumps over the lazy dog near the riverbank today."
        for _ in range(sentences)
    )
    st = post_prompt_state(model, 1, 128, dtype)
    gaps, samples, chunks = [], 0, 0
    t0 = last = time.monotonic()
    for chunk in model.generate_audio_stream(st, text, copy_state=False, seed=0):
        now = time.monotonic()
        gaps.append(now - last)
        last = now
        samples += chunk.shape[-1]
        chunks += 1
    wall = time.monotonic() - t0
    return wall, samples / model.sample_rate, max(gaps) * 1000, chunks


def measure_long_text_split(model, dtype):
    """BASELINE config #4 mechanism, split into two honest metrics (round-3
    verdict: with random weights EOS latches at step 0, so a single 'RTF'
    number measured only per-chunk overhead):

    * long_text_rtf — sustained real-time factor with EOS DISABLED
      (eos_threshold=+inf), so every chunk runs the production generation
      schedule like real weights would;
    * per_chunk_overhead_ms — default threshold (EOS at step ~0 under random
      weights): each chunk does ~0 useful decode, so wall/chunk IS the fixed
      per-sentence-chunk cost (prompt dispatch, state handoff, fetches).
    """
    import dataclasses

    model.tokenizer = _StubTokenizer()
    orig_gen = model.gen

    # Warm-up must replay the EXACT measured run (same sentence count): with
    # copy_state=False the state grows across chunks, so chunk N hits prompt/
    # capacity buckets chunk 1 never sees — a shorter warm-up leaves compiles
    # inside the measured section (observed: 17 s "gaps").
    # sustained: EOS disabled, every chunk runs to its max_gen_len. The warm
    # run is fetch-round-trip bound (see STATUS.md) and the tunnel's RTT
    # jitters 2x run-to-run, so take the median of 3 measured runs.
    model.gen = dataclasses.replace(orig_gen, eos_threshold=float("inf"))
    with _quiet_no_eos():
        _long_text_run(model, dtype, sentences=8)  # compile all buckets
        runs = sorted(_long_text_run(model, dtype, sentences=8)
                      for _ in range(3))
    wall, audio_s, max_gap_ms, _ = runs[1]
    rtf = audio_s / wall

    # overhead: default threshold, chunks collapse to the fixed cost
    model.gen = orig_gen
    _long_text_run(model, dtype, sentences=24)  # compile all buckets
    o_runs = sorted(_long_text_run(model, dtype, sentences=24) for _ in range(3))
    o_wall, _, _, o_chunks = o_runs[1]
    model.tokenizer = None
    return {
        "rtf": rtf,
        "max_gap_ms": max_gap_ms,
        "per_chunk_overhead_ms": o_wall * 1000 / o_chunks,
    }


def measure_driver_b1(model, dtype):
    """Warm driver-level b1: one short utterance through the PUBLIC
    generate_audio_stream (fetch pipe, emission machinery, device-side noise),
    post-compile — so the public API's number is tracked alongside the raw
    schedule headline (round-4 verdict item 7). eos_threshold=+inf makes the
    random-weight run execute the full schedule like real weights would."""
    import dataclasses

    model.tokenizer = _StubTokenizer()
    orig = model.gen
    model.gen = dataclasses.replace(orig, eos_threshold=float("inf"))
    text = "The quick brown fox jumps over the lazy dog near the riverbank."

    def once():
        st = post_prompt_state(model, 1, 128, dtype)
        t0 = time.monotonic()
        samples = 0
        for ch in model.generate_audio_stream(st, text, copy_state=False,
                                              seed=0):
            samples += ch.shape[-1]
        return samples / model.sample_rate / (time.monotonic() - t0)

    try:
        with _quiet_no_eos():
            once()  # compile
            vals = sorted(once() for _ in range(5))
    finally:
        model.gen = orig
        model.tokenizer = None
    return vals[len(vals) // 2]


def measure_first_chunk_latency(model, dtype, n_tokens: int = 16):
    """Text prompt (bucketed) + first fused frame + host fetch, post-warmup.
    Prompt capacity matches the drivers' progressive-growth start bucket."""
    from pocket_tts_tpu.models.flow_lm import init_flow_lm_state
    from pocket_tts_tpu.models.mimi import init_decoder_state
    from pocket_tts_tpu.pipeline.tts import CAPACITY_BUCKETS, PROMPT_BUCKETS, _bucket

    prompt = model._text_prompt_fn()
    step = model._fused_step_fn()
    ldim = model.specs.ldim
    tokens = jnp.zeros((1, _bucket(n_tokens, PROMPT_BUCKETS)), jnp.int32)
    true_len = jnp.full((1,), n_tokens, jnp.int32)
    capacity = _bucket(tokens.shape[1], CAPACITY_BUCKETS)

    def once():
        lm_state = init_flow_lm_state(model.specs, 1, capacity, dtype)
        mimi_state = init_decoder_state(model.mimi_specs, 1, dtype)
        t0 = time.monotonic()
        lm_state = prompt(model.params, lm_state, tokens, true_len)
        _, _, audio, lm_state, mimi_state = step(
            model.params, model.mimi_params, lm_state, mimi_state,
            jnp.zeros((1, ldim), jnp.float32), jnp.ones((1,), bool),
            jnp.zeros((1, ldim), jnp.float32),
        )
        np.asarray(audio)
        return (time.monotonic() - t0) * 1000

    once()  # compile
    times = [once() for _ in range(5)]
    return float(np.median(times))


def _try(fn, label):
    import sys
    import traceback

    try:
        return fn()
    except Exception:
        print(f"[bench] {label} failed:", file=sys.stderr)
        traceback.print_exc()
        return None


_PARTIAL: dict = {}  # sections completed so far, for the watchdog line


def _arm_watchdog():
    """The tunneled TPU can wedge its device claim for tens of minutes (see
    memory notes); if the budget runs out, emit whatever sections completed
    (value = the headline if it landed) instead of hanging the harness."""
    import os
    import threading

    budget = float(os.environ.get("BENCH_WATCHDOG_SECS", "3300"))

    def fire():
        out = {
            "metric": "audio_seconds_per_second_per_chip",
            "value": _PARTIAL.get("value", 0.0),
            "unit": "audio-s/s",
            "vs_baseline": round(_PARTIAL.get("value", 0.0) / REFERENCE_RTS, 2),
            "error": "watchdog budget exhausted; partial results",
            **{k: v for k, v in _PARTIAL.items() if k != "value"},
        }
        print(json.dumps(out), flush=True)
        os._exit(3)

    t = threading.Timer(budget, fire)
    t.daemon = True
    t.start()
    return t


def main():
    watchdog = _arm_watchdog()
    model_bf16, _ = build_model(jnp.bfloat16, quantize=False)
    bf16_b1 = _try(lambda: measure_throughput(model_bf16, jnp.bfloat16, batch=1),
                   "bf16_b1")
    if bf16_b1:
        _PARTIAL["value"] = round(bf16_b1["audio_s_per_s"], 2)
    bf16_b32 = _try(lambda: measure_throughput(model_bf16, jnp.bfloat16, batch=32),
                    "bf16_b32")
    if bf16_b32:
        _PARTIAL["batch32_audio_s_per_s"] = round(bf16_b32["audio_s_per_s"], 2)
    first_chunk = _try(lambda: measure_first_chunk_latency(model_bf16, jnp.bfloat16),
                       "first_chunk")
    if first_chunk:
        _PARTIAL["first_chunk_ms"] = round(first_chunk, 1)
    long_text = _try(lambda: measure_long_text_split(model_bf16, jnp.bfloat16),
                     "long_text")
    if long_text:
        _PARTIAL["long_text_rtf"] = round(long_text["rtf"], 2)
        _PARTIAL["per_chunk_overhead_ms"] = round(
            long_text["per_chunk_overhead_ms"], 1)
    driver_b1 = _try(lambda: measure_driver_b1(model_bf16, jnp.bfloat16),
                     "driver_b1")
    if driver_b1:
        _PARTIAL["driver_b1_audio_s_per_s"] = round(driver_b1, 2)

    def int8_run():
        model_int8, _ = build_model(jnp.bfloat16, quantize=True)
        out = {}
        for b in (1, 32, 64, 128):  # large-batch sweep (BASELINE config #5)
            out[b] = measure_throughput(model_int8, jnp.bfloat16, batch=b)
            _PARTIAL[f"int8_b{b}_audio_s_per_s"] = round(
                out[b]["audio_s_per_s"], 2)
        return out

    int8 = _try(int8_run, "int8") or {}
    bf16_b128 = _try(lambda: measure_throughput(model_bf16, jnp.bfloat16, batch=128),
                     "bf16_b128")
    if bf16_b128:
        _PARTIAL["batch128_audio_s_per_s"] = round(bf16_b128["audio_s_per_s"], 2)

    def f32_run():
        model_f32, _ = build_model(jnp.float32, quantize=False)
        return measure_throughput(model_f32, jnp.float32, batch=1)

    f32_b1 = _try(f32_run, "f32_b1")

    def run_24l(quantize):
        m24, _ = build_model(jnp.bfloat16, quantize=quantize,
                             config_name="italian_24l.yaml")
        return measure_throughput(m24, jnp.bfloat16, batch=1)

    b24l = _try(lambda: run_24l(False), "24l_b1")
    b24l_int8 = _try(lambda: run_24l(True), "24l_int8_b1")

    def a(d, key="audio_s_per_s", nd=2):
        return round(d[key], nd) if d else None

    value = bf16_b1["audio_s_per_s"] if bf16_b1 else 0.0
    out = {
        "metric": "audio_seconds_per_second_per_chip",
        "value": round(value, 2),
        "unit": "audio-s/s",
        "vs_baseline": round(value / REFERENCE_RTS, 2),
        "bf16_b1_frame_ms": round(bf16_b1["frame_ms"], 3) if bf16_b1 else None,
        "f32_b1_audio_s_per_s": a(f32_b1),
        "int8_b1_audio_s_per_s": a(int8.get(1)),
        "int8_b32_audio_s_per_s": a(int8.get(32)),
        "int8_b64_audio_s_per_s": a(int8.get(64)),
        "int8_b128_audio_s_per_s": a(int8.get(128)),
        "batch32_audio_s_per_s": a(bf16_b32),
        "batch128_audio_s_per_s": a(bf16_b128),
        "24l_b1_audio_s_per_s": a(b24l),
        "24l_int8_b1_audio_s_per_s": a(b24l_int8),
        "driver_b1_audio_s_per_s": round(driver_b1, 2) if driver_b1 else None,
        "long_text_rtf": round(long_text["rtf"], 2) if long_text else None,
        "long_text_max_gap_ms": round(long_text["max_gap_ms"], 1) if long_text else None,
        "per_chunk_overhead_ms": (round(long_text["per_chunk_overhead_ms"], 1)
                                  if long_text else None),
        "first_chunk_ms": round(first_chunk, 1) if first_chunk else None,
        "device": str(jax.devices()[0]),
    }
    watchdog.cancel()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
