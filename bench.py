"""Benchmark: streaming TTS throughput + latency on one TPU chip.

Prints ONE JSON line:
  {"metric": "audio_seconds_per_second_per_chip", "value": N, "unit": "audio-s/s",
   "vs_baseline": N, ...extras}

Methodology: timings use chained-dispatch slope (time(N2 blocks) - time(N1
blocks)) / (N2 - N1) with a final device fetch forcing completion — immune to
async-dispatch illusions and fixed per-session overheads. Each dispatch is an
8-frame lax.scan of the fused step (FlowLM decode + EOS + LSD flow + full Mimi
codec decode), exactly what the production driver runs in steady state.

Primary value = bf16 weights, batch 1 (single-utterance streaming, BASELINE
config #1). Extras: f32 (the waveform-parity dtype), int8 weight-only
(quantized serving), batch-32 (config #2), and first-chunk latency (text prompt
+ first frame). vs_baseline is against the reference's published 6.33x
real-time (M4 CPU, docs/quantization.md:53-57).

Weights are random — throughput and latency are weight-value independent.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REFERENCE_RTS = 6.33  # reference real-time factor (M4, f32)
FRAME_SECONDS = 0.08
BLOCK = 8  # frames per dispatch (matches pipeline SCAN_BLOCK_FRAMES)


def build_model(dtype, quantize: bool):
    from pocket_tts_tpu.config import CONFIGS_DIR, load_config
    from pocket_tts_tpu.models.flow_lm import build_flow_lm_specs, init_flow_lm_params
    from pocket_tts_tpu.models.mimi import build_mimi_specs, init_mimi_params
    from pocket_tts_tpu.pipeline.tts import GenerationParams, TTSModel
    from pocket_tts_tpu.quant import quantize_flow_lm_int8

    cfg = load_config(CONFIGS_DIR / "english.yaml")
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


def measure_throughput(model, dtype, batch: int, capacity: int = 768,
                       n1: int = 3, n2: int = 28):
    from pocket_tts_tpu.models.flow_lm import init_flow_lm_state
    from pocket_tts_tpu.models.mimi import init_decoder_state

    step = model._multi_step_fn(BLOCK)
    ldim = model.specs.ldim

    def fresh():
        return (
            init_flow_lm_state(model.specs, batch, capacity, dtype),
            init_decoder_state(model.mimi_specs, batch, dtype),
            jnp.zeros((batch, ldim), jnp.float32),
            jnp.zeros((batch,), bool),
            jnp.zeros((BLOCK, batch, ldim), jnp.float32),
        )

    def chain(n_blocks):
        lm_state, mimi_state, prev, is_bos, noise = fresh()
        t0 = time.monotonic()
        for _ in range(n_blocks):
            latents, eos, audio, lm_state, mimi_state = step(
                model.params, model.mimi_params, lm_state, mimi_state,
                prev, is_bos, noise,
            )
            prev = latents[-1]
        np.asarray(eos)  # force completion of the chain
        return time.monotonic() - t0

    chain(1)  # compile + claim
    chain(1)  # warm
    t1 = chain(n1)
    t2 = chain(n2)
    frame_ms = (t2 - t1) / ((n2 - n1) * BLOCK) * 1000
    return {
        "frame_ms": frame_ms,
        "audio_s_per_s": FRAME_SECONDS / (frame_ms / 1000) * batch,
    }


def measure_first_chunk_latency(model, dtype, capacity: int = 768,
                                n_tokens: int = 16):
    """Text prompt (bucketed) + first fused frame + host fetch, post-warmup."""
    from pocket_tts_tpu.models.flow_lm import init_flow_lm_state
    from pocket_tts_tpu.models.mimi import init_decoder_state

    prompt = model._text_prompt_fn()
    step = model._fused_step_fn()
    ldim = model.specs.ldim
    tokens = jnp.zeros((1, n_tokens), jnp.int32)
    true_len = jnp.full((1,), n_tokens, jnp.int32)

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


def _arm_watchdog():
    """The tunneled TPU can wedge its device claim for tens of minutes (see
    memory notes); if nothing completes in time, emit an honest failure line
    instead of hanging the harness."""
    import os
    import threading

    budget = float(os.environ.get("BENCH_WATCHDOG_SECS", "2700"))

    def fire():
        print(json.dumps({
            "metric": "audio_seconds_per_second_per_chip",
            "value": 0.0,
            "unit": "audio-s/s",
            "vs_baseline": 0.0,
            "error": "device unavailable within watchdog budget",
        }), flush=True)
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
    bf16_b32 = _try(lambda: measure_throughput(model_bf16, jnp.bfloat16, batch=32),
                    "bf16_b32")
    first_chunk = _try(lambda: measure_first_chunk_latency(model_bf16, jnp.bfloat16),
                       "first_chunk")

    def int8_run():
        model_int8, _ = build_model(jnp.bfloat16, quantize=True)
        return measure_throughput(model_int8, jnp.bfloat16, batch=1)

    int8_b1 = _try(int8_run, "int8_b1")

    def f32_run():
        model_f32, _ = build_model(jnp.float32, quantize=False)
        return measure_throughput(model_f32, jnp.float32, batch=1)

    f32_b1 = _try(f32_run, "f32_b1")

    value = bf16_b1["audio_s_per_s"] if bf16_b1 else 0.0
    out = {
        "metric": "audio_seconds_per_second_per_chip",
        "value": round(value, 2),
        "unit": "audio-s/s",
        "vs_baseline": round(value / REFERENCE_RTS, 2),
        "bf16_b1_frame_ms": round(bf16_b1["frame_ms"], 3) if bf16_b1 else None,
        "f32_b1_audio_s_per_s": round(f32_b1["audio_s_per_s"], 2) if f32_b1 else None,
        "int8_b1_audio_s_per_s": round(int8_b1["audio_s_per_s"], 2) if int8_b1 else None,
        "batch32_audio_s_per_s": round(bf16_b32["audio_s_per_s"], 2) if bf16_b32 else None,
        "first_chunk_ms": round(first_chunk, 1) if first_chunk else None,
        "device": str(jax.devices()[0]),
    }
    watchdog.cancel()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
