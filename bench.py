"""Benchmark: streaming TTS throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "audio_seconds_per_second_per_chip", "value": N, "unit": "audio-s/s",
   "vs_baseline": N, ...extras}

Primary metric = BASELINE config #1 (single utterance, streaming decode: fused
FlowLM step + Mimi codec per 80 ms frame, english 100M shapes). vs_baseline is
against the reference's published 6.33x real-time (MacBook Air M4,
docs/quantization.md:53-57). Extras report batch-32 throughput (config #2) and
first-chunk latency.

Weights are random — throughput and latency are weight-value independent.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: repeat runs skip the (slow) remote TPU compile
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REFERENCE_RTS = 6.33  # reference real-time factor (M4, f32)
FRAME_SECONDS = 0.08
WARMUP_STEPS = 10
BENCH_STEPS = 100


def build(batch: int, capacity: int, dtype=jnp.float32):
    from pocket_tts_tpu.config import CONFIGS_DIR, load_config
    from pocket_tts_tpu.models.flow_lm import (
        build_flow_lm_specs,
        decode_step,
        init_flow_lm_params,
        init_flow_lm_state,
    )
    from pocket_tts_tpu.models.mimi import (
        build_mimi_specs,
        decoder_step,
        init_decoder_state,
        init_mimi_params,
        project_latent,
    )

    cfg = load_config(CONFIGS_DIR / "english.yaml")
    specs = build_flow_lm_specs(cfg)
    mimi_specs = build_mimi_specs(cfg.mimi)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = jax.tree.map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x,
        init_flow_lm_params(specs, k1),
    )
    mimi_params = jax.tree.map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x,
        init_mimi_params(mimi_specs, k2),
    )

    def fused_step(params, mimi_params, lm_state, mimi_state, prev_latent, is_bos, noise):
        latent, eos, lm_state = decode_step(
            specs, params, lm_state, prev_latent, is_bos, noise,
            lsd_steps=1, eos_threshold=-4.0,
        )
        denorm = latent * params["emb_std"] + params["emb_mean"]
        quantized = project_latent(mimi_specs, mimi_params, denorm[:, :, None])
        audio, mimi_state = decoder_step(mimi_specs, mimi_params, quantized, mimi_state)
        return latent, eos, audio, lm_state, mimi_state

    step = jax.jit(fused_step, donate_argnums=(2, 3))
    lm_state = init_flow_lm_state(specs, batch, capacity, dtype)
    mimi_state = init_decoder_state(mimi_specs, batch, dtype)
    prev = jnp.zeros((batch, specs.ldim), dtype)
    noise = jnp.zeros((batch, specs.ldim), dtype)
    is_bos = jnp.zeros((batch,), bool)
    return step, params, mimi_params, lm_state, mimi_state, prev, is_bos, noise


def measure(batch: int, capacity: int = 768, dtype=jnp.float32):
    step, params, mimi_params, lm_state, mimi_state, prev, is_bos, noise = build(
        batch, capacity, dtype
    )
    t_compile = time.monotonic()
    latent, eos, audio, lm_state, mimi_state = step(
        params, mimi_params, lm_state, mimi_state, prev, is_bos, noise
    )
    jax.block_until_ready(audio)
    compile_s = time.monotonic() - t_compile
    first_frame_ms = None
    # steady state
    for _ in range(WARMUP_STEPS):
        latent, eos, audio, lm_state, mimi_state = step(
            params, mimi_params, lm_state, mimi_state, latent, is_bos, noise
        )
    jax.block_until_ready(audio)
    t0 = time.monotonic()
    for _ in range(BENCH_STEPS):
        latent, eos, audio, lm_state, mimi_state = step(
            params, mimi_params, lm_state, mimi_state, latent, is_bos, noise
        )
    jax.block_until_ready(audio)
    dt = time.monotonic() - t0
    frames_per_s = BENCH_STEPS / dt
    # first-chunk latency: one prompt-free decode step, post-warmup
    t1 = time.monotonic()
    out = step(params, mimi_params, lm_state, mimi_state, latent, is_bos, noise)
    jax.block_until_ready(out[2])
    first_frame_ms = (time.monotonic() - t1) * 1000
    latent, eos, audio, lm_state, mimi_state = out
    return {
        "frames_per_s": frames_per_s,
        "audio_s_per_s": frames_per_s * FRAME_SECONDS * batch,
        "step_ms": 1000 / frames_per_s,
        "first_frame_ms": first_frame_ms,
        "compile_s": compile_s,
    }


def main():
    single = measure(batch=1)
    batch32 = measure(batch=32)
    value = single["audio_s_per_s"]
    result = {
        "metric": "audio_seconds_per_second_per_chip",
        "value": round(value, 2),
        "unit": "audio-s/s",
        "vs_baseline": round(value / REFERENCE_RTS, 2),
        "batch1_step_ms": round(single["step_ms"], 3),
        "batch1_first_frame_ms": round(single["first_frame_ms"], 2),
        "batch32_audio_s_per_s": round(batch32["audio_s_per_s"], 2),
        "batch32_step_ms": round(batch32["step_ms"], 3),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
