"""Consolidated round-3 TPU measurement: honest generation-schedule throughput.

Replaces fine-grained slope profiling (unreliable over the tunneled device:
per-dispatch latency jitter produced negative slopes) with whole-generation
wall time: run the production block schedule (progressive capacity growth,
FIRST_BLOCK single frames, then SCAN_BLOCK_FRAMES scans) for a fixed number of
frames, fetch the final EOS flags, take the median of several trials. A 300+
frame run amortizes fetch latency; medians reject tunnel hiccups.

Usage: python tools/measure_r3.py [b1] [b32] [flash] [int8] [24l]
(no args = all sections)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

FRAME_SECONDS = 0.08


def build_model(dtype=jnp.bfloat16, quantize=False, config_name="english.yaml"):
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
    return TTSModel(specs, mimi_specs, params, mimi_params, tokenizer=None,
                    config=cfg, gen_params=GenerationParams())


def synthetic_post_prompt_state(model, batch, start_slots, dtype):
    """A state that looks like 'voice prompt + text prompt already applied':
    start_slots valid slots at positions 0..start_slots-1."""
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


def measure_schedule(model, dtype, batch, start_slots=192, gen_frames=320,
                     trials=3, label=""):
    """Production block schedule (growth + scan blocks), median wall time."""
    from pocket_tts_tpu.models.mimi import init_decoder_state
    from pocket_tts_tpu.pipeline.tts import _block_size

    ldim = model.specs.ldim

    def run_once():
        lm = synthetic_post_prompt_state(model, batch, start_slots, dtype)
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

    run_once()  # compile every bucket
    ts = sorted(run_once() for _ in range(trials))
    wall = ts[len(ts) // 2]
    out = {
        "audio_s_per_s": batch * gen_frames * FRAME_SECONDS / wall,
        "frame_ms": wall / gen_frames * 1000,
        "trials_s": [round(t, 3) for t in ts],
    }
    print(f"  {label:24s} {out['frame_ms']:8.3f} ms/frame  "
          f"{out['audio_s_per_s']:8.1f} audio-s/s  trials={out['trials_s']}",
          flush=True)
    return out


def set_flash(on: bool):
    import os

    from pocket_tts_tpu.ops.flash_decode import _flash_mode

    os.environ["POCKET_TTS_TPU_FLASH"] = "1" if on else "0"
    _flash_mode.cache_clear()


def main():
    sections = set(sys.argv[1:]) or {"b1", "b32", "flash", "int8", "24l"}
    print(f"device: {jax.devices()[0]}", flush=True)
    model = build_model()

    if "b1" in sections:
        print("=== b1 bf16 (schedule, start=192, 320 frames) ===", flush=True)
        set_flash(False)
        measure_schedule(model, jnp.bfloat16, 1, label="b1 xla")
        if "flash" in sections:
            set_flash(True)
            model._jit_cache.clear()
            measure_schedule(model, jnp.bfloat16, 1, label="b1 flash")
            set_flash(False)
            model._jit_cache.clear()

    if "b32" in sections:
        print("=== b32 bf16 (schedule) ===", flush=True)
        set_flash(False)
        measure_schedule(model, jnp.bfloat16, 32, label="b32 xla")
        if "flash" in sections:
            set_flash(True)
            model._jit_cache.clear()
            measure_schedule(model, jnp.bfloat16, 32, label="b32 flash")
            set_flash(False)
            model._jit_cache.clear()

    if "int8" in sections:
        print("=== b32 int8 (schedule) ===", flush=True)
        set_flash(False)
        m8 = build_model(quantize=True)
        measure_schedule(m8, jnp.bfloat16, 32, label="b32 int8")

    if "24l" in sections:
        print("=== italian_24l b1 bf16 (schedule) ===", flush=True)
        set_flash(False)
        m24 = build_model(config_name="italian_24l.yaml")
        measure_schedule(m24, jnp.bfloat16, 1, label="24l b1 xla")


if __name__ == "__main__":
    main()
