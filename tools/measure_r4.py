"""Round-4 TPU measurements: large-batch sweep, step decomposition, 24l
variants, and the b1 capacity-schedule A/B.

Same methodology as tools/measure_r3.py (whole-generation wall time over the
production block schedule, median of trials, host fetch as completion barrier —
fine-grained slope profiling is unreliable over the tunneled device).

Sections (args; no args = sweep):
  sweep  — b32/b64/b128 x bf16/int8 production-schedule throughput
  parts  — decomposition at a given batch: full step vs LM-only vs codec-only
  24l    — italian_24l b1: bf16/int8 x flash on/off
  b1ab   — b1: progressive capacity growth vs fixed 1024-cap + att_len buckets
  block  — block-size sensitivity at b64 (MAX_BLOCK_FRAMES candidates)
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


def post_prompt_state(model, batch, start_slots, dtype, capacity=None):
    from pocket_tts_tpu.models.flow_lm import init_flow_lm_state
    from pocket_tts_tpu.pipeline.tts import CAPACITY_BUCKETS, _bucket

    cap0 = capacity or _bucket(start_slots, CAPACITY_BUCKETS)
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
                     trials=3, label="", lm_only=False):
    """Production block schedule (growth + scan blocks), median wall time.
    lm_only=True runs the FlowLM decode scan without the codec (decomposition)."""
    from pocket_tts_tpu.models.flow_lm import decode_step
    from pocket_tts_tpu.models.mimi import init_decoder_state
    from pocket_tts_tpu.pipeline.tts import _block_size

    ldim = model.specs.ldim

    lm_step_cache = {}

    def lm_block_fn(K):
        if K not in lm_step_cache:
            def run(params, lm_state, prev, is_bos0, noise):
                def body(carry, xs):
                    lm_state, prev, is_bos = carry
                    latent, eos, lm_state = decode_step(
                        model.specs, params, lm_state, prev, is_bos, xs,
                        lsd_steps=1, eos_threshold=-4.0)
                    return (lm_state, latent, jnp.zeros_like(is_bos)), eos
                (lm_state, prev, _), eos = jax.lax.scan(
                    body, (lm_state, prev, is_bos0), noise)
                return lm_state, prev, eos
            lm_step_cache[K] = jax.jit(run, donate_argnums=(1,))
        return lm_step_cache[K]

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
            if lm_only:
                noise = jnp.zeros((max(K, 1), batch, ldim), jnp.float32)
                lm, prev, eos = lm_block_fn(K)(model.params, lm, prev, is_bos, noise)
            elif K == 1:
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
    print(f"  {label:28s} {out['frame_ms']:8.3f} ms/frame  "
          f"{out['audio_s_per_s']:8.1f} audio-s/s  trials={out['trials_s']}",
          flush=True)
    return out


def measure_fixed_capacity(model, dtype, batch=1, start_slots=192,
                           gen_frames=320, capacity=1024, trials=3, label=""):
    """Alternative b1 schedule: allocate `capacity` once, no growth/pad-copies;
    attention reads stop at an att_len bucket >= the slot watermark (the flash
    kernel's grid-stop; the XLA path slices)."""
    from pocket_tts_tpu.models.mimi import init_decoder_state
    from pocket_tts_tpu.pipeline.tts import _block_size

    ldim = model.specs.ldim
    att_buckets = tuple(b for b in (256, 384, 512, 768, 1024, 1536, 2048, 3072, 4096)
                        if b <= capacity)

    def att_for(watermark):
        for b in att_buckets:
            if watermark <= b:
                return b if b < capacity else None
        return None

    def run_once():
        lm = post_prompt_state(model, batch, start_slots, dtype, capacity=capacity)
        mimi = init_decoder_state(model.mimi_specs, batch, dtype)
        prev = jnp.zeros((batch, ldim), jnp.float32)
        is_bos = jnp.ones((batch,), bool)
        frames = 0
        t0 = time.monotonic()
        while frames < gen_frames:
            K = _block_size(frames)
            att = att_for(start_slots + frames + K)
            if K == 1:
                noise = jnp.zeros((batch, ldim), jnp.float32)
                _, eos, _, lm, mimi = model._fused_step_fn(att_len=att)(
                    model.params, model.mimi_params, lm, mimi, prev, is_bos, noise)
            else:
                noise = jnp.zeros((K, batch, ldim), jnp.float32)
                _, eos, _, lm, mimi = model._multi_step_fn(K, att_len=att)(
                    model.params, model.mimi_params, lm, mimi, prev, is_bos, noise)
            is_bos = jnp.zeros((batch,), bool)
            frames += K
        np.asarray(eos)
        return time.monotonic() - t0

    run_once()
    ts = sorted(run_once() for _ in range(trials))
    wall = ts[len(ts) // 2]
    out = {
        "audio_s_per_s": batch * gen_frames * FRAME_SECONDS / wall,
        "frame_ms": wall / gen_frames * 1000,
        "trials_s": [round(t, 3) for t in ts],
    }
    print(f"  {label:28s} {out['frame_ms']:8.3f} ms/frame  "
          f"{out['audio_s_per_s']:8.1f} audio-s/s  trials={out['trials_s']}",
          flush=True)
    return out


def set_flash(on: bool):
    import os

    from pocket_tts_tpu.ops.flash_decode import _flash_mode

    os.environ["POCKET_TTS_TPU_FLASH"] = "1" if on else "0"
    _flash_mode.cache_clear()


def main():
    sections = set(sys.argv[1:]) or {"sweep"}
    print(f"device: {jax.devices()[0]}", flush=True)

    if "sweep" in sections:
        print("=== batch sweep (schedule, start=192, 320 frames) ===", flush=True)
        set_flash(False)
        model = build_model()
        for b in (32, 64, 128):
            measure_schedule(model, jnp.bfloat16, b, label=f"b{b} bf16")
        m8 = build_model(quantize=True)
        for b in (32, 64, 128):
            measure_schedule(m8, jnp.bfloat16, b, label=f"b{b} int8")

    if "parts" in sections:
        print("=== decomposition at b64 (bf16) ===", flush=True)
        set_flash(False)
        model = build_model()
        measure_schedule(model, jnp.bfloat16, 64, label="b64 full")
        measure_schedule(model, jnp.bfloat16, 64, label="b64 lm-only", lm_only=True)

    if "24l" in sections:
        print("=== italian_24l b1 (schedule) ===", flush=True)
        for quant in (False, True):
            m = build_model(quantize=quant, config_name="italian_24l.yaml")
            tag = "int8" if quant else "bf16"
            set_flash(False)
            measure_schedule(m, jnp.bfloat16, 1, label=f"24l b1 {tag} xla")
            set_flash(True)
            m._jit_cache.clear()
            measure_schedule(m, jnp.bfloat16, 1, label=f"24l b1 {tag} flash")
            set_flash(False)

    if "b1ab" in sections:
        print("=== b1 capacity-schedule A/B (english 6l) ===", flush=True)
        model = build_model()
        for quant, tag in ((False, "bf16"), (True, "int8")):
            m = build_model(quantize=quant)
            set_flash(True)  # flash is the b1 auto-route
            measure_schedule(m, jnp.bfloat16, 1, label=f"b1 {tag} growth+flash")
            m._jit_cache.clear()
            measure_fixed_capacity(m, jnp.bfloat16, 1, capacity=1024,
                                   label=f"b1 {tag} fixed1024+attbuckets")
            set_flash(False)
            m._jit_cache.clear()
            measure_schedule(m, jnp.bfloat16, 1, label=f"b1 {tag} growth xla")

    if "lmbw" in sections:
        # effective cache-stream bandwidth: two LM-only runs whose capacity
        # stays inside ONE bucket each; the frame-time delta over the slot
        # delta gives bytes/s of the per-step K/V read.
        print("=== cache-read bandwidth probe (b64 bf16, lm-only) ===", flush=True)
        set_flash(False)
        model = build_model()
        lo = measure_schedule(model, jnp.bfloat16, 64, start_slots=16,
                              gen_frames=192, label="b64 lm cap256",
                              lm_only=True)
        hi = measure_schedule(model, jnp.bfloat16, 64, start_slots=400,
                              gen_frames=96, label="b64 lm cap512",
                              lm_only=True)
        layers, heads, dh = (model.specs.transformer.num_layers,
                             model.specs.transformer.num_heads,
                             model.specs.transformer.d_model //
                             model.specs.transformer.num_heads)
        bytes_per_slot = layers * 2 * 64 * heads * dh * 2  # k+v, bf16, b64
        dt = (hi["frame_ms"] - lo["frame_ms"]) / 1000
        if dt > 0:
            bw = bytes_per_slot * (512 - 256) / dt
            print(f"  cache-stream effective BW ~ {bw/1e9:.0f} GB/s "
                  f"({bytes_per_slot*(512-256)/1e6:.0f} MB extra per frame)",
                  flush=True)

    if "24parts" in sections:
        print("=== italian_24l b1 int8 decomposition ===", flush=True)
        set_flash(False)
        m = build_model(quantize=True, config_name="italian_24l.yaml")
        measure_schedule(m, jnp.bfloat16, 1, label="24l b1 int8 full")
        measure_schedule(m, jnp.bfloat16, 1, label="24l b1 int8 lm-only",
                         lm_only=True)
        mb = build_model(quantize=False, config_name="italian_24l.yaml")
        measure_schedule(mb, jnp.bfloat16, 1, label="24l b1 bf16 lm-only",
                         lm_only=True)

    if "block" in sections:
        print("=== block-size sensitivity at b64 int8 ===", flush=True)
        import pocket_tts_tpu.pipeline.tts as T

        set_flash(False)
        m8 = build_model(quantize=True)
        orig = T.MAX_BLOCK_FRAMES
        for blk in (16, 32, 64):
            T.MAX_BLOCK_FRAMES = blk
            m8._jit_cache.clear()
            measure_schedule(m8, jnp.bfloat16, 64, label=f"b64 int8 block={blk}")
        T.MAX_BLOCK_FRAMES = orig


if __name__ == "__main__":
    main()
