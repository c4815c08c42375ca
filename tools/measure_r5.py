"""Round-5 TPU measurements: the fused decode-stack kernel A/B, plus the
updated streaming-ceiling probes that correct round-4's rooflines.

Sections (args; no args = stack):
  stack  — b1 production schedule, decode-stack kernel ON vs OFF:
           english 6l bf16/int8 and italian_24l bf16/int8
  b32    — batch sanity with the kernel enabled (it must route itself OFF
           for B>1 and match the round-4 numbers)
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from measure_r4 import build_model, measure_schedule  # noqa: E402


def set_stack(on: bool):
    import os

    from pocket_tts_tpu.ops.decode_stack import _stack_mode

    os.environ["POCKET_TTS_TPU_STACK"] = "1" if on else "0"
    _stack_mode.cache_clear()


def fresh(model):
    model._jit_cache.clear()
    model.params = {k: v for k, v in model.params.items() if k != "stack_packed"}
    return model


def main():
    sections = set(sys.argv[1:]) or {"stack"}
    print(f"device: {jax.devices()[0]}", flush=True)

    if "stack" in sections:
        print("=== b1 schedule: decode-stack kernel A/B ===", flush=True)
        for config, tag in (("english.yaml", "6l"), ("italian_24l.yaml", "24l")):
            for quant in (False, True):
                m = build_model(quantize=quant, config_name=config)
                q = "int8" if quant else "bf16"
                set_stack(False)
                measure_schedule(fresh(m), jnp.bfloat16, 1,
                                 label=f"{tag} b1 {q} xla")
                set_stack(True)
                measure_schedule(fresh(m), jnp.bfloat16, 1,
                                 label=f"{tag} b1 {q} stack")
                set_stack(False)

    if "ab" in sections:
        # Interleaved A/B with min statistics: the tunneled device's
        # interference jitters run medians by up to 60%, so alternate the two
        # paths leg by leg within one process and compare the MIN wall time
        # (the physics lower bound is what routing decisions need).
        import time as _t

        from measure_r4 import post_prompt_state
        from pocket_tts_tpu.pipeline.tts import _block_size
        import numpy as _np

        cfgs = sys.argv[2:] or ["italian_24l.yaml"]
        for config in cfgs:
            for quant in (True, False):
                q = "int8" if quant else "bf16"
                m = build_model(quantize=quant, config_name=config)
                ldim = m.specs.ldim

                def run_once(model):
                    lm = post_prompt_state(model, 1, 192, jnp.bfloat16)
                    from pocket_tts_tpu.models.mimi import init_decoder_state
                    mimi = init_decoder_state(model.mimi_specs, 1, jnp.bfloat16)
                    prev = jnp.zeros((1, ldim), jnp.float32)
                    is_bos = jnp.ones((1,), bool)
                    frames = 0
                    t0 = _t.monotonic()
                    while frames < 320:
                        K = _block_size(frames)
                        lm = model._ensure_capacity(lm, 192 + frames + K)
                        if K == 1:
                            noise = jnp.zeros((1, ldim), jnp.float32)
                            _, eos, _, lm, mimi = model._fused_step_fn()(
                                model.params, model.mimi_params, lm, mimi,
                                prev, is_bos, noise)
                        else:
                            noise = jnp.zeros((K, 1, ldim), jnp.float32)
                            _, eos, _, lm, mimi = model._multi_step_fn(K)(
                                model.params, model.mimi_params, lm, mimi,
                                prev, is_bos, noise)
                        is_bos = jnp.zeros((1,), bool)
                        frames += K
                    _np.asarray(eos)
                    return _t.monotonic() - t0

                # two models, each traced once under its own routing (the env
                # is read at trace time): alternating legs then run the
                # already-compiled executables with no recompiles
                set_stack(False)
                m_xla = fresh(m)
                run_once(m_xla)  # compile
                set_stack(True)
                m_stack = build_model(quantize=quant, config_name=config)
                run_once(m_stack)  # compile
                set_stack(False)
                walls = {"xla": [], "stack": []}
                for leg in range(5):
                    walls["xla"].append(run_once(m_xla))
                    walls["stack"].append(run_once(m_stack))
                for name, ts in walls.items():
                    best = min(ts)
                    print(f"  {config} {q} {name:5s} min {best*1000/320:6.3f} "
                          f"ms/frame ({0.08*320/best:7.1f} audio-s/s)  "
                          f"all={[round(t,3) for t in ts]}", flush=True)

    if "b32" in sections:
        print("=== b32 sanity with kernel enabled (must self-route off) ===",
              flush=True)
        m = build_model(quantize=True)
        set_stack(True)
        measure_schedule(fresh(m), jnp.bfloat16, 32, label="b32 int8 stack-env")
        set_stack(False)


if __name__ == "__main__":
    main()
