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

    if "kern" in sections:
        # isolated decode-stack kernel throughput (no append/heads/flow):
        # chained calls, min over trials -> effective HBM GB/s
        import time as _t

        import numpy as _np

        from pocket_tts_tpu.nn.transformer import init_layer_params
        from pocket_tts_tpu.ops.decode_stack import (
            decode_stack_tpu, pack_decode_stack)
        from pocket_tts_tpu.quant import quantize_weight
        from pocket_tts_tpu.nn.transformer import TransformerConfig

        for L in (24,):
            for C in (512, 1024):
                for quant in (True, False):
                    cfg = TransformerConfig(d_model=1024, num_heads=16,
                                            num_layers=L, dim_feedforward=4096)
                    params = jax.tree.map(
                        lambda x: x.astype(jnp.bfloat16),
                        init_layer_params(cfg, jax.random.PRNGKey(0)))
                    if quant:
                        for k in ("in_proj", "out_proj", "w1", "w2"):
                            params[k] = quantize_weight(params[k])
                    packed = pack_decode_stack(cfg, params)
                    rng = _np.random.default_rng(0)
                    ck = jnp.asarray(rng.standard_normal(
                        (L, 1, C, 16, 64)), jnp.bfloat16)
                    cv = jnp.asarray(rng.standard_normal(
                        (L, 1, C, 16, 64)), jnp.bfloat16)
                    mask = jnp.zeros((C, 1), jnp.float32)
                    cos = jnp.ones((1, 1024), jnp.float32)
                    sin = jnp.zeros((1, 1024), jnp.float32)
                    x = jnp.asarray(rng.standard_normal((1, 1024)) * 0.1,
                                    jnp.bfloat16)

                    def call(xx):
                        h, kn, vn = decode_stack_tpu(
                            xx, packed, ck, cv, mask, cos, sin, H=16, Dh=64)
                        return h

                    def chain(n):
                        xx = x
                        t0 = _t.monotonic()
                        for _ in range(n):
                            xx = call(xx)
                        _np.asarray(xx).ravel()[:1]
                        return _t.monotonic() - t0

                    chain(1); chain(1)
                    n = 2
                    while chain(n) < 1.5 and n < 4096:
                        n *= 2
                    per = min((chain(2 * n) - chain(n)) / n for _ in range(3))
                    wbytes = packed["wcat"].size * packed["wcat"].dtype.itemsize
                    cbytes = ck.size * 2 * 2
                    gbs = (wbytes + cbytes) / per / 1e9
                    q = "int8" if quant else "bf16"
                    print(f"  kern L{L} C{C} {q}: {per*1e3:7.3f} ms/call  "
                          f"{gbs:6.1f} GB/s (w {wbytes/1e6:.0f} MB + "
                          f"cache {cbytes/1e6:.0f} MB)", flush=True)

    if "bisect" in sections:
        # Where do the ~0.6 ms outside the kernel go? 8-frame scan blocks of
        # decode_step variants at fixed C=512, 24l int8, stack on:
        #   full   — production decode_step (kernel + heads + flow + append)
        #   noflow — flow head replaced by identity (latent = h[:, :ldim])
        #   nohead — transformer_apply + append only (no norms/eos/flow)
        import time as _t

        import numpy as _np

        from measure_r4 import post_prompt_state
        from pocket_tts_tpu.models.flow_lm import decode_step
        from pocket_tts_tpu.nn.transformer import layer_norm, transformer_apply

        set_stack(True)
        m = build_model(quantize=True, config_name="italian_24l.yaml")
        m._ensure_stack_packed()
        specs = m.specs
        ldim = specs.ldim
        BLOCK = 8

        def variant_fn(kind):
            def block(params, lm_state, prev):
                def body(carry, xs):
                    lm_state, prev = carry
                    if kind == "full":
                        latent, eos, lm_state = decode_step(
                            specs, params, lm_state, prev,
                            jnp.zeros((1,), bool), xs, lsd_steps=1,
                            eos_threshold=-4.0)
                    else:
                        wdtype = params["input_linear"].dtype
                        x = (prev.astype(wdtype) @ params["input_linear"].T)[:, None]
                        h, lm_state = transformer_apply(
                            specs.transformer, params["transformer"], x,
                            lm_state, unroll=True,
                            packed=params.get("stack_packed"))
                        if kind == "noflow":
                            hf = layer_norm(h[:, -1].astype(jnp.float32),
                                            params["out_norm"]["w"],
                                            params["out_norm"]["b"])
                            eos = (hf @ params["out_eos"]["w"].T.astype(
                                jnp.float32))[:, 0] > -4.0
                            latent = hf[:, :ldim]
                        else:  # nohead
                            latent = h[:, -1, :ldim].astype(jnp.float32)
                            eos = latent[:, 0] > 99.0
                    return (lm_state, latent), eos
                (lm_state, prev), eos = jax.lax.scan(
                    body, (lm_state, prev), jnp.zeros((BLOCK, 1, ldim),
                                                      jnp.float32))
                return lm_state, prev, eos
            return jax.jit(block, donate_argnums=(1,))

        for kind in ("full", "noflow", "nohead"):
            fn = variant_fn(kind)

            def run_once():
                lm = post_prompt_state(m, 1, 400, jnp.bfloat16, capacity=512)
                prev = jnp.zeros((1, ldim), jnp.float32)
                t0 = _t.monotonic()
                frames = 0
                while frames < 320:
                    lm, prev, eos = fn(m.params, lm, prev)
                    frames += BLOCK
                _np.asarray(eos)
                return _t.monotonic() - t0

            run_once()
            best = min(run_once() for _ in range(5))
            print(f"  bisect {kind:7s} {best*1000/320:7.3f} ms/frame "
                  f"({0.08*320/best:7.1f} audio-s/s)", flush=True)
        set_stack(False)

    if "b128pin" in sections:
        # Large-batch layout experiment: does pinning the jit-boundary cache
        # layout remove the dispatch-boundary relayout copies (round-4 b128
        # residual)? Interleaved legs, min statistics.
        import os
        import time as _t

        import numpy as _np

        from measure_r4 import post_prompt_state
        from pocket_tts_tpu.models.mimi import init_decoder_state
        from pocket_tts_tpu.pipeline.tts import _block_size

        B = int(sys.argv[2]) if len(sys.argv) > 2 else 128
        set_stack(False)

        def build_variant(pin):
            os.environ["POCKET_TTS_TPU_PIN_LAYOUT"] = "1" if pin else "0"
            m = build_model(quantize=True)
            return m

        def run_once(model):
            lm = post_prompt_state(model, B, 192, jnp.bfloat16)
            mimi = init_decoder_state(model.mimi_specs, B, jnp.bfloat16)
            ldim = model.specs.ldim
            prev = jnp.zeros((B, ldim), jnp.float32)
            is_bos = jnp.ones((B,), bool)
            frames = 0
            t0 = _t.monotonic()
            while frames < 320:
                K = _block_size(frames)
                lm = model._ensure_capacity(lm, 192 + frames + K)
                if K == 1:
                    noise = jnp.zeros((B, ldim), jnp.float32)
                    _, eos, _, lm, mimi = model._fused_step_fn()(
                        model.params, model.mimi_params, lm, mimi, prev,
                        is_bos, noise)
                else:
                    noise = jnp.zeros((K, B, ldim), jnp.float32)
                    _, eos, _, lm, mimi = model._multi_step_fn(K)(
                        model.params, model.mimi_params, lm, mimi, prev,
                        is_bos, noise)
                is_bos = jnp.zeros((B,), bool)
                frames += K
            _np.asarray(eos)
            return _t.monotonic() - t0

        m_base = build_variant(pin=False)
        run_once(m_base)
        m_pin = build_variant(pin=True)
        run_once(m_pin)
        os.environ["POCKET_TTS_TPU_PIN_LAYOUT"] = "0"
        walls = {"base": [], "pinned": []}
        for _ in range(4):
            walls["base"].append(run_once(m_base))
            walls["pinned"].append(run_once(m_pin))
        for name, ts in walls.items():
            best = min(ts)
            print(f"  b{B} int8 {name:7s} min {best*1000/320:7.3f} ms/frame "
                  f"({B*0.08*320/best:8.1f} audio-s/s)  "
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
