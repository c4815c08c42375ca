"""Per-component step-time profile of the fused frame step on the real chip.

Decomposes the b1/b32 frame time into: FlowLM decode (transformer + heads),
LSD flow MLP, Mimi decoder transformer, SEANet decode (fused Pallas vs XLA),
so optimization effort lands on the dominant term instead of a guess.

Methodology matches bench.py: chained-dispatch slope over BLOCK-frame scans.

Usage: python tools/profile_step.py [batch ...]
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

BLOCK = 8
DTYPE = jnp.bfloat16


def slope_ms(step, make_carry, n1=3, n2=23):
    """step: carry -> carry (one BLOCK dispatch). Returns ms per dispatch."""

    def chain(n):
        # donated buffers are consumed; every chain needs fresh copies
        c = jax.tree.map(jnp.copy, make_carry())
        t0 = time.monotonic()
        for _ in range(n):
            c = step(c)
        # fetch (not block_until_ready): on the tunneled axon device,
        # block_until_ready returns before execution completes (measured:
        # b1 "frame times" below the weight-streaming physical floor);
        # a host fetch is the only reliable completion barrier.
        np.asarray(jax.tree.leaves(c)[0]).ravel()[0]
        return time.monotonic() - t0

    chain(1); chain(1)
    t1, t2 = chain(n1), chain(n2)
    return (t2 - t1) / (n2 - n1) * 1000


def build(batch, capacity=768):
    from pocket_tts_tpu.config import CONFIGS_DIR, load_config
    from pocket_tts_tpu.models.flow_lm import (
        build_flow_lm_specs, init_flow_lm_params, init_flow_lm_state,
    )
    from pocket_tts_tpu.models.mimi import (
        build_mimi_specs, enable_fused_codec, init_decoder_state, init_mimi_params,
    )

    cfg = load_config(CONFIGS_DIR / "english.yaml")
    specs = build_flow_lm_specs(cfg)
    mimi_specs = build_mimi_specs(cfg.mimi)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    cast = lambda t: jax.tree.map(  # noqa: E731
        lambda x: x.astype(DTYPE) if x.dtype == jnp.float32 else x, t)
    params = cast(init_flow_lm_params(specs, k1))
    mimi_params = enable_fused_codec(mimi_specs, cast(init_mimi_params(mimi_specs, k2)))
    lm_state = init_flow_lm_state(specs, batch, capacity, DTYPE)
    mimi_state = init_decoder_state(mimi_specs, batch, DTYPE)
    return cfg, specs, mimi_specs, params, mimi_params, lm_state, mimi_state


def profile(batch):
    from pocket_tts_tpu.models.flow_lm import decode_step
    from pocket_tts_tpu.models.mimi import decoder_step, project_latent
    from pocket_tts_tpu.nn.flow_mlp import lsd_decode
    from pocket_tts_tpu.ops.codec_decode import (
        pack_decoder_params, seanet_decoder_fused,
    )
    from pocket_tts_tpu.nn.seanet import init_seanet_state, seanet_apply

    cfg, specs, mimi_specs, params, mimi_params, lm_state0, mimi_state0 = build(batch)
    ldim = specs.ldim
    B = batch
    results = {}

    # --- full fused step (BLOCK-frame scan), with and without att_len ---
    def full_factory(att_len):
        def run(params, mimi_params, lm_state, mimi_state, prev):
            def body(carry, xs):
                lm_state, mimi_state, prev = carry
                latent, eos, lm_state = decode_step(
                    specs, params, lm_state, prev, jnp.zeros((B,), bool), xs,
                    lsd_steps=1, eos_threshold=-4.0, att_len=att_len)
                denorm = latent * params["emb_std"] + params["emb_mean"]
                q = project_latent(mimi_specs, mimi_params, denorm[:, :, None])
                audio, mimi_state = decoder_step(mimi_specs, mimi_params, q, mimi_state)
                return (lm_state, mimi_state, latent), eos
            (lm_state, mimi_state, prev), eos = jax.lax.scan(
                body, (lm_state, mimi_state, prev),
                jnp.zeros((BLOCK, B, ldim), jnp.float32))
            return lm_state, mimi_state, prev
        return jax.jit(run, donate_argnums=(2, 3))

    for name, att in (("full_cap768", None), ("full_att256", 256)):
        fn = full_factory(att)
        results[name] = slope_ms(
            lambda c: fn(params, mimi_params, *c),
            lambda: (lm_state0, mimi_state0, jnp.zeros((B, ldim), jnp.float32)),
        ) / BLOCK

    # --- FlowLM decode only (incl. flow head) ---
    def lm_factory(att_len):
        def run(params, lm_state, prev):
            def body(carry, xs):
                lm_state, prev = carry
                latent, eos, lm_state = decode_step(
                    specs, params, lm_state, prev, jnp.zeros((B,), bool), xs,
                    lsd_steps=1, eos_threshold=-4.0, att_len=att_len)
                return (lm_state, latent), eos
            (lm_state, prev), _ = jax.lax.scan(
                body, (lm_state, prev), jnp.zeros((BLOCK, B, ldim), jnp.float32))
            return lm_state, prev
        return jax.jit(run, donate_argnums=(1,))

    for name, att in (("lm_cap768", None), ("lm_att256", 256)):
        fn = lm_factory(att)
        results[name] = slope_ms(
            lambda c: fn(params, *c),
            lambda: (lm_state0, jnp.zeros((B, ldim), jnp.float32)),
        ) / BLOCK

    # --- LSD flow MLP alone ---
    def flow_run(params, h, x0):
        def body(carry, _):
            return lsd_decode(specs.flow, params["flow_net"], h, carry, 1), None
        out, _ = jax.lax.scan(body, x0, None, length=BLOCK)
        return out
    flow_fn = jax.jit(flow_run)
    h = jnp.zeros((B, specs.transformer.d_model), jnp.float32)
    results["flow_mlp"] = slope_ms(
        lambda c: flow_fn(params, h, c),
        lambda: jnp.zeros((B, ldim), jnp.float32),
    ) / BLOCK

    # --- Mimi decoder step alone (transformer + SEANet fused) ---
    def mimi_run(mimi_params, mimi_state, q):
        def body(carry, _):
            mimi_state = carry
            audio, mimi_state = decoder_step(mimi_specs, mimi_params, q, mimi_state)
            return mimi_state, audio[:, 0, :1]
        mimi_state, _ = jax.lax.scan(body, mimi_state, None, length=BLOCK)
        return mimi_state
    mimi_fn = jax.jit(mimi_run, donate_argnums=(1,))
    q = jnp.zeros((B, mimi_specs.quantizer_out_dim, 1), DTYPE)
    results["mimi_step_fused"] = slope_ms(
        lambda c: mimi_fn(mimi_params, c, q), lambda: mimi_state0) / BLOCK

    # Mimi with XLA seanet (no decoder_packed)
    mimi_params_xla = {k: v for k, v in mimi_params.items() if k != "decoder_packed"}
    mimi_fn2 = jax.jit(mimi_run, donate_argnums=(1,))
    results["mimi_step_xla"] = slope_ms(
        lambda c: mimi_fn2(mimi_params_xla, c, q), lambda: mimi_state0) / BLOCK

    # --- SEANet decode alone: fused vs XLA ---
    dec = mimi_specs.decoder
    packed = pack_decoder_params(dec, mimi_params["decoder"])
    x16 = jnp.zeros((B, mimi_specs.arch.dimension, 16), DTYPE)

    def sea_fused(state):
        def body(carry, _):
            audio, carry = seanet_decoder_fused(dec, packed, x16, carry)
            return carry, audio[:, 0, :1]
        state, _ = jax.lax.scan(body, state, None, length=BLOCK)
        return state
    def sea_xla(state):
        def body(carry, _):
            audio, carry = seanet_apply(dec, mimi_params["decoder"], x16, carry)
            return carry, audio[:, 0, :1]
        state, _ = jax.lax.scan(body, state, None, length=BLOCK)
        return state
    f1 = jax.jit(sea_fused, donate_argnums=(0,))
    f2 = jax.jit(sea_xla, donate_argnums=(0,))
    results["seanet_fused"] = slope_ms(
        lambda c: f1(c), lambda: init_seanet_state(dec, B, DTYPE)) / BLOCK
    results["seanet_xla"] = slope_ms(
        lambda c: f2(c), lambda: init_seanet_state(dec, B, DTYPE)) / BLOCK

    return results


def main():
    batches = [int(a) for a in sys.argv[1:]] or [1, 32]
    print(f"device: {jax.devices()[0]}", flush=True)
    for b in batches:
        res = profile(b)
        print(f"\n=== batch {b} (ms/frame) ===", flush=True)
        for k, v in res.items():
            aps = 0.08 / (v / 1000) * b
            print(f"  {k:18s} {v:8.3f} ms  ({aps:8.1f} audio-s/s)", flush=True)


if __name__ == "__main__":
    main()
