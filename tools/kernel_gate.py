"""On-device, production-dtype gate for every Pallas kernel.

Round 1 shipped a fused codec kernel validated only in f32 interpret mode while
production enabled it only in bf16 compiled — and bf16 compiled didn't lower on
v5e Mosaic (BENCH_r01 value: 0.0). This gate closes that class of bug: each
kernel is COMPILED (not interpreted) on the real TPU in the exact dtype/batch
configurations the serving path enables it for, and parity-checked against its
XLA twin.

Usage: python tools/kernel_gate.py          # exits non-zero on any failure
Run before any snapshot; bench.py runs it implicitly by exercising the same
compiled paths, but this gives per-kernel pass/fail lines.
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

FAILURES: list[str] = []


def check(name: str, fn):
    t0 = time.monotonic()
    try:
        fn()
        print(f"PASS {name} ({time.monotonic() - t0:.1f}s)", flush=True)
    except Exception as e:  # noqa: BLE001 — report and continue to next kernel
        FAILURES.append(name)
        msg = str(e).splitlines()
        head = msg[0] if msg else repr(e)
        print(f"FAIL {name}: {head}", flush=True)


def _tol(dtype):
    return dict(rtol=2e-2, atol=2e-2) if dtype == jnp.bfloat16 else dict(rtol=2e-5, atol=2e-5)


def fused_codec(dtype, batch: int):
    """Fused SEANet decoder vs the XLA op program, flagship decoder shapes."""
    from pocket_tts_tpu.config import CONFIGS_DIR, load_config
    from pocket_tts_tpu.models.mimi import build_mimi_specs
    from pocket_tts_tpu.nn.seanet import (
        init_seanet_params,
        init_seanet_state,
        seanet_apply,
    )
    from pocket_tts_tpu.ops.codec_decode import (
        decoder_is_fusable,
        pack_decoder_params,
        seanet_decoder_fused,
    )

    cfg = load_config(CONFIGS_DIR / "english.yaml")
    specs = build_mimi_specs(cfg.mimi)
    dec = specs.decoder
    assert decoder_is_fusable(dec)
    key = jax.random.PRNGKey(0)
    params = jax.tree.map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x,
        init_seanet_params(dec, key),
    )
    packed = pack_decoder_params(dec, params)
    x = (jax.random.normal(jax.random.PRNGKey(1), (batch, specs.arch.dimension, 16))
         * 0.5).astype(dtype)
    state = init_seanet_state(dec, batch, dtype)

    fused = jax.jit(lambda x, s: seanet_decoder_fused(dec, packed, x, s,
                                                      interpret=False))
    ref = jax.jit(lambda x, s: seanet_apply(dec, params, x, s))
    # two chained frames so streaming state round-trips through the kernel
    got, gs = fused(x, state)
    want, ws = ref(x, state)
    got2, _ = fused(got[:, :, -16:] * 0 + x, gs)  # reuse x as frame 2 input
    want2, _ = ref(want[:, :, -16:] * 0 + x, ws)
    for g, w in ((got, want), (got2, want2)):
        np.testing.assert_allclose(np.asarray(g, np.float32),
                                   np.asarray(w, np.float32), **_tol(dtype))


def f32_routing():
    """f32 Mimi params must never enable the fused kernel (VMEM: f32 weights
    alone are 17 MB; the serving switch keys on weight dtype)."""
    from pocket_tts_tpu.pipeline.tts import _use_fused_codec

    class _W:
        dtype = jnp.float32

    assert not _use_fused_codec({"decoder": {"0": type("P", (), {"weight": _W()})()}})


def flash_decode(dtype, batch: int, capacity: int, att_len: int | None = None):
    """Pallas flash-decode vs its XLA twin (= the production two-piece SDPA;
    tests/test_flash_decode.py proves the twin matches attend_cached)."""
    from pocket_tts_tpu.ops.flash_decode import flash_decode_ref, flash_decode_tpu

    H, D = 16, 64
    rng = np.random.default_rng(capacity + batch)
    q = jnp.asarray(rng.standard_normal((batch, H, D)), dtype)
    k = jnp.asarray(rng.standard_normal((batch, capacity, H, D)), dtype)
    v = jnp.asarray(rng.standard_normal((batch, capacity, H, D)), dtype)
    kn = jnp.asarray(rng.standard_normal((batch, H, D)), dtype)
    vn = jnp.asarray(rng.standard_normal((batch, H, D)), dtype)
    # append-ordered pos map with dead slots and heterogeneous per-row offsets
    lim = att_len or capacity
    pos = np.full((batch, capacity), -1, np.int32)
    offset = np.zeros((batch,), np.int32)
    for b in range(batch):
        fill = int(lim * (0.3 + 0.6 * b / max(batch - 1, 1)))
        p = 0
        for c in range(fill):
            if c % 7 == 6:
                continue
            pos[b, c] = p
            p += 1
        offset[b] = p
    pos, offset = jnp.asarray(pos), jnp.asarray(offset)
    got = jax.jit(flash_decode_tpu, static_argnames=("att_len",))(
        q, k, v, kn, vn, pos, offset, att_len=att_len)
    want = jax.jit(flash_decode_ref)(q, k, v, kn, vn, pos, offset)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), **_tol(dtype))


def gemv(batch: int, quant: bool):
    """Pallas weight-streaming GEMV (plain + int8 dict) vs the XLA matmul."""
    from pocket_tts_tpu.nn.linear import matmul_t
    from pocket_tts_tpu.ops.gemv import gemv_t

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((batch, 1024)), jnp.bfloat16)
    if quant:
        w = {
            "q": jnp.asarray(rng.integers(-127, 128, (4096, 1024)), jnp.int8),
            "s": jnp.asarray(np.abs(rng.standard_normal((4096,))) * 0.01,
                             jnp.float32),
        }
    else:
        w = jnp.asarray(rng.standard_normal((4096, 1024)) * 0.02, jnp.bfloat16)
    got = gemv_t(x, w)
    want = matmul_t(x, w)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), rtol=2e-2, atol=2e-2)


def decode_stack(quant: bool, C: int, L: int = 4):
    """Fused whole-stack decode kernel vs the XLA scan, compiled on device in
    the exact configurations the serving path routes to it (bf16 cache,
    bf16/int8 weights, flagship geometry, C <= 1024). Checks h, the in-kernel
    appended row, and that every other cache slot is untouched."""
    from pocket_tts_tpu.nn.transformer import (
        StackState,
        TransformerConfig,
        init_layer_params,
        transformer_apply,
    )
    from pocket_tts_tpu.ops.decode_stack import (
        decode_stack_apply,
        pack_decode_stack,
    )
    from pocket_tts_tpu.quant import quantize_weight

    cfg = TransformerConfig(d_model=1024, num_heads=16, num_layers=L,
                            dim_feedforward=4096)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16),
        init_layer_params(cfg, jax.random.PRNGKey(1)),
    )
    if quant:
        for k in ("in_proj", "out_proj", "w1", "w2"):
            params[k] = quantize_weight(params[k])
    packed = pack_decode_stack(cfg, params)
    assert packed is not None

    rng = np.random.default_rng(0)
    offset = C // 2
    n_filled = offset + 5
    pos = np.full((1, C), -1, np.int32)
    pos[0, :n_filled] = np.arange(n_filled)
    pos[0, 3] = -1  # dead slot
    state = StackState(
        k=jnp.asarray(rng.standard_normal((L, 1, C, 16, 64)) * 0.5, jnp.bfloat16),
        v=jnp.asarray(rng.standard_normal((L, 1, C, 16, 64)) * 0.5, jnp.bfloat16),
        pos=jnp.asarray(pos),
        offset=jnp.asarray([offset], jnp.int32),
        write_pos=jnp.asarray(n_filled, jnp.int32),
    )
    x = jnp.asarray(rng.standard_normal((1, 1, 1024)) * 0.3, jnp.bfloat16)
    slot = n_filled
    h_ref, st_ref = jax.jit(
        lambda p, x, s: transformer_apply(cfg, p, x, s, unroll=True)
    )(params, x, state)
    h_k, st_k = decode_stack_apply(cfg, packed, x, state, interpret=False)
    np.testing.assert_allclose(np.asarray(h_k, np.float32),
                               np.asarray(h_ref, np.float32),
                               rtol=5e-2, atol=5e-2)
    np.testing.assert_allclose(
        np.asarray(st_k.k[:, :, slot], np.float32),
        np.asarray(st_ref.k[:, :, slot], np.float32), rtol=5e-2, atol=5e-2)
    other = np.arange(C) != slot
    assert np.array_equal(np.asarray(st_k.k[:, :, other]),
                          np.asarray(st_ref.k[:, :, other]))
    assert np.array_equal(np.asarray(st_k.pos), np.asarray(st_ref.pos))


def main():
    print(f"backend: {jax.default_backend()}, device: {jax.devices()[0]}",
          flush=True)
    if jax.default_backend() == "cpu":
        print("WARNING: running on CPU — this does NOT validate Mosaic lowering",
              flush=True)

    # production enables the fused codec for bf16 at ANY batch (BATCH_TILE-row
    # grid); f32 always routes to the XLA op program (_use_fused_codec), so the
    # f32 gate checks the routing rather than compiling a never-enabled kernel.
    for b in (1, 4, 8, 32):
        check(f"fused_codec[bfloat16 b{b}]", lambda b=b: fused_codec(jnp.bfloat16, b))
    check("fused_codec[f32 routes to XLA]", f32_routing)

    # every named kernel is checked unconditionally: a missing symbol is a
    # FAIL (raised inside check()), never a silent skip
    for b, cap, att in ((1, 768, None), (32, 768, None), (1, 4096, None),
                        (32, 768, 384)):
        label = f"flash_decode[bf16 b{b} cap{cap}" + (f" att{att}]" if att else "]")
        check(label, lambda b=b, c=cap, a=att: flash_decode(jnp.bfloat16, b, c, a))

    for b, quant in ((1, False), (1, True), (8, True)):
        check(f"gemv[b{b} {'int8' if quant else 'bf16'}]",
              lambda b=b, q=quant: gemv(b, q))

    # decode-stack: the b1 production route for both weight dtypes, at a
    # growth bucket and at the kernel's capacity limit
    for quant, C in ((False, 256), (True, 256), (True, 512), (True, 1024)):
        check(f"decode_stack[{'int8' if quant else 'bf16'} C{C}]",
              lambda q=quant, C=C: decode_stack(q, C))

    if FAILURES:
        print(f"\n{len(FAILURES)} kernel gate(s) FAILED: {FAILURES}", flush=True)
        sys.exit(1)
    print("\nall kernel gates passed", flush=True)


if __name__ == "__main__":
    main()
