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


def flash_decode(dtype, batch: int, capacity: int):
    """Pallas flash-decode vs the XLA two-piece SDPA it replaces."""
    from pocket_tts_tpu.ops.flash_decode import flash_decode_ref, flash_decode_tpu

    H, D = 16, 64
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (batch, H, 1, D)).astype(dtype)
    k = jax.random.normal(ks[1], (batch, H, capacity, D)).astype(dtype)
    v = jax.random.normal(ks[2], (batch, H, capacity, D)).astype(dtype)
    pos = jnp.broadcast_to(jnp.arange(capacity)[None, :], (batch, capacity))
    pos = jnp.where(pos < capacity - 13, pos, -1)  # some dead slots
    qpos = jnp.full((batch,), capacity - 20, jnp.int32)
    got = jax.jit(flash_decode_tpu)(q, k, v, pos, qpos)
    want = jax.jit(flash_decode_ref)(q, k, v, pos, qpos)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), **_tol(dtype))


def int8_gemv(batch: int):
    """Pallas int8 GEMV vs the XLA dequant-matmul."""
    from pocket_tts_tpu.ops.gemv import gemv_int8_ref, gemv_int8_tpu

    key = jax.random.PRNGKey(0)
    w = jax.random.randint(key, (4096, 1024), -127, 127, jnp.int8)
    scale = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (4096,))) * 0.01
    x = jax.random.normal(jax.random.PRNGKey(2), (batch, 1024)).astype(jnp.bfloat16)
    got = jax.jit(gemv_int8_tpu)(x, w, scale)
    want = jax.jit(gemv_int8_ref)(x, w, scale)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), rtol=2e-2, atol=2e-2)


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

    # flash-decode / GEMV gates are optional: only gate what exists & is wired
    try:
        from pocket_tts_tpu.ops import flash_decode as _fd  # noqa: F401

        have_fd = hasattr(_fd, "flash_decode_tpu") and hasattr(_fd, "flash_decode_ref")
    except ImportError:
        have_fd = False
    if have_fd:
        for b, cap in ((1, 768), (32, 768), (1, 4096)):
            check(f"flash_decode[bf16 b{b} cap{cap}]",
                  lambda b=b, c=cap: flash_decode(jnp.bfloat16, b, c))

    try:
        from pocket_tts_tpu.ops import gemv as _g  # noqa: F401

        have_g = hasattr(_g, "gemv_int8_tpu") and hasattr(_g, "gemv_int8_ref")
    except ImportError:
        have_g = False
    if have_g:
        for b in (1, 8):
            check(f"int8_gemv[b{b}]", lambda b=b: int8_gemv(b))

    if FAILURES:
        print(f"\n{len(FAILURES)} kernel gate(s) FAILED: {FAILURES}", flush=True)
        sys.exit(1)
    print("\nall kernel gates passed", flush=True)


if __name__ == "__main__":
    main()
