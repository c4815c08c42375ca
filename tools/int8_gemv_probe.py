"""Probe: effective HBM streaming rate of b1 GEMV formulations on the real chip.

Round-4 decomposition showed the 24l int8 lm-only step runs at ~68% of the
measured 440 GB/s streaming ceiling while bf16 runs at ~92% — the deficit is
specific to the int8-dequant dot (`x @ Wq.T.astype(bf16) * s`). This probe
measures isolated formulations over a stacked [L, O, I] weight scanned like the
real decode layer scan, so the winner can be wired into nn/linear.matmul_t or
justify a fused Pallas decode kernel.

Variants:
  bf16      x @ W.T                                   (reference efficiency)
  int8cvt   (x @ Wq.T.astype(bf16)) * s               (current production path)
  int8dyn   per-token dynamic: xq int8, int8@int8->int32, rescale (MXU-native)
  pallas    double-buffered Pallas kernel streaming Wq in O-chunks

Usage: python tools/int8_gemv_probe.py [rows]
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

L, O, I = 48, 4096, 1024  # 48 stacked [4096,1024] = one 24l model's FFN halves
REPS = 8  # scans per dispatch chain


def bench(fn, args, label, traffic_bytes, trials=3):
    """Per-application time via a LARGE-n slope: find n where chain(n) runs
    ~2 s, then slope = (chain(2n) - chain(n)) / n. Both walls are seconds
    while the tunnel RTT jitters tens of ms, so the bias is <3%. (Small-n
    slopes or single short runs measure the RTT, not the kernel.)"""

    def chain(n):
        x = args[0]
        t0 = time.monotonic()
        for _ in range(n):
            x = fn(x, *args[1:])
        np.asarray(jax.tree.leaves(x)[0]).ravel()[:1]  # completion barrier
        return time.monotonic() - t0

    chain(1); chain(1)  # compile + warm
    n = 1
    while chain(n) < 2.0 and n < 4096:
        n *= 2
    ts = [(chain(2 * n) - chain(n)) / n for _ in range(trials)]
    wall = sorted(ts)[len(ts) // 2]
    gbs = traffic_bytes / wall / 1e9
    print(f"  {label:12s} n={n:4d} {wall*1e3:8.2f} ms/app  {gbs:7.1f} GB/s",
          flush=True)
    return gbs


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    rng = np.random.default_rng(0)
    Wq = jnp.asarray(rng.integers(-127, 127, (L, O, I), dtype=np.int8))
    s = jnp.asarray(rng.random((L, O), dtype=np.float32))
    Wb = (Wq.astype(jnp.bfloat16) * s[..., None].astype(jnp.bfloat16))
    x0 = jnp.asarray(rng.standard_normal((rows, I)), jnp.bfloat16)
    print(f"device: {jax.devices()[0]}  rows={rows}", flush=True)
    int8_traffic = REPS * L * O * I
    bf16_traffic = 2 * int8_traffic

    # layer scans are UNROLLED, matching decode_step's unroll=True (a rolled
    # scan dynamic-slices the stacked weight per iteration and loses 5x)
    @jax.jit
    def run_bf16(x, W):
        def rep(x, _):
            def body(c, w):
                y = c @ w.reshape(O, I).T
                return jnp.tanh(y[:, :I]), None
            c, _ = jax.lax.scan(body, x, W, unroll=True)
            return c, None
        x, _ = jax.lax.scan(rep, x, None, length=REPS)
        return x

    @jax.jit
    def run_int8cvt(x, Wq, s):
        def rep(x, _):
            def body(c, ws):
                w, sc = ws
                y = (c @ w.reshape(O, I).T.astype(c.dtype)) * sc
                return jnp.tanh(y[:, :I].astype(jnp.bfloat16)), None
            c, _ = jax.lax.scan(body, x, (Wq, s), unroll=True)
            return c, None
        x, _ = jax.lax.scan(rep, x, None, length=REPS)
        return x

    @jax.jit
    def run_int8dyn(x, Wq, s):
        def rep(x, _):
            def body(c, ws):
                w, sc = ws
                amax = jnp.max(jnp.abs(c), axis=-1, keepdims=True)
                sx = jnp.maximum(amax.astype(jnp.float32) / 127.0, 1e-8)
                cq = jnp.clip(
                    jnp.round(c.astype(jnp.float32) / sx), -127, 127
                ).astype(jnp.int8)
                y = jax.lax.dot_general(
                    cq, w.reshape(O, I),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                y = y.astype(jnp.float32) * sx * sc
                return jnp.tanh(y[:, :I].astype(jnp.bfloat16)), None
            c, _ = jax.lax.scan(body, x, (Wq, s), unroll=True)
            return c, None
        x, _ = jax.lax.scan(rep, x, None, length=REPS)
        return x

    bench(lambda x: run_bf16(x, Wb), (x0,), "bf16", bf16_traffic)
    bench(lambda x: run_int8cvt(x, Wq, s), (x0,), "int8cvt", int8_traffic)
    bench(lambda x: run_int8dyn(x, Wq, s), (x0,), "int8dyn", int8_traffic)

    # --- Pallas streaming kernel: grid (layer, O-chunk), auto-pipelined ---
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    BO = 1024

    def kernel(x_ref, w_ref, s_ref, o_ref):
        j = pl.program_id(1)
        y = jax.lax.dot_general(
            x_ref[:], w_ref[0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0] = y * s_ref[0, 0, pl.ds(j * BO, BO)]

    def gemv_stack(x, Wq, s):
        return pl.pallas_call(
            kernel,
            grid=(L, O // BO),
            in_specs=[
                pl.BlockSpec((rows, I), lambda l, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BO, I), lambda l, j: (l, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, O), lambda l, j: (l, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, rows, BO), lambda l, j: (l, 0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((L, rows, O), jnp.float32),
        )(x, Wq, s[:, None, :])

    @jax.jit
    def run_pallas(x, Wq, s):
        def rep(x, _):
            ys = gemv_stack(x, Wq, s)  # [L, rows, O]
            return jnp.tanh(ys[-1, :, :I].astype(jnp.bfloat16)), None
        x, _ = jax.lax.scan(rep, x, None, length=REPS)
        return x

    try:
        bench(lambda x: run_pallas(x, Wq, s), (x0,), "pallas", int8_traffic)
    except Exception as e:
        print(f"  pallas failed: {e}", flush=True)


if __name__ == "__main__":
    main()
