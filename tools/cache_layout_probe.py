"""Probe: decode-attention cache-read bandwidth in two cache layouts.

Measures, over a scan of T=1 steps against a fixed KV cache:
  1. raw read ceiling — a non-hoistable full reduce of K and V per step;
  2. two-piece SDPA step in the production [B,C,H,Dh] layout;
  3. the same in head-major [B,H,C,Dh] (both einsums become per-(b,h)
     [C,Dh]-panel matmuls).
Queries depend on the previous step's output so nothing hoists out of the
loop; caches are read-only arguments (no donation). Decides whether the
StackState reorder is worth the numerics-core refactor.

Usage: python tools/cache_layout_probe.py [B] [C] [steps]
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

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
C = int(sys.argv[2]) if len(sys.argv) > 2 else 512
STEPS = int(sys.argv[3]) if len(sys.argv) > 3 else 32
L, H, Dh = 6, 16, 64
DT = jnp.bfloat16
KV_BYTES = 2 * L * B * C * H * Dh * 2  # k+v, bf16, all layers, per step


def bench(fn, args, label):
    fn = jax.jit(fn)
    out = fn(*args)
    np.asarray(out).ravel()[0]  # compile + completion barrier
    best = float("inf")
    for _ in range(3):
        t0 = time.monotonic()
        out = fn(*args)
        np.asarray(out).ravel()[0]
        best = min(best, time.monotonic() - t0)
    per_step = best / STEPS
    print(f"  {label:34s} {per_step*1e6:9.1f} us/step  "
          f"{KV_BYTES/per_step/1e9:7.0f} GB/s", flush=True)
    return per_step


def main():
    print(f"device: {jax.devices()[0]}  B={B} C={C} L={L} steps={STEPS}",
          flush=True)
    key = jax.random.PRNGKey(0)
    k0 = jax.random.normal(jax.random.fold_in(key, 1), (L, B, C, H, Dh), DT)
    v0 = jax.random.normal(jax.random.fold_in(key, 2), (L, B, C, H, Dh), DT)
    mask = jax.random.uniform(jax.random.fold_in(key, 3), (B, 1, 1, C)) > 0.1
    scale = 1.0 / (Dh ** 0.5)
    neg = jnp.finfo(jnp.float32).min

    # ---- 1. raw read ceiling (non-hoistable reduce, step-dependent) ----
    def raw(ck, cv):
        def body(s, _):
            r = jnp.sum(jnp.maximum(ck, s)) + jnp.sum(jnp.maximum(cv, s))
            return s + r * 1e-30, None
        s, _ = jax.lax.scan(body, jnp.asarray(0.0, DT), None, length=STEPS)
        return s

    bench(raw, (k0, v0), "raw full read")

    # ---- 2. attention, production [B,C,H,Dh] ----
    def att_bchd(ck, cv, h0):
        def body(h, _):
            def layer(acc, xs):
                k, v = xs
                lc = jnp.einsum("bthd,bchd->bhtc", acc, k,
                                preferred_element_type=jnp.float32) * scale
                lc = jnp.where(mask, lc, neg)
                w = jax.nn.softmax(lc, axis=-1)
                o = jnp.einsum("bhtc,bchd->bthd", w.astype(v.dtype), v,
                               preferred_element_type=jnp.float32)
                return (acc + o).astype(DT), None
            acc, _ = jax.lax.scan(layer, h, (ck, cv), unroll=True)
            return acc, None
        h, _ = jax.lax.scan(body, h0, None, length=STEPS)
        return h

    h0 = jax.random.normal(jax.random.fold_in(key, 4), (B, 1, H, Dh), DT)
    t_prod = bench(att_bchd, (k0, v0, h0), "attend [B,C,H,Dh] (production)")

    # ---- 3. attention, head-major [B,H,C,Dh] ----
    k1 = jnp.transpose(k0, (0, 1, 3, 2, 4))
    v1 = jnp.transpose(v0, (0, 1, 3, 2, 4))
    mask_h = mask  # [B,1,1,C] broadcasts identically over the head axis

    def att_bhcd(ck, cv, h0):
        def body(h, _):
            def layer(acc, xs):
                k, v = xs
                lc = jnp.einsum("bthd,bhcd->bhtc", acc, k,
                                preferred_element_type=jnp.float32) * scale
                lc = jnp.where(mask_h, lc, neg)
                w = jax.nn.softmax(lc, axis=-1)
                o = jnp.einsum("bhtc,bhcd->bthd", w.astype(v.dtype), v,
                               preferred_element_type=jnp.float32)
                return (acc + o).astype(DT), None
            acc, _ = jax.lax.scan(layer, h, (ck, cv), unroll=True)
            return acc, None
        h, _ = jax.lax.scan(body, h0, None, length=STEPS)
        return h

    t_head = bench(att_bhcd, (k1, v1, h0), "attend [B,H,C,Dh] (head-major)")
    print(f"  head-major speedup: {t_prod / t_head:.2f}x", flush=True)

    # ---- 4. int8 KV cache (+ per-(slot,head) scales): does the dequant fuse
    # into the dots, halving streamed bytes — or does XLA materialize a f32
    # cache copy per step? Decides the opt-in int8-KV serving mode. ----
    def quant_kv(x):  # [L,B,C,H,Dh] -> int8 + f32 scale [L,B,C,H]
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
        s = jnp.where(amax > 0, amax / 127.0, 1.0)
        q = jnp.clip(jnp.round(x.astype(jnp.float32) / s[..., None]),
                     -127, 127).astype(jnp.int8)
        return q, s

    kq, ks_ = quant_kv(k0)
    vq, vs_ = quant_kv(v0)

    def att_int8(ckq, cks, cvq, cvs, h0):
        def body(h, _):
            def layer(acc, xs):
                kq, ks, vq, vs = xs
                k = kq.astype(jnp.bfloat16) * ks[..., None].astype(jnp.bfloat16)
                v = vq.astype(jnp.bfloat16) * vs[..., None].astype(jnp.bfloat16)
                lc = jnp.einsum("bthd,bchd->bhtc", acc, k,
                                preferred_element_type=jnp.float32) * scale
                lc = jnp.where(mask, lc, neg)
                w = jax.nn.softmax(lc, axis=-1)
                o = jnp.einsum("bhtc,bchd->bthd", w.astype(v.dtype), v,
                               preferred_element_type=jnp.float32)
                return (acc + o).astype(DT), None
            acc, _ = jax.lax.scan(layer, h, (ckq, cks, cvq, cvs), unroll=True)
            return acc, None
        h, _ = jax.lax.scan(body, h0, None, length=STEPS)
        return h

    t_i8 = bench(att_int8, (kq, ks_, vq, vs_, h0),
                 "attend int8-KV (+scales)")
    print(f"  int8-KV speedup vs bf16: {t_prod / t_i8:.2f}x "
          f"(2x = perfect fusion, <1x = materialized dequant)", flush=True)


if __name__ == "__main__":
    main()
