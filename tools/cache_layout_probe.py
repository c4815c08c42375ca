"""Probe: decode-attention cache-read bandwidth in two cache layouts.

The r4 lmbw probe measured the production cache stream at ~211 GB/s (vs ~819
peak). This isolates the attention read: a scan of T=1 two-piece SDPA steps
over a [B,C,H,Dh] cache (production layout) vs a [B,H,C,Dh] cache (head-major:
both einsums become natural per-(b,h) [C,Dh] panel matmuls), plus the full
layer step (qkv + rope + append) in both layouts. Decides the StackState
reorder before touching the numerics core.

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
STEPS = int(sys.argv[3]) if len(sys.argv) > 3 else 64
L, H, Dh = 6, 16, 64
DT = jnp.bfloat16


def run(fn, carry, label, bytes_per_step):
    fn = jax.jit(fn, donate_argnums=(0,))
    carry = fn(carry)  # compile
    np.asarray(jax.tree.leaves(carry)[0]).ravel()[0]
    best = float("inf")
    for _ in range(3):
        t0 = time.monotonic()
        carry = fn(carry)
        np.asarray(jax.tree.leaves(carry)[0]).ravel()[0]
        best = min(best, time.monotonic() - t0)
    per_step = best / STEPS
    print(f"  {label:34s} {per_step*1e6:9.1f} us/step  "
          f"{bytes_per_step/per_step/1e9:7.0f} GB/s", flush=True)
    return per_step


def main():
    print(f"device: {jax.devices()[0]}  B={B} C={C} L={L} steps={STEPS}",
          flush=True)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    scale = 1.0 / (Dh ** 0.5)
    neg = jnp.finfo(jnp.float32).min
    kv_bytes = 2 * L * B * C * H * Dh * 2  # k+v, bf16, all layers

    q0 = jax.random.normal(ks[2], (L, B, 1, H, Dh), DT)
    mask = (jax.random.uniform(ks[3], (B, 1, 1, C)) > 0.1)

    # ---- attention read only, [B, C, H, Dh] (production layout) ----
    cache_bchd = (jax.random.normal(ks[0], (L, B, C, H, Dh), DT),
                  jax.random.normal(ks[1], (L, B, C, H, Dh), DT))

    def att_bchd(carry):
        ck, cv, q = carry
        def body(h, _):
            def layer(acc, xs):
                k, v, qq = xs
                lc = jnp.einsum("bthd,bchd->bhtc", qq, k,
                                preferred_element_type=jnp.float32) * scale
                lc = jnp.where(mask, lc, neg)
                w = jax.nn.softmax(lc, axis=-1)
                o = jnp.einsum("bhtc,bchd->bthd", w.astype(v.dtype), v,
                               preferred_element_type=jnp.float32)
                return acc + o.astype(DT), None
            acc, _ = jax.lax.scan(layer, h, (ck, cv, q), unroll=True)
            return acc, None
        out, _ = jax.lax.scan(body, jnp.zeros((B, 1, H, Dh), DT), None,
                              length=STEPS)
        return ck, cv, q + out[None] * 1e-6  # keep q live

    t_bchd = run(att_bchd, (cache_bchd[0], cache_bchd[1], q0),
                 "attend [B,C,H,Dh] (production)", kv_bytes)

    # ---- attention read only, [B, H, C, Dh] (head-major) ----
    cache_bhcd = (jnp.transpose(cache_bchd[0], (0, 1, 3, 2, 4)),
                  jnp.transpose(cache_bchd[1], (0, 1, 3, 2, 4)))

    def att_bhcd(carry):
        ck, cv, q = carry
        def body(h, _):
            def layer(acc, xs):
                k, v, qq = xs
                lc = jnp.einsum("bthd,bhcd->bhtc", qq, k,
                                preferred_element_type=jnp.float32) * scale
                lc = jnp.where(mask, lc, neg)
                w = jax.nn.softmax(lc, axis=-1)
                o = jnp.einsum("bhtc,bhcd->bthd", w.astype(v.dtype), v,
                               preferred_element_type=jnp.float32)
                return acc + o.astype(DT), None
            acc, _ = jax.lax.scan(layer, h, (ck, cv, q), unroll=True)
            return acc, None
        out, _ = jax.lax.scan(body, jnp.zeros((B, 1, H, Dh), DT), None,
                              length=STEPS)
        return ck, cv, q + out[None] * 1e-6

    t_bhcd = run(att_bhcd, (cache_bhcd[0], cache_bhcd[1], q0),
                 "attend [B,H,C,Dh] (head-major)", kv_bytes)

    # ---- with the append write in the loop (in-place dus pressure) ----
    def att_bchd_write(carry):
        ck, cv, q, slot = carry
        def body(c, _):
            h, slot = c
            def layer(acc, xs):
                k, v, qq = xs
                lc = jnp.einsum("bthd,bchd->bhtc", qq, k,
                                preferred_element_type=jnp.float32) * scale
                lc = jnp.where(mask, lc, neg)
                w = jax.nn.softmax(lc, axis=-1)
                o = jnp.einsum("bhtc,bchd->bthd", w.astype(v.dtype), v,
                               preferred_element_type=jnp.float32)
                return acc + o.astype(DT), None
            acc, _ = jax.lax.scan(layer, h, (ck, cv, q), unroll=True)
            return (acc, slot), None
        (out, slot), _ = jax.lax.scan(body, (jnp.zeros((B, 1, H, Dh), DT), slot),
                                      None, length=STEPS)
        ck = jax.lax.dynamic_update_slice(
            ck, out[None].astype(DT).transpose(0, 1, 2, 3, 4)[:1] *
            jnp.ones((L, 1, 1, 1, 1), DT), (0, 0, slot % C, 0, 0))
        return ck, cv, q + out[None] * 1e-6, slot + 1

    t_w = run(att_bchd_write,
              (cache_bchd[0], cache_bchd[1], q0, jnp.asarray(0, jnp.int32)),
              "attend+append [B,C,H,Dh]", kv_bytes)

    print(f"  head-major speedup: {t_bchd / t_bhcd:.2f}x", flush=True)


if __name__ == "__main__":
    main()
