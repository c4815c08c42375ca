"""Pallas TPU flash-decode kernel: single-query attention over a static KV cache.

The FlowLM autoregressive step attends one new query per row against a linear
cache of capacity C (north-star hot op). This kernel keeps the whole per-head
K/V panel in VMEM, masks by absolute position (valid slots are idx <= offset,
matching nn/attention.py's causal semantics for T=1 decode), and computes a
numerically-stable softmax in f32 — bit-matching the XLA path so it can be
swapped in under the same parity tests.

Grid: (B, H). Blocks: q [1,1,D]; K/V [1, C, 1, D] (per batch-row, per head);
offset in SMEM. For the capacities used here (<= 4 K) a single panel fits VMEM
comfortably (C x D f32 = 1 MB at C=4096, D=64), so no inner K-loop is needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_decode(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    offset: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """q: [B, H, D] (the single new query, post-rope); k/v: [B, C, H, D] (cache
    AFTER writing the new key at `offset`); offset: [B] int32. Returns [B, H, D].
    """
    B, H, D = q.shape
    C = k.shape[1]
    scale = 1.0 / (D**0.5)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H),
        in_specs=[
            pl.BlockSpec((1, 1, D), lambda b, h, off: (b, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, 1, D), lambda b, h, off: (b, 0, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, 1, D), lambda b, h, off: (b, 0, h, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, D), lambda b, h, off: (b, h, 0),
                               memory_space=pltpu.VMEM),
    )

    def wrapped(off_ref, q_ref, k_ref, v_ref, o_ref):
        b = pl.program_id(0)
        _flash_kernel_row(off_ref, q_ref, k_ref, v_ref, o_ref, b, scale)

    return pl.pallas_call(
        wrapped,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, D), q.dtype),
        interpret=interpret,
    )(offset.astype(jnp.int32), q, k, v)


def _flash_kernel_row(off_ref, q_ref, k_ref, v_ref, o_ref, b, scale):
    q = q_ref[0, 0].astype(jnp.float32)  # [D]
    k = k_ref[0, :, 0].astype(jnp.float32)  # [C, D]
    v = v_ref[0, :, 0].astype(jnp.float32)  # [C, D]
    C = k.shape[0]
    offset = off_ref[b]

    scores = jnp.sum(k * q[None, :], axis=1) * scale  # [C]
    idx = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)[:, 0]
    valid = idx <= offset
    neg = jnp.finfo(jnp.float32).min
    scores = jnp.where(valid, scores, neg)
    m = jnp.max(scores)
    e = jnp.exp(scores - m)
    denom = jnp.sum(e)
    out = jnp.sum(e[:, None] * v, axis=0) / denom  # [D]
    o_ref[0, 0] = out.astype(o_ref.dtype)
