"""Streaming multi-head attention over a static-capacity KV cache.

TPU-native re-design of the reference attention (/root/reference/pocket_tts/modules/
transformer.py:87-158):

* The cache is a fixed-shape array pair (k, v) of capacity C; new keys/values are
  written with `lax.dynamic_update_slice` at the current offset. No NaN sentinels —
  validity is a pure function of absolute positions.
* The mask reproduces the reference semantics exactly (`_build_attention_mask`,
  transformer.py:22-29): key valid iff pos_k >= 0 and 0 <= pos_q - pos_k (< context
  when a sliding window is configured).
* Two cache layouts:
  - linear: slot i holds absolute position i (FlowLM, full causal). pos_k == iota.
  - ring:   slot i holds position `pos` array entry (Mimi, context-bounded);
    capacity only needs to cover context + max write length.

Right-padded prompts need no extra machinery: garbage written above the true
length lands at positions > every later query position until overwritten, so the
causal mask already excludes it (offset only advances by the true length).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pocket_tts_tpu.nn.rope import apply_rope


class KVCache(NamedTuple):
    """Per-layer static KV cache. k/v: [B, C, H, Dh]."""

    k: jnp.ndarray
    v: jnp.ndarray


def init_cache(
    batch_size: int, capacity: int, num_heads: int, dim_per_head: int, dtype=jnp.float32
) -> KVCache:
    shape = (batch_size, capacity, num_heads, dim_per_head)
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))


def qkv_project(x: jnp.ndarray, in_proj: jnp.ndarray, num_heads: int):
    """x: [B, T, D], in_proj: [3D, D] (torch Linear layout). Returns q, k, v [B,T,H,Dh]."""
    B, T, D = x.shape
    dh = D // num_heads
    projected = x @ in_proj.T  # [B, T, 3D]
    packed = projected.reshape(B, T, 3, num_heads, dh)
    return packed[:, :, 0], packed[:, :, 1], packed[:, :, 2]


def attend(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    pos_q: jnp.ndarray,
    pos_k: jnp.ndarray,
    context: int | None,
) -> jnp.ndarray:
    """Masked SDPA. q: [B,T,H,Dh]; k/v: [B,C,H,Dh]; pos_q: [T]; pos_k: [C]."""
    dh = q.shape[-1]
    scale = 1.0 / math.sqrt(dh)
    logits = jnp.einsum("bthd,bchd->bhtc", q, k) * scale
    delta = pos_q[:, None] - pos_k[None, :]  # [T, C]
    mask = (pos_k[None, :] >= 0) & (delta >= 0)
    if context is not None:
        mask = mask & (delta < context)
    logits = jnp.where(mask[None, None], logits, jnp.finfo(logits.dtype).min)
    weights = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhtc,bchd->bthd", weights, v)


def mha_step(
    in_proj: jnp.ndarray,
    out_proj: jnp.ndarray,
    x: jnp.ndarray,
    cache: KVCache,
    offset: jnp.ndarray,
    *,
    num_heads: int,
    context: int | None,
    max_period: float,
    ring: bool = False,
) -> tuple[jnp.ndarray, KVCache]:
    """One streaming attention call: project, rope, write cache, attend, project out.

    x: [B, T, D]; offset: scalar int32 — absolute position of x[:, 0].
    With `ring=True` the write index wraps modulo capacity (context-bounded
    attention only); otherwise writes are linear and capacity bounds total length.
    """
    B, T, D = x.shape
    C = cache.k.shape[1]
    q, k, v = qkv_project(x, in_proj, num_heads)
    q, k = apply_rope(q, k, offset=offset, max_period=max_period)

    if ring:
        slot = jnp.mod(offset, C)
        # Two-piece write to handle wrap-around with static shapes: roll the cache
        # so the write lands at a fixed index, write, roll back.
        rolled_k = jnp.roll(cache.k, -slot, axis=1)
        rolled_v = jnp.roll(cache.v, -slot, axis=1)
        rolled_k = jax.lax.dynamic_update_slice(rolled_k, k, (0, 0, 0, 0))
        rolled_v = jax.lax.dynamic_update_slice(rolled_v, v, (0, 0, 0, 0))
        new_k = jnp.roll(rolled_k, slot, axis=1)
        new_v = jnp.roll(rolled_v, slot, axis=1)
        # Absolute position held by each slot after this write. Slot s holds the
        # most recent position p <= offset+T-1 with p % C == s, or -1 if none yet.
        idx = jnp.arange(C, dtype=jnp.int32)
        total = offset + T  # number of positions written so far
        last = total - 1 - jnp.mod(jnp.mod(total - 1 - idx, C), C)
        pos_k = jnp.where(last >= 0, last, -1)
    else:
        new_k = jax.lax.dynamic_update_slice(cache.k, k, (0, offset, 0, 0))
        new_v = jax.lax.dynamic_update_slice(cache.v, v, (0, offset, 0, 0))
        pos_k = jnp.arange(C, dtype=jnp.int32)

    pos_q = offset + jnp.arange(T, dtype=jnp.int32)
    out = attend(q, new_k, new_v, pos_q, pos_k, context)
    out = out.reshape(B, T, D)
    return out @ out_proj.T, KVCache(new_k, new_v)
