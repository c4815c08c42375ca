"""Streaming multi-head attention over a static-capacity KV cache.

TPU-native re-design of the reference attention (/root/reference/pocket_tts/modules/
transformer.py:87-158):

* The cache is a fixed-shape array pair (k, v) of capacity C; new keys/values are
  written with per-row `lax.dynamic_update_slice` at each row's offset. No NaN
  sentinels — validity is a pure function of absolute positions.
* The mask reproduces the reference semantics exactly (`_build_attention_mask`,
  transformer.py:22-29): key valid iff pos_k >= 0 and 0 <= pos_q - pos_k (< context
  when a sliding window is configured).
* Offsets are per-row ([B] int32) — unlike the reference, which asserts equal
  offsets across the batch (transformer.py:12-14), a batch may mix utterances at
  different stream positions (heterogeneous voices/texts in one compiled step).
* Two cache layouts:
  - linear: slot i holds absolute position i (FlowLM, full causal).
  - ring:   slot i holds position i mod C (Mimi, context-bounded); capacity only
    needs to cover context + max write length.

Right-padded prompts need no extra machinery: garbage written above the true
length lands at positions > every later query position until overwritten, so the
causal mask already excludes it (offset only advances by the true length).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

import functools
import os

from pocket_tts_tpu.nn.linear import matmul_t
from pocket_tts_tpu.nn.rope import apply_rope


@functools.cache
def _use_flash_decode() -> bool:
    """Pallas decode attention, opt-in via POCKET_TTS_TPU_FLASH=1.

    Off by default: the XLA decode attention is already fast at these cache
    sizes, and the kernel's scalar-prefetch grid has shown compile stalls on
    tunneled backends. The kernel stays parity-tested (interpret mode)."""
    return os.environ.get("POCKET_TTS_TPU_FLASH") == "1"


class KVCache(NamedTuple):
    """Per-layer static KV cache. k/v: [B, C, H, Dh]."""

    k: jnp.ndarray
    v: jnp.ndarray


def init_cache(
    batch_size: int, capacity: int, num_heads: int, dim_per_head: int, dtype=jnp.float32
) -> KVCache:
    shape = (batch_size, capacity, num_heads, dim_per_head)
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))


def qkv_project(x: jnp.ndarray, in_proj, num_heads: int):
    """x: [B, T, D], in_proj: [3D, D] (torch Linear layout). Returns q, k, v [B,T,H,Dh]."""
    B, T, D = x.shape
    dh = D // num_heads
    projected = matmul_t(x, in_proj)  # [B, T, 3D]
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
    """Masked SDPA. q: [B,T,H,Dh]; k/v: [B,C,H,Dh]; pos_q: [B,T]; pos_k: [B,C]."""
    dh = q.shape[-1]
    scale = 1.0 / math.sqrt(dh)
    logits = (
        jnp.einsum("bthd,bchd->bhtc", q, k, preferred_element_type=jnp.float32) * scale
    )
    delta = pos_q[:, :, None] - pos_k[:, None, :]  # [B, T, C]
    mask = (pos_k[:, None, :] >= 0) & (delta >= 0)
    if context is not None:
        mask = mask & (delta < context)
    logits = jnp.where(mask[:, None], logits, jnp.finfo(logits.dtype).min)
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhtc,bchd->bthd", weights.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(v.dtype)


def _write_linear(cache: jnp.ndarray, new: jnp.ndarray, offset: jnp.ndarray) -> jnp.ndarray:
    """Per-row dynamic_update_slice at each row's offset. cache: [B,C,H,Dh]."""
    new = new.astype(cache.dtype)
    return jax.vmap(
        lambda c, n, o: jax.lax.dynamic_update_slice(c, n, (o, 0, 0))
    )(cache, new, offset)


def _write_ring(cache: jnp.ndarray, new: jnp.ndarray, offset: jnp.ndarray) -> jnp.ndarray:
    """Wrap-around write at offset % C.

    Fast path: when the write length divides the capacity (the streaming codec
    always writes aligned 16-step blocks into a capacity chosen as a multiple of
    16, models/mimi.py), a block can never straddle the wrap point, so the write
    is a single dynamic_update_slice. Otherwise fall back to roll-write-unroll
    (two full-cache rewrites — avoid by sizing capacities accordingly).
    """
    new = new.astype(cache.dtype)
    C = cache.shape[1]
    T = new.shape[1]

    if C % T == 0:
        def one(c, n, o):
            return jax.lax.dynamic_update_slice(c, n, (jnp.mod(o, C), 0, 0))
    else:
        def one(c, n, o):
            slot = jnp.mod(o, C)
            rolled = jnp.roll(c, -slot, axis=0)
            rolled = jax.lax.dynamic_update_slice(rolled, n, (0, 0, 0))
            return jnp.roll(rolled, slot, axis=0)

    return jax.vmap(one)(cache, new, offset)


def ring_positions(offset: jnp.ndarray, T: int, capacity: int) -> jnp.ndarray:
    """Absolute position per ring slot after writing T entries at `offset` [B].

    Slot s holds the most recent position p < offset+T with p % C == s, or -1."""
    idx = jnp.arange(capacity, dtype=jnp.int32)
    total = (offset + T)[:, None]  # [B, 1]
    last = total - 1 - jnp.mod(total - 1 - idx[None, :], capacity)
    return jnp.where(last >= 0, last, -1)


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
    att_len: int | None = None,
) -> tuple[jnp.ndarray, KVCache]:
    """One streaming attention call: project, rope, write cache, attend, project out.

    x: [B, T, D]; offset: [B] int32 — absolute position of x[:, 0] per row.
    `att_len` (static, linear caches only): attend over just the first att_len
    slots — a host-chosen bucket >= the write watermark. Cuts KV reads from
    O(capacity) to O(valid prefix) without changing numerics (slots beyond the
    watermark are masked out anyway).
    """
    B, T, D = x.shape
    C = cache.k.shape[1]
    q, k, v = qkv_project(x, in_proj, num_heads)
    q, k = apply_rope(q, k, offset=offset, max_period=max_period)

    if ring:
        new_k = _write_ring(cache.k, k, offset)
        new_v = _write_ring(cache.v, v, offset)
        pos_k = ring_positions(offset, T, C)
    else:
        new_k = _write_linear(cache.k, k, offset)
        new_v = _write_linear(cache.v, v, offset)
        pos_k = jnp.broadcast_to(jnp.arange(C, dtype=jnp.int32), (B, C))

    att_k, att_v, att_pos_k = new_k, new_v, pos_k
    if att_len is not None and not ring and att_len < C:
        att_k = new_k[:, :att_len]
        att_v = new_v[:, :att_len]
        att_pos_k = pos_k[:, :att_len]

    if T == 1 and context is None and not ring and _use_flash_decode():
        # single-query decode over the linear cache: one Pallas kernel instead
        # of the logits/mask/softmax/weighted-sum kernel chain
        from pocket_tts_tpu.ops.flash_decode import flash_decode

        out = flash_decode(q[:, 0], att_k, att_v, offset)[:, None]
    else:
        pos_q = offset[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
        out = attend(q, att_k, att_v, pos_q, att_pos_k, context)
    out = out.reshape(B, T, D)
    return matmul_t(out, out_proj), KVCache(new_k, new_v)
