"""Streaming multi-head attention over a static-capacity, append-ordered KV cache.

TPU-native re-design of the reference attention (/root/reference/pocket_tts/modules/
transformer.py:87-158):

* The cache is a fixed-shape array pair (k, v) of capacity C plus an explicit
  per-slot position map `pos` [B, C] (absolute position stored in each slot,
  -1 = empty/padding). Slots are filled in APPEND ORDER at a write pointer
  shared by every batch row; each row's true stream position lives in `pos`.
  Decoupling slot from position is what makes batched decode fast: the write is
  a single shared-index `dynamic_update_slice` (in-place on donated buffers /
  loop carries) instead of a per-row scatter, which XLA lowers to a serialized
  per-row loop on TPU (~12 ms/step at batch 32 for the 6-layer cache).
* No NaN sentinels — validity is `pos >= 0`; the mask reproduces the reference
  semantics exactly (`_build_attention_mask`, transformer.py:22-29): key valid
  iff pos_k >= 0 and 0 <= pos_q - pos_k (< context for sliding windows).
* Attention is two-piece: logits over the (read-only) cache and over the
  current in-block keys are computed separately and softmaxed jointly, so the
  cache is never concatenated with (or rewritten to include) the new block.
  The caller appends the new K/V outside the layer scan — see
  nn/transformer.transformer_apply.
* Offsets are per-row ([B] int32) — unlike the reference, which asserts equal
  offsets across the batch (transformer.py:12-14), a batch may mix utterances
  at different stream positions (heterogeneous voices/texts in one step).

Right-padded prompts: in-block garbage keys claim positions offset + t with
t >= true_len, which exceed every valid query position in the block (causal
mask excludes them); their cache slots are stored with pos = -1 so no later
query ever attends them.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from pocket_tts_tpu.nn.linear import matmul_t
from pocket_tts_tpu.nn.rope import apply_rope, rotate


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
    """Single-piece masked SDPA (reference implementation; the production path
    is `attend_cached`). q: [B,T,H,Dh]; k/v: [B,C,H,Dh]; pos_q: [B,T]; pos_k: [B,C]."""
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


def decode_masks(
    pos_cache: jnp.ndarray,
    offset: jnp.ndarray,
    T: int,
    context: int | None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Attention masks for one step, shared by every layer in the stack.

    Returns (mask_cache [B,1,T,Ca], mask_self [B,1,T,T]) for queries at
    positions offset + 0..T-1 over cache slots (`pos_cache` [B,Ca]) and the
    in-block keys (whose positions equal the query positions)."""
    pos_q = offset[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
    dc = pos_q[:, :, None] - pos_cache[:, None, :]  # [B,T,Ca]
    mc = (pos_cache[:, None, :] >= 0) & (dc >= 0)
    ds = pos_q[:, :, None] - pos_q[:, None, :]  # [B,T,T]
    ms = ds >= 0
    if context is not None:
        mc &= dc < context
        ms &= ds < context
    return mc[:, None], ms[:, None]


def attend_cached(
    q: jnp.ndarray,
    cache_k: jnp.ndarray,
    cache_v: jnp.ndarray,
    k_new: jnp.ndarray,
    v_new: jnp.ndarray,
    mask_cache: jnp.ndarray,
    mask_self: jnp.ndarray,
) -> jnp.ndarray:
    """Joint SDPA over cache slots and the current block, without concatenating
    the (large) cache with the (small) block.

    q/k_new/v_new: [B,T,H,Dh]; cache_k/v: [B,Ca,H,Dh]; masks from
    `decode_masks`. Returns [B,T,H,Dh].
    """
    dh = q.shape[-1]
    scale = 1.0 / math.sqrt(dh)
    lc = (
        jnp.einsum("bthd,bchd->bhtc", q, cache_k, preferred_element_type=jnp.float32)
        * scale
    )  # [B,H,T,Ca]
    ls = (
        jnp.einsum("bthd,bshd->bhts", q, k_new, preferred_element_type=jnp.float32)
        * scale
    )  # [B,H,T,T]

    neg = jnp.finfo(jnp.float32).min
    lc = jnp.where(mask_cache, lc, neg)
    ls = jnp.where(mask_self, ls, neg)
    logits = jnp.concatenate([lc, ls], axis=-1)  # [B,H,T,Ca+T]
    weights = jax.nn.softmax(logits, axis=-1)
    Ca = cache_k.shape[1]
    wc = weights[..., :Ca].astype(cache_v.dtype)
    ws = weights[..., Ca:].astype(v_new.dtype)
    out = jnp.einsum("bhtc,bchd->bthd", wc, cache_v,
                     preferred_element_type=jnp.float32)
    out = out + jnp.einsum("bhts,bshd->bthd", ws, v_new,
                           preferred_element_type=jnp.float32)
    return out.astype(v_new.dtype)


def attend_windowed_chunked(
    q: jnp.ndarray,
    cache_k: jnp.ndarray,
    cache_v: jnp.ndarray,
    k_new: jnp.ndarray,
    v_new: jnp.ndarray,
    pos_cache: jnp.ndarray,
    pos_q: jnp.ndarray,
    context: int,
    chunk: int = 64,
    bias_chunks: list | None = None,
) -> jnp.ndarray:
    """Windowed attention for LARGE in-block T (the multi-frame codec path).

    `attend_cached` materializes [B, H, T, W+T] f32 logits; at the serving
    block size (T = 512 timesteps for a 32-frame block) and large batch that
    is ~1.6 GB per layer call — measured as the dominant cost of the b128
    codec. A query at block position t only attends keys within `context`
    (window cache W >= context), so each CHUNK of queries needs just the
    [c0, c0 + W + chunk) slice of the concatenated [cache; in-block] key
    axis: per-chunk logits are [B, H, chunk, W+chunk] — (W+chunk)/(W+T) of
    the naive traffic — with identical numerics (same mask rule on the
    sliced positions).

    q/k_new/v_new: [B, T, H, Dh]; cache_k/v: [B, W, H, Dh]; pos_cache:
    [B, W]; pos_q: [B, T]. Returns [B, T, H, Dh].
    `bias_chunks`: precomputed per-chunk additive masks from
    `windowed_chunk_bias` (layer-invariant — hoist them out of the layer
    scan; built inline when None).
    """
    B, T, H, Dh = q.shape
    scale = 1.0 / math.sqrt(Dh)
    # head-major ONCE, outside the chunk loop: per-chunk einsums over the
    # [B, T', H, Dh] layout re-relayout each overlapping key slice (8x per
    # layer at T=512) — measured as ~80% of the codec-transformer cost
    fkh = jnp.concatenate([cache_k, k_new], axis=1).transpose(0, 2, 1, 3)
    fvh = jnp.concatenate([cache_v, v_new], axis=1).transpose(0, 2, 1, 3)
    qh = q.transpose(0, 2, 1, 3)  # [B, H, T, Dh]
    W = cache_k.shape[1]
    if bias_chunks is None:
        bias_chunks = windowed_chunk_bias(pos_cache, pos_q, context, chunk)
    S = W + chunk
    outs = []
    for i, c0 in enumerate(range(0, T, chunk)):
        qc = qh[:, :, c0:c0 + chunk]
        ks = fkh[:, :, c0:c0 + S]
        vs = fvh[:, :, c0:c0 + S]
        lc = jnp.einsum("bhtd,bhcd->bhtc", qc, ks,
                        preferred_element_type=jnp.float32) * scale
        w = jax.nn.softmax(lc + bias_chunks[i], axis=-1)
        outs.append(jnp.einsum(
            "bhtc,bhcd->bhtd", w.astype(vs.dtype), vs,
            preferred_element_type=jnp.float32).astype(vs.dtype))
    return jnp.concatenate(outs, axis=2).transpose(0, 2, 1, 3)


def windowed_chunk_bias(pos_cache, pos_q, context: int, chunk: int = 64):
    """Per-chunk additive {0, -inf} masks for attend_windowed_chunked —
    layer-invariant, so callers compute them ONCE per block and share across
    the layer scan (the per-layer delta/compare tensors were a measurable
    share of the codec-transformer cost at b128)."""
    T = pos_q.shape[1]
    W = pos_cache.shape[1]
    S = W + chunk
    fpos = jnp.concatenate([pos_cache, pos_q], axis=1)  # [B, W+T]
    biases = []
    for c0 in range(0, T, chunk):
        pk = fpos[:, c0:c0 + S]
        pq = pos_q[:, c0:c0 + chunk]
        delta = pq[:, :, None] - pk[:, None, :]
        valid = (pk[:, None, :] >= 0) & (delta >= 0) & (delta < context)
        biases.append(jnp.where(valid, 0.0, jnp.finfo(jnp.float32).min)
                      [:, None].astype(jnp.float32))  # [B, 1, ch, S]
    return biases


def mha_oneshot(
    in_proj: jnp.ndarray,
    out_proj: jnp.ndarray,
    x: jnp.ndarray,
    *,
    num_heads: int,
    context: int | None,
    max_period: float,
) -> jnp.ndarray:
    """Full causal self-attention over x [B, T, D] with no cache — the one-shot
    path (voice encoding, training forward). Positions are 0..T-1."""
    B, T, D = x.shape
    q, k, v = qkv_project(x, in_proj, num_heads)
    zero = jnp.zeros((B,), jnp.int32)
    q, k = apply_rope(q, k, offset=zero, max_period=max_period)
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    out = attend(q, k, v, pos, pos, context).reshape(B, T, D)
    return matmul_t(out, out_proj)


def mha_step(
    in_proj: jnp.ndarray,
    out_proj: jnp.ndarray,
    x: jnp.ndarray,
    cache_k: jnp.ndarray,
    cache_v: jnp.ndarray,
    rope_tabs: tuple[jnp.ndarray, jnp.ndarray],
    masks: tuple[jnp.ndarray, jnp.ndarray],
    *,
    num_heads: int,
    att_len: int | None = None,
    flash_ctx: tuple[jnp.ndarray, jnp.ndarray] | None = None,
    wchunk_ctx: tuple | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One streaming attention call: project, rope, attend over cache + block.

    Does NOT write the cache — returns (out [B,T,D], k_new, v_new [B,T,H,Dh])
    for the caller to append once per stack (outside the layer scan).

    `rope_tabs` / `masks` are layer-invariant and precomputed once per step
    (nn/rope.rope_tables, decode_masks). `att_len` (static): attend over just
    the first att_len slots — a host-chosen bucket >= the slot watermark. Cuts
    KV reads from O(capacity) to O(valid prefix) without changing numerics.

    `flash_ctx = (pos_cache, offset)` routes the T=1/context=None case to the
    Pallas flash-decode kernel (ops/flash_decode.py), which reads the cache in
    place: no `cache[:, :att_len]` slice — slicing a buffer that a later
    dynamic_update_slice writes forces XLA to copy the whole cache per layer
    per step (measured 2x slower at batch 32) — the kernel's grid just stops
    at the att_len tile instead.
    """
    B, T, D = x.shape
    C = cache_k.shape[1]
    q, k, v = qkv_project(x, in_proj, num_heads)
    rotr, roti = rope_tabs
    q, k = rotate(q, rotr, roti), rotate(k, rotr, roti)

    if wchunk_ctx is not None:
        # large-T windowed block (multi-frame codec): chunked attention —
        # see attend_windowed_chunked
        pos_cache, pos_q, context, bias_chunks = wchunk_ctx
        out = attend_windowed_chunked(
            q, cache_k, cache_v, k, v, pos_cache, pos_q, context,
            bias_chunks=bias_chunks)
    elif flash_ctx is not None:
        from pocket_tts_tpu.ops.flash_decode import flash_decode_tpu

        pos_cache, offset = flash_ctx
        out = flash_decode_tpu(
            q[:, 0], cache_k, cache_v, k[:, 0], v[:, 0], pos_cache, offset,
            att_len=att_len,
        )[:, None]
    else:
        if att_len is not None and att_len < C:
            cache_k = cache_k[:, :att_len]
            cache_v = cache_v[:, :att_len]
        out = attend_cached(q, cache_k, cache_v, k, v, masks[0], masks[1])
    out = out.reshape(B, T, D)
    return matmul_t(out, out_proj), k, v
