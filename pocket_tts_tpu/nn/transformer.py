"""Pre-LN streaming transformer stack, expressed as pure functions over stacked
per-layer parameter pytrees (leading axis = layer) scanned with `lax.scan`.

Mirrors the reference block structure (/root/reference/pocket_tts/modules/
mimi_transformer.py:12-101): LN -> MHA -> (+LayerScale) residual, then
LN -> Linear -> GELU(exact) -> Linear -> (+LayerScale) residual. Linears are
bias-free; LayerNorm uses eps=1e-5 with affine params.

Stacking layers lets one compiled `scan` body serve 6- and 24-layer variants and
makes tensor-parallel sharding a matter of annotating the stacked leaves.

Cache dataflow (the TPU-performance-critical part): the KV caches are
scan-INVARIANT inputs — each layer attends over its (read-only) cache slice and
emits its new K/V as scan outputs; the whole stack's new K/V is then appended
with ONE shared-index `dynamic_update_slice` at the top level. XLA keeps that
write in place on donated buffers and loop carries. Routing the caches through
the scan as carries/ys instead costs a full cache copy per step, and per-row
scatter writes cost ~20x more (serialized row loop) — both measured on v5e.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from pocket_tts_tpu.nn.attention import decode_masks, mha_oneshot, mha_step
from pocket_tts_tpu.nn.linear import matmul_t
from pocket_tts_tpu.nn.rope import rope_tables
from pocket_tts_tpu.ops.decode_stack import (
    decode_stack_apply,
    stack_supported,
    use_decode_stack,
)
from pocket_tts_tpu.ops.flash_decode import (
    flash_decode_supported,
    use_flash_decode,
)

Params = dict[str, Any]


class TransformerConfig(NamedTuple):
    d_model: int
    num_heads: int
    num_layers: int
    dim_feedforward: int
    context: int | None = None
    max_period: float = 10_000.0
    layer_scale: float | None = None


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class StackState:
    """KV caches for all layers, append-ordered slots.

    k/v: [L, B, C, H, Dh] — slot axis C is filled in write order, shared by all
        rows (slot != position).
    pos: [B, C] int32 — absolute stream position stored in each slot per row;
        -1 marks empty slots and right-padding garbage (never attended).
    offset: [B] int32 — per-row true stream position (count of real tokens).
    write_pos: [] int32 — next slot to write, shared across rows (grows by the
        PADDED block length; the capacity a generation needs is measured in
        slots, i.e. against write_pos, not offset).

    A mutable pytree (not frozen): the arrays themselves are immutable JAX
    values, but the holder's fields can be reassigned, which is how the
    pipeline implements the reference's `copy_state=False` modify-in-place
    contract (reference tts_model.py:637-638) on top of functional updates.
    """

    k: jnp.ndarray
    v: jnp.ndarray
    pos: jnp.ndarray
    offset: jnp.ndarray
    write_pos: jnp.ndarray


def layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, eps: float = 1e-5):
    """LayerNorm with f32 statistics, returned in the input dtype."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32) + bias.astype(
        jnp.float32
    )
    return y.astype(x.dtype)


def init_stack_state(
    cfg: TransformerConfig, batch_size: int, capacity: int, dtype=jnp.float32
) -> StackState:
    dh = cfg.d_model // cfg.num_heads
    shape = (cfg.num_layers, batch_size, capacity, cfg.num_heads, dh)
    return StackState(
        k=jnp.zeros(shape, dtype),
        v=jnp.zeros(shape, dtype),
        pos=jnp.full((batch_size, capacity), -1, jnp.int32),
        offset=jnp.zeros((batch_size,), jnp.int32),
        write_pos=jnp.zeros((), jnp.int32),
    )


def init_layer_params(cfg: TransformerConfig, key, dtype=jnp.float32) -> Params:
    """Random init (fan-in uniform like torch Linear defaults); leaves stacked [L, ...]."""
    L, D, F = cfg.num_layers, cfg.d_model, cfg.dim_feedforward
    ks = jax.random.split(key, 4)

    def unif(k, shape, fan_in):
        bound = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(k, shape, dtype, -bound, bound)

    params: Params = {
        "in_proj": unif(ks[0], (L, 3 * D, D), D),
        "out_proj": unif(ks[1], (L, D, D), D),
        "norm1_scale": jnp.ones((L, D), dtype),
        "norm1_bias": jnp.zeros((L, D), dtype),
        "norm2_scale": jnp.ones((L, D), dtype),
        "norm2_bias": jnp.zeros((L, D), dtype),
        "w1": unif(ks[2], (L, F, D), D),
        "w2": unif(ks[3], (L, D, F), F),
    }
    if cfg.layer_scale is not None:
        params["ls1"] = jnp.full((L, D), cfg.layer_scale, dtype)
        params["ls2"] = jnp.full((L, D), cfg.layer_scale, dtype)
    return params


def _layer_step(
    cfg: TransformerConfig,
    x: jnp.ndarray,
    p: Params,
    cache_k: jnp.ndarray,
    cache_v: jnp.ndarray,
    rope_tabs: tuple[jnp.ndarray, jnp.ndarray],
    masks: tuple[jnp.ndarray, jnp.ndarray],
    att_len: int | None = None,
    flash_ctx=None,
    wchunk_ctx=None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    h = layer_norm(x, p["norm1_scale"], p["norm1_bias"])
    attn_out, k_new, v_new = mha_step(
        p["in_proj"],
        p["out_proj"],
        h,
        cache_k,
        cache_v,
        rope_tabs,
        masks,
        num_heads=cfg.num_heads,
        att_len=att_len,
        flash_ctx=flash_ctx,
        wchunk_ctx=wchunk_ctx,
    )
    if "ls1" in p:
        attn_out = attn_out * p["ls1"]
    x = x + attn_out
    h = layer_norm(x, p["norm2_scale"], p["norm2_bias"])
    ff = matmul_t(jax.nn.gelu(matmul_t(h, p["w1"]), approximate=False), p["w2"])
    if "ls2" in p:
        ff = ff * p["ls2"]
    return x + ff, k_new, v_new


def append_kv(
    state: StackState,
    ks: jnp.ndarray,
    vs: jnp.ndarray,
    *,
    true_len: jnp.ndarray | int | None = None,
) -> StackState:
    """Append a block of new K/V ([L, B, T, H, Dh]) at the shared write pointer.

    One dynamic_update_slice on the full stacked cache — in place when the
    state buffers are donated or live in a loop carry. `true_len` ([B] or int):
    rows' real token counts in the (right-padded) block; padding slots get
    pos = -1.
    """
    T = ks.shape[2]
    slot = state.write_pos
    k = jax.lax.dynamic_update_slice(state.k, ks.astype(state.k.dtype),
                                     (0, 0, slot, 0, 0))
    v = jax.lax.dynamic_update_slice(state.v, vs.astype(state.v.dtype),
                                     (0, 0, slot, 0, 0))
    t = jnp.arange(T, dtype=jnp.int32)
    new_pos = state.offset[:, None] + t[None, :]
    if true_len is None:
        inc = T
    else:
        inc = true_len
        tl = jnp.broadcast_to(jnp.asarray(true_len, jnp.int32),
                              state.offset.shape)
        new_pos = jnp.where(t[None, :] < tl[:, None], new_pos, -1)
    pos = jax.lax.dynamic_update_slice(state.pos, new_pos, (0, slot))
    return StackState(
        k=k, v=v, pos=pos, offset=state.offset + inc, write_pos=state.write_pos + T
    )


def shift_kv(state: StackState, ks: jnp.ndarray, vs: jnp.ndarray) -> StackState:
    """Sliding-window cache update: keep the most recent W slots by static
    concat-and-crop (no write pointer, no wrap) — any block length T per call,
    including T that varies call-to-call and T >= W. Positions slide with the
    slots, so decode_masks/attend_cached work unchanged. This is the TPU shape
    of the reference's ring buffer for windowed transformers: the roll is a
    copy of the (small, O(window)) cache, which XLA fuses, instead of a
    modular write whose blocks could straddle the wrap point."""
    T = ks.shape[2]
    W = state.k.shape[2]
    t = jnp.arange(T, dtype=jnp.int32)
    new_pos = state.offset[:, None] + t[None, :]
    if T >= W:
        k, v, pos = ks[:, :, T - W:], vs[:, :, T - W:], new_pos[:, T - W:]
    else:
        k = jnp.concatenate([state.k[:, :, T:], ks.astype(state.k.dtype)], axis=2)
        v = jnp.concatenate([state.v[:, :, T:], vs.astype(state.v.dtype)], axis=2)
        pos = jnp.concatenate([state.pos[:, T:], new_pos], axis=1)
    return StackState(
        k=k.astype(state.k.dtype), v=v.astype(state.v.dtype), pos=pos,
        offset=state.offset + T, write_pos=state.write_pos + T,
    )


def transformer_oneshot(
    cfg: TransformerConfig,
    params: Params,
    x: jnp.ndarray,
    *,
    unroll: int | bool = False,
) -> jnp.ndarray:
    """Full causal pass over x [B, T, D] with no KV cache — for one-shot uses
    (voice-prompt encoding, training forward) where no state is carried. Avoids
    allocating/attending a cache whose slots would all be invalid."""

    def body(h, p):
        hn = layer_norm(h, p["norm1_scale"], p["norm1_bias"])
        attn_out = mha_oneshot(
            p["in_proj"], p["out_proj"], hn,
            num_heads=cfg.num_heads, context=cfg.context,
            max_period=cfg.max_period,
        )
        if "ls1" in p:
            attn_out = attn_out * p["ls1"]
        h = h + attn_out
        hn = layer_norm(h, p["norm2_scale"], p["norm2_bias"])
        ff = matmul_t(jax.nn.gelu(matmul_t(hn, p["w1"]), approximate=False), p["w2"])
        if "ls2" in p:
            ff = ff * p["ls2"]
        return h + ff, None

    h, _ = jax.lax.scan(body, x, params, unroll=unroll)
    return h


def transformer_apply(
    cfg: TransformerConfig,
    params: Params,
    x: jnp.ndarray,
    state: StackState,
    *,
    window: bool = False,
    increment: jnp.ndarray | int | None = None,
    unroll: int | bool = False,
    att_len: int | None = None,
    packed: Any | None = None,
) -> tuple[jnp.ndarray, StackState]:
    """Run the full stack on x: [B, T, D], then append every layer's new K/V.

    `window`: sliding-window cache (capacity = window size, shift_kv update)
    for context-limited transformers (Mimi decoder); the default is the
    append-ordered linear cache (FlowLM).
    `increment`: the true (unpadded) length of x per row when the input is
    right-padded; defaults to T. Offsets advance by it; write_pos advances by
    the full padded T. Unsupported (and unneeded) in window mode.
    `unroll`: lax.scan unroll factor over layers — True for decode steps (lets
    XLA overlap the many small per-layer ops), False for prompt/one-shot passes
    (smaller compile).
    `packed`: pack_decode_stack bundle — routes the T=1 b1 decode body to the
    fused whole-stack Pallas kernel (ops/decode_stack.py) when supported; the
    cache append below is shared by both paths.
    """

    att = None if window else att_len  # window slots slide: prefix not static
    T = x.shape[1]
    if (
        packed is not None
        and not window
        and T == 1
        and (att is None or att >= state.k.shape[2])
        and use_decode_stack()
        and stack_supported(cfg, x.shape[0], T, state.k.shape[2], state.k.dtype)
    ):
        # the kernel appends the k/v row in place (aliased caches) and
        # returns the fully-updated state — no XLA-side cache update
        return decode_stack_apply(cfg, packed, x, state)
    dh = cfg.d_model // cfg.num_heads
    # layer-invariant per-step work, hoisted out of the scan: rotation tables
    # and attention masks (at tiny decode shapes, op count dominates cost)
    tabs = rope_tables(state.offset, T, dh, cfg.max_period, batch=x.shape[0])

    # T=1 decode over a non-windowed cache can route to the Pallas
    # flash-decode kernel (pos-map masking happens inside it; no masks needed)
    flash = (
        not window
        and T == 1
        and cfg.context is None
        and use_flash_decode(x.shape[0])
        and flash_decode_supported(att or state.k.shape[2], dh)
    )
    wchunk_ctx = None
    if flash:
        flash_ctx = (state.pos, state.offset)
        masks = (None, None)
    elif window and T >= 128 and cfg.context is not None:
        # multi-frame windowed block: chunked attention avoids the
        # [B, H, T, W+T] logits blow-up (see attend_windowed_chunked); the
        # per-chunk masks are layer-invariant and built once here
        from pocket_tts_tpu.nn.attention import windowed_chunk_bias

        flash_ctx = None
        pos_q = state.offset[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
        wchunk_ctx = (state.pos, pos_q, cfg.context,
                      windowed_chunk_bias(state.pos, pos_q, cfg.context))
        masks = (None, None)
    else:
        flash_ctx = None
        pos_cache = state.pos
        if att is not None and att < state.k.shape[2]:
            pos_cache = pos_cache[:, :att]
        masks = decode_masks(pos_cache, state.offset, T, cfg.context)

    def body(carry, xs):
        h = carry
        p, ck, cv = xs
        h, k_new, v_new = _layer_step(cfg, h, p, ck, cv, tabs, masks, att,
                                      flash_ctx, wchunk_ctx)
        return h, (k_new, v_new)

    h, (ks, vs) = jax.lax.scan(
        body, x, (params, state.k, state.v), unroll=unroll
    )
    if window:
        assert increment is None, "window caches take full (unpadded) blocks"
        return h, shift_kv(state, ks, vs)
    return h, append_kv(state, ks, vs, true_len=increment)
