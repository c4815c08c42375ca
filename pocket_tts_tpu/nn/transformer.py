"""Pre-LN streaming transformer stack, expressed as pure functions over stacked
per-layer parameter pytrees (leading axis = layer) scanned with `lax.scan`.

Mirrors the reference block structure (/root/reference/pocket_tts/modules/
mimi_transformer.py:12-101): LN -> MHA -> (+LayerScale) residual, then
LN -> Linear -> GELU(exact) -> Linear -> (+LayerScale) residual. Linears are
bias-free; LayerNorm uses eps=1e-5 with affine params.

Stacking layers lets one compiled `scan` body serve 6- and 24-layer variants and
makes tensor-parallel sharding a matter of annotating the stacked leaves.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from pocket_tts_tpu.nn.attention import KVCache, init_cache, mha_step
from pocket_tts_tpu.nn.linear import matmul_t

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
    """KV caches for all layers: k/v [L, B, C, H, Dh]; offset: [B] int32 (per row).

    A mutable pytree (not frozen): the arrays themselves are immutable JAX
    values, but the holder's fields can be reassigned, which is how the
    pipeline implements the reference's `copy_state=False` modify-in-place
    contract (reference tts_model.py:637-638) on top of functional updates.
    """

    k: jnp.ndarray
    v: jnp.ndarray
    offset: jnp.ndarray


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
        offset=jnp.zeros((batch_size,), jnp.int32),
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
    cache: KVCache,
    offset: jnp.ndarray,
    ring: bool,
    att_len: int | None = None,
) -> tuple[jnp.ndarray, KVCache]:
    h = layer_norm(x, p["norm1_scale"], p["norm1_bias"])
    attn_out, cache = mha_step(
        p["in_proj"],
        p["out_proj"],
        h,
        cache,
        offset,
        num_heads=cfg.num_heads,
        context=cfg.context,
        max_period=cfg.max_period,
        ring=ring,
        att_len=att_len,
    )
    if "ls1" in p:
        attn_out = attn_out * p["ls1"]
    x = x + attn_out
    h = layer_norm(x, p["norm2_scale"], p["norm2_bias"])
    ff = matmul_t(jax.nn.gelu(matmul_t(h, p["w1"]), approximate=False), p["w2"])
    if "ls2" in p:
        ff = ff * p["ls2"]
    return x + ff, cache


def transformer_apply(
    cfg: TransformerConfig,
    params: Params,
    x: jnp.ndarray,
    state: StackState,
    *,
    ring: bool = False,
    increment: int | None = None,
    unroll: int | bool = False,
    att_len: int | None = None,
) -> tuple[jnp.ndarray, StackState]:
    """Run the full stack on x: [B, T, D], updating every layer's cache.

    `increment`: how far to advance the shared offset (true length of x when the
    input is right-padded; defaults to T).
    `unroll`: lax.scan unroll factor over layers — True for decode steps (lets
    XLA overlap the many small per-layer ops), False for prompt/one-shot passes
    (smaller compile).
    """
    T = x.shape[1]

    def body(carry, xs):
        h = carry
        p, ck, cv = xs
        h, cache = _layer_step(cfg, h, p, KVCache(ck, cv), state.offset, ring, att_len)
        return h, (cache.k, cache.v)

    h, (new_k, new_v) = jax.lax.scan(
        body, x, (params, state.k, state.v), unroll=unroll
    )
    inc = T if increment is None else increment
    return h, StackState(k=new_k, v=new_v, offset=state.offset + inc)
