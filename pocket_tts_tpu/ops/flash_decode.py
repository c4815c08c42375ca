"""Pallas TPU flash-decode: single-query attention over the production KV cache.

The FlowLM autoregressive step (nn/attention.mha_step, T=1) attends one new
query per row against an append-ordered cache of capacity C with an explicit
per-slot position map (`pos` [B, C], -1 = dead slot) plus the step's own new
key/value (position = offset, always valid). This kernel reproduces those exact
semantics — validity is `pos >= 0 & pos <= offset`, matching
nn/attention.decode_masks for T=1 with context=None — so it can swap in under
the same parity tests as the XLA two-piece SDPA (`attend_cached`,
the hot op the north star names; reference SDPA:
/root/reference/pocket_ts/modules/transformer.py:151).

Layout: the cache stays in its production layout [B, C, H, Dh]; the kernel
views it as [B, C, H*Dh] so each (row, kv-tile) block DMA is one contiguous
[TC, H*Dh] panel. Grid = (B, C/TC) with the kv-tile axis innermost (sequential
per row); online-softmax accumulators (per-head running max / denominator in
SMEM, weighted-value sum in VMEM scratch) carry across tiles, so any capacity
streams through a fixed VMEM budget. All softmax math is f32.

Heads are an unrolled python loop (H is static and small): per head and tile,
one [1,Dh]x[Dh,TC] MXU matvec for scores and one [1,TC]x[TC,Dh] for the value
reduction — compute is negligible; the kernel is HBM-bound on the K/V stream,
which the grid double-buffers.

Routing: `use_flash_decode()` (env POCKET_TTS_TPU_FLASH) — see the measured
writeup there. `flash_decode_ref` is the XLA twin used by the kernel gate and
tests.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)


@functools.cache
def _flash_mode() -> str:
    return os.environ.get("POCKET_TTS_TPU_FLASH", "auto")


def use_flash_decode(batch: int = 1) -> bool:
    """POCKET_TTS_TPU_FLASH: "1" forces the Pallas kernel for FlowLM decode
    attention, "0" forces XLA, unset = auto (measured default: XLA).

    Measured on v5e over the honest production schedule (progressive KV
    growth + ramped scan blocks, tools/measure_r4 b1ab, round 4): XLA 151.0 vs
    flash 104.8 audio-s/s at b1 bf16 (int8: 167.9 vs 135.1), and XLA ~704 vs
    flash ~518 at b32 (round 3). Round 3 had measured the kernel AHEAD at b1
    (80 vs 65) — that was over fixed-capacity caches; with progressive growth
    the XLA SDPA reads only the current bucket and fuses into the surrounding
    step, while the kernel pays a separate launch per layer. Auto therefore
    routes everything to XLA; the kernel stays available (=1) as insurance for
    fixed-capacity/long-cache deployments, where its att_len grid-stop avoids
    XLA's slice-copies. See STATUS.md, "Flash-decode routing".
    """
    mode = _flash_mode()
    if mode == "1":
        return True
    return False


def _pick_tile(C: int) -> int | None:
    for tc in (512, 384, 256, 128):
        if C % tc == 0:
            return tc
    return None


def flash_decode_supported(C: int, Dh: int) -> bool:
    """The kernel covers lane-aligned head dims and tileable capacities."""
    return _pick_tile(C) is not None and Dh in (64, 128)


def flash_decode_ref(
    q: jnp.ndarray,
    cache_k: jnp.ndarray,
    cache_v: jnp.ndarray,
    k_new: jnp.ndarray,
    v_new: jnp.ndarray,
    pos: jnp.ndarray,
    offset: jnp.ndarray,
) -> jnp.ndarray:
    """XLA twin with identical contract (the production two-piece SDPA,
    specialized to T=1 / context=None).

    q/k_new/v_new: [B, H, Dh]; cache_k/v: [B, C, H, Dh]; pos: [B, C] int32;
    offset: [B] int32. Returns [B, H, Dh] in v's dtype.
    """
    scale = 1.0 / (q.shape[-1] ** 0.5)
    lc = jnp.einsum("bhd,bchd->bhc", q, cache_k,
                    preferred_element_type=jnp.float32) * scale
    valid = (pos >= 0) & (pos <= offset[:, None])  # [B, C]
    lc = jnp.where(valid[:, None, :], lc, NEG_INF)
    ls = jnp.einsum("bhd,bhd->bh", q, k_new,
                    preferred_element_type=jnp.float32)[..., None] * scale
    logits = jnp.concatenate([lc, ls], axis=-1)  # [B, H, C+1]
    w = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhc,bchd->bhd", w[..., :-1].astype(cache_v.dtype), cache_v,
                     preferred_element_type=jnp.float32)
    out = out + w[..., -1:].astype(v_new.dtype) * v_new.astype(jnp.float32)
    return out.astype(v_new.dtype)


def _kernel(off_ref, q_ref, kn_ref, vn_ref, pos_ref, k_ref, v_ref, o_ref,
            acc_ref, m_ref, l_ref, *, H, Dh, scale, n_tiles):
    """All heads processed at once — no per-head loop.

    The head-group structure lives in a trace-time constant `e_t` [H*Dh, H]
    (e_t[i, h] = 1 iff lane i belongs to head h). Per-head dot products become
    one elementwise multiply plus a [TC, HD] x [HD, H] MXU matmul (the 16x MAC
    waste is free — the kernel is HBM-bound); the reverse matmul broadcasts
    per-head scalars ([*, H] -> [*, HD]) for the value accumulation. All
    softmax math in f32.
    """
    t = pl.program_id(1)
    b = pl.program_id(0)
    HD = H * Dh
    off = off_ref[b]

    row = jax.lax.broadcasted_iota(jnp.int32, (HD, H), 0) // Dh
    col = jax.lax.broadcasted_iota(jnp.int32, (HD, H), 1)
    e_t = (row == col).astype(jnp.float32)  # [HD, H] head-group indicator

    def group_reduce(x):  # [*, HD] -> [*, H]: sum each head's lane group
        return jax.lax.dot_general(x, e_t, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def expand(x):  # [*, H] -> [*, HD]: broadcast per-head scalars over lanes
        return jax.lax.dot_general(x, e_t, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    q = q_ref[0].astype(jnp.float32)  # [1, HD]
    k_tile = k_ref[0].astype(jnp.float32)  # [TC, HD]
    v_tile = v_ref[0].astype(jnp.float32)
    pos = pos_ref[0]  # [TC, 1] int32
    valid = (pos >= 0) & (pos <= off)  # [TC, 1]

    scores = group_reduce(k_tile * q) * scale  # [TC, H]
    scores = jnp.where(valid, scores, NEG_INF)

    is_first = t == 0
    m_prev = jnp.where(is_first, NEG_INF, m_ref[...])  # [1, H]
    l_prev = jnp.where(is_first, 0.0, l_ref[...])
    acc_prev = jnp.where(is_first, 0.0, acc_ref[...])  # [1, HD]

    # the step's own new key (position = offset, always valid) joins at tile 0
    s_new = group_reduce(q * kn_ref[0].astype(jnp.float32)) * scale  # [1, H]
    m_new = jnp.maximum(m_prev, jnp.max(scores, axis=0, keepdims=True))
    m_new = jnp.where(is_first, jnp.maximum(m_new, s_new), m_new)

    alpha = jnp.exp(m_prev - m_new)  # [1, H]
    p = jnp.exp(scores - m_new)  # [TC, H]; masked scores underflow to 0
    e_new = jnp.where(is_first, jnp.exp(s_new - m_new), 0.0)  # [1, H]
    l_new = l_prev * alpha + jnp.sum(p, axis=0, keepdims=True) + e_new
    pv = jnp.sum(expand(p) * v_tile, axis=0, keepdims=True)  # [1, HD]
    acc = (acc_prev * expand(alpha) + pv
           + expand(e_new) * vn_ref[0].astype(jnp.float32))

    acc_ref[...] = acc
    m_ref[...] = m_new
    l_ref[...] = l_new

    @pl.when(t == n_tiles - 1)
    def _():
        o_ref[0] = (acc / expand(l_new)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("att_len", "interpret"))
def flash_decode_tpu(
    q: jnp.ndarray,
    cache_k: jnp.ndarray,
    cache_v: jnp.ndarray,
    k_new: jnp.ndarray,
    v_new: jnp.ndarray,
    pos: jnp.ndarray,
    offset: jnp.ndarray,
    att_len: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas flash-decode with the same contract as `flash_decode_ref`.

    `att_len` (static): attend only the first att_len slots — the kernel's grid
    simply stops after att_len/TC tiles, so unlike the XLA path's
    `cache[:, :att_len]` this never slices (= copies) the donated cache buffer.
    Same contract as nn/attention.mha_step's att_len: the caller guarantees all
    valid slots sit below att_len.
    """
    B, H, Dh = q.shape
    C = cache_k.shape[1]
    C_eff = C if att_len is None or att_len >= C else att_len
    TC = _pick_tile(C_eff)
    assert TC is not None, f"attended length {C_eff} has no 128-multiple tile"
    n_tiles = C_eff // TC
    scale = 1.0 / (Dh**0.5)
    HD = H * Dh

    # row-vector operands get a singleton inner axis so their blocks satisfy
    # Mosaic's last-two-dims rule ((1, HD) blocks of a [B, HD] array do not)
    qf = q.reshape(B, 1, HD)
    knf = k_new.reshape(B, 1, HD)
    vnf = v_new.reshape(B, 1, HD)
    posf = pos.reshape(B, C, 1)  # column layout: masks broadcast over head lanes
    kf = cache_k.reshape(B, C, HD)
    vf = cache_v.reshape(B, C, HD)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, HD), lambda b, t, off: (b, 0, 0),
                         memory_space=pltpu.VMEM),  # q
            pl.BlockSpec((1, 1, HD), lambda b, t, off: (b, 0, 0),
                         memory_space=pltpu.VMEM),  # k_new
            pl.BlockSpec((1, 1, HD), lambda b, t, off: (b, 0, 0),
                         memory_space=pltpu.VMEM),  # v_new
            pl.BlockSpec((1, TC, 1), lambda b, t, off: (b, t, 0),
                         memory_space=pltpu.VMEM),  # pos
            pl.BlockSpec((1, TC, HD), lambda b, t, off: (b, t, 0),
                         memory_space=pltpu.VMEM),  # cache_k
            pl.BlockSpec((1, TC, HD), lambda b, t, off: (b, t, 0),
                         memory_space=pltpu.VMEM),  # cache_v
        ],
        out_specs=pl.BlockSpec((1, 1, HD), lambda b, t, off: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((1, HD), jnp.float32),  # acc
            pltpu.VMEM((1, H), jnp.float32),  # running max
            pltpu.VMEM((1, H), jnp.float32),  # running denom
        ],
    )
    kernel = functools.partial(_kernel, H=H, Dh=Dh, scale=scale, n_tiles=n_tiles)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 1, HD), v_new.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(offset.astype(jnp.int32), qf, knf, vnf, posf, kf, vf).reshape(B, H, Dh)
