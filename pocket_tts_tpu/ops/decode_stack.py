"""Fused whole-stack decode kernel: all transformer layers of one AR step in
ONE Pallas launch.

Why. At batch 1 the decode step is HBM-bound on the weight stream, but the XLA
scan pays per-op scheduling gaps between the ~10 small ops of every layer
(LayerNorms, rope, attention pieces) that sit BETWEEN the weight-streaming
dots: measured on v5e (tools/int8_gemv_probe.py), a bare chain of the same
dots streams int8 weights at ~550 GB/s and a Pallas grid pipeline at
~750 GB/s (92% of the 819 nominal), while the full XLA decode step achieves
only ~310 GB/s effective — the gap is the inter-op serialization, not the
GEMVs. This kernel keeps the entire layer loop on-chip: the grid streams the
packed weights in fixed 1024-row chunks (auto double-buffered), and the
residual stream, attention and activations never leave VMEM.

What it computes — exactly `nn/transformer.transformer_apply`'s T=1 decode
body (reference block structure: /root/reference/pocket_tts/modules/
mimi_transformer.py:12-101, attention transformer.py:87-158), for the
flagship shape D=1024, H=16, Dh=64, F=4096 shared by the 6l and 24l configs:

    per layer l:  h  = LN1(x);  q,k,v = h @ in_proj[l].T  (+ rope on q,k)
                  x += Attn(q, cache_k[l], cache_v[l], k, v) @ out_proj[l].T
                  h  = LN2(x);  x += gelu(h @ w1[l].T) @ w2[l].T

Attention reproduces the production semantics bit-for-bit: append-ordered
cache with pos-map validity `(pos >= 0) & (pos <= offset)` plus the step's own
new key at position offset (nn/attention.decode_masks for T=1, context=None).
The cache APPEND happens IN-KERNEL: the caches stay in HBM (ANY-space refs,
aliased input->output, donated buffers), each layer's panel streams through
double-buffered VMEM scratch under manual DMA control, and the new k/v row
writes back as a 16-row aligned tile rebuilt from the read panel (HBM buffers
are sublane-tiled; single-row DMA destinations are unexpressible). Moving the
append off XLA matters as much as the fusion itself: an XLA-side
dynamic_update_slice made layout assignment pick a tiled cache layout and
materialize ~100 MB/frame of relayout copies around the kernel (measured in
the compiled HLO; 24l int8 b1 87 -> 105 audio-s/s when the append moved
in-kernel). Only the pos-map/offset/write_pos update remains outside (tiny).

Weight packing (`pack_decode_stack`): all four mats concatenate row-major into
one [L, 12*1024, 1024] array — rows [0,3D) in_proj (q|k|v row blocks land on
chunk boundaries), [3D,4D) out_proj, [4D,8D) w1, [8D,12D) w2 TRANSPOSED (its
rows become the contraction dim, so chunked accumulation needs no transpose
in-kernel; its per-output scale applies once at the layer end). int8 rows
carry per-row scales; bf16 rows scale 1. Mixed quantization (one of
attention/ffn quantized but not the other) is not packable — callers fall
back to the XLA scan.

Rope inside the kernel avoids lane-crossing reshapes: the interleaved-pair
rotation (nn/rope.py) is expressed as x*cos + swap_pairs(x)*sin_signed where
swap_pairs is two lane-rolls (+1/-1) blended by lane parity, and cos/sin are
precomputed per-lane vectors (pair-duplicated, sign-folded) on the host side
of the launch.

Supported: B=1, T=1, D=1024, H*Dh=D, F=4D, capacity C <= 1024 (VMEM budget:
two cache-layer buffers + two weight chunks + scratch ~ 12 MB), C % 128 == 0,
bf16/int8 weights, bf16 cache. Everything else routes to the XLA scan.
POCKET_TTS_TPU_STACK=0 disables, =1 forces where supported.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 1024          # rows per weight chunk == D
N_CHUNKS = 12         # 3 (qkv) + 1 (out) + 4 (w1) + 4 (w2t)
MAX_KERNEL_CAPACITY = 1024
NEG_INF = float(jnp.finfo(jnp.float32).min)


@functools.cache
def _stack_mode() -> str:
    return os.environ.get("POCKET_TTS_TPU_STACK", "auto")


def use_decode_stack() -> bool:
    """POCKET_TTS_TPU_STACK: "1" forces, "0" disables, unset/auto = on for TPU
    (measured: see STATUS.md round-5 section)."""
    mode = _stack_mode()
    if mode == "0":
        return False
    if mode == "1":
        return True
    return jax.default_backend() not in ("cpu", "gpu")


def stack_supported(cfg, B: int, T: int, C: int, cache_dtype) -> bool:
    """Shape guard for the kernel path (see module docstring)."""
    D = cfg.d_model
    dh = D // cfg.num_heads
    return (
        B == 1 and T == 1
        and D == CHUNK
        and cfg.num_heads * dh == D
        and cfg.dim_feedforward == 4 * D
        and cfg.context is None
        and cfg.layer_scale is None
        and C <= MAX_KERNEL_CAPACITY
        and C % 128 == 0
        and dh % 2 == 0
        # bf16 cache only: an f32 cache doubles the resident layer blocks past
        # the VMEM budget, and the f32-weights parity path is not packable
        # anyway (pack_decode_stack returns None)
        and jnp.dtype(cache_dtype) == jnp.dtype(jnp.bfloat16)
    )


# ------------------------------------------------------------------- packing


def pack_decode_stack(cfg, tparams) -> dict | None:
    """Build the kernel's packed weight bundle from a transformer param tree
    (stacked [L, ...] leaves, plain bf16/f32 arrays or int8 {"q","s"} dicts).
    Returns None when the params are not packable (non-flagship geometry,
    mixed quantization, or a float dtype other than bf16 on the weight
    rows)."""
    if (cfg.d_model != CHUNK or cfg.dim_feedforward != 4 * cfg.d_model
            or cfg.d_model % cfg.num_heads
            or cfg.context is not None or cfg.layer_scale is not None):
        return None
    keys = ("in_proj", "out_proj", "w1", "w2")
    quant = [isinstance(tparams[k], dict) for k in keys]
    if any(quant) and not all(quant):
        return None  # mixed groups: no uniform row dtype

    def rows(k):
        w = tparams[k]
        return (w["q"], w["s"]) if isinstance(w, dict) else (w, None)

    in_w, in_s = rows("in_proj")
    out_w, out_s = rows("out_proj")
    w1_w, w1_s = rows("w1")
    w2_w, w2_s = rows("w2")
    L = in_w.shape[0]
    D = cfg.d_model
    F = cfg.dim_feedforward

    if all(quant):
        wdtype = jnp.int8
    else:
        if in_w.dtype != jnp.bfloat16:
            return None  # f32 weights blow the VMEM budget; XLA handles parity
        wdtype = jnp.bfloat16

    w2t = jnp.swapaxes(w2_w, 1, 2)  # [L, F, D]: rows = contraction dim
    wcat = jnp.concatenate(
        [x.astype(wdtype) for x in (in_w, out_w, w1_w, w2t)], axis=1
    )  # [L, 3D + D + F + F, D] = [L, 12*1024, 1024]

    ones = jnp.ones((L, F), jnp.float32)
    scat = jnp.concatenate([
        (in_s if in_s is not None else jnp.ones((L, 3 * D))).astype(jnp.float32),
        (out_s if out_s is not None else jnp.ones((L, D))).astype(jnp.float32),
        (w1_s if w1_s is not None else jnp.ones((L, F))).astype(jnp.float32),
        ones,  # w2t rows: the per-OUTPUT scale applies at layer end (s2)
    ], axis=1).reshape(L, N_CHUNKS, 1, CHUNK)

    s2 = (w2_s if w2_s is not None else jnp.ones((L, D))).astype(jnp.float32)
    normcat = jnp.stack([
        tparams["norm1_scale"].astype(jnp.float32),
        tparams["norm1_bias"].astype(jnp.float32),
        tparams["norm2_scale"].astype(jnp.float32),
        tparams["norm2_bias"].astype(jnp.float32),
    ], axis=1)  # [L, 4, D]

    return {"wcat": wcat, "scat": scat, "s2": s2[:, None, :], "norm": normcat}


def rope_lane_tables(offset, H: int, Dh: int, max_period: float):
    """Per-lane cos / sign-folded sin vectors [1, H*Dh] for the interleaved
    rotation at position `offset` ([1] int32): lane = h*Dh + d, pair j = d//2,
    angle = offset * max_period**(-2j/Dh); sin is negated on even lanes so the
    rotation is x*cos + swap_pairs(x)*sin (see nn/rope.rotate)."""
    js = jnp.arange(Dh // 2, dtype=jnp.float32)
    freqs = jnp.exp(js * (-math.log(max_period) * 2.0 / Dh))
    per_d = jnp.repeat(freqs, 2)  # [Dh]: pair-duplicated
    angles = offset.astype(jnp.float32).reshape(1, 1) * jnp.tile(per_d, H)[None]
    sign = jnp.where(jnp.arange(H * Dh) % 2 == 0, -1.0, 1.0)[None]
    return jnp.cos(angles), jnp.sin(angles) * sign


# -------------------------------------------------------------------- kernel


def _kernel(wp_ref, x_ref, w_ref, s_ref, s2_ref, norm_ref, cos_ref, sin_ref,
            mask_ref, k_hbm, v_hbm, xo_ref, ko_ref, vo_ref,
            xs, hs, qr, kr, vv, g, y2, kbuf, vbuf, krow, vrow, rsem, wsem,
            *, H, Dh, C, n_layers, out_dtype, scaled):
    """The caches stay in HBM (ANY space, aliased in->out) and are streamed
    manually: layer l+1's [C, HD] k/v panels DMA into double-buffered VMEM
    scratch while layer l computes, and the step's new k/v row DMAs back to
    slot `wp` (scalar-prefetched write pointer) — the append happens INSIDE
    the kernel. This removes the XLA-side dynamic_update_slice whose layout
    preferences forced ~100 MB/frame of cache relayout copies around the
    kernel (measured in the compiled HLO), and leaves the kernel as the
    cache's only producer/consumer so the scan carry settles on the default
    layout."""
    l = pl.program_id(0)
    c = pl.program_id(1)
    HD = H * Dh
    scale = 1.0 / math.sqrt(Dh)
    wp = wp_ref[0]

    def read_dma(layer, slot):
        return (pltpu.make_async_copy(k_hbm.at[layer], kbuf.at[slot],
                                      rsem.at[slot, 0]),
                pltpu.make_async_copy(v_hbm.at[layer], vbuf.at[slot],
                                      rsem.at[slot, 1]))

    # The append writes a 16-row ALIGNED tile, not a single row: HBM buffers
    # are sublane-tiled, so a 1-row DMA destination is unexpressible. The
    # tile is rebuilt from the layer's just-read panel (kbuf/vbuf) with the
    # new row blended in at wp — neighbor rows are rewritten with the values
    # they already hold (the kernel is the cache's only writer).
    ALIGN = 16
    aligned = pl.multiple_of((wp // ALIGN) * ALIGN, ALIGN)

    def write_dma(layer):
        return (pltpu.make_async_copy(krow, ko_ref.at[layer, pl.ds(aligned, ALIGN)],
                                      wsem.at[0]),
                pltpu.make_async_copy(vrow, vo_ref.at[layer, pl.ds(aligned, ALIGN)],
                                      wsem.at[1]))

    @pl.when((l == 0) & (c == 0))
    def _():
        xs[...] = x_ref[...].astype(jnp.float32)
        for d in read_dma(0, 0):
            d.start()

    @pl.when((c == 0) & (l + 1 < n_layers))
    def _():
        for d in read_dma(l + 1, (l + 1) % 2):
            d.start()

    def ln(slot):
        """hs = LayerNorm(xs) with norm row pair `slot` (f32 stats, eps 1e-5)."""
        xf = xs[...]
        mean = jnp.mean(xf, axis=1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=1, keepdims=True)
        w = norm_ref[0, 2 * slot:2 * slot + 1, :]
        b = norm_ref[0, 2 * slot + 1:2 * slot + 2, :]
        hs[...] = ((xf - mean) * jax.lax.rsqrt(var + 1e-5) * w + b).astype(
            hs.dtype)

    def wchunk_dot(op):
        """op [1, D] @ w_ref[0] [CHUNK, D].T with per-row scales -> [1, CHUNK] f32.
        `scaled` is trace-static (int8 rows carry scales; bf16 rows are 1.0 —
        skip the multiply entirely)."""
        y = jax.lax.dot_general(
            op, w_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return y * s_ref[0, 0] if scaled else y

    def rope(x):
        """Interleaved-pair rotation on [1, HD] f32 (see rope_lane_tables).
        swap_pairs = blend of lane-rolls by +1 and -1 (expressed as HD-1:
        pltpu.roll requires non-negative shifts; the roll is circular)."""
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, HD), 1)
        swapped = jnp.where(lane % 2 == 0,
                            pltpu.roll(x, HD - 1, axis=1),
                            pltpu.roll(x, 1, axis=1))
        return x * cos_ref[...] + swapped * sin_ref[...]

    row = jax.lax.broadcasted_iota(jnp.int32, (HD, H), 0) // Dh
    col = jax.lax.broadcasted_iota(jnp.int32, (HD, H), 1)
    e_t = (row == col).astype(jnp.float32)  # [HD, H] head-group indicator

    def group_reduce(x):  # [*, HD] -> [*, H]
        return jax.lax.dot_general(x, e_t, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def expand(x):  # [*, H] -> [*, HD]
        return jax.lax.dot_general(x, e_t, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    @pl.when(c == 0)
    def _():
        ln(0)
        qr[...] = rope(wchunk_dot(hs[...]))

    @pl.when(c == 1)
    def _():
        k = rope(wchunk_dot(hs[...]))
        kr[...] = k

    @pl.when(c == 2)
    def _():
        vv[...] = wchunk_dot(hs[...])
        # drain the previous layer's append before rebuilding the stage tiles
        @pl.when(l >= 1)
        def _():
            for d in write_dma(l - 1):
                d.wait()

    @pl.when(c == 3)
    def _():
        for d in read_dma(l, l % 2):
            d.wait()
        # stage the append tile (read panel rows + the new k/v row at wp)
        # and start its write-back
        rowrel = wp - aligned
        rowsel = jax.lax.broadcasted_iota(jnp.int32, (ALIGN, HD), 0) == rowrel
        kpanel = kbuf[l % 2, pl.ds(aligned, ALIGN), :]
        vpanel = vbuf[l % 2, pl.ds(aligned, ALIGN), :]
        krow[...] = jnp.where(rowsel, kr[...].astype(krow.dtype), kpanel)
        vrow[...] = jnp.where(rowsel, vv[...].astype(vrow.dtype), vpanel)
        for d in write_dma(l):
            d.start()
        # attention over the streamed cache layer + the step's own new k/v
        # (pos-map validity arrives as an additive {0, -inf} bias)
        k_tile = kbuf[l % 2].astype(jnp.float32)  # [C, HD]
        scores = group_reduce(k_tile * qr[...]) * scale + mask_ref[...]
        s_new = group_reduce(qr[...] * kr[...]) * scale  # [1, H]
        m = jnp.maximum(jnp.max(scores, axis=0, keepdims=True), s_new)
        p = jnp.exp(scores - m)  # [C, H]; masked rows underflow to 0
        e_new = jnp.exp(s_new - m)  # [1, H]
        denom = jnp.sum(p, axis=0, keepdims=True) + e_new
        # softmax weights cast to the cache dtype for the value reduction —
        # exactly what the XLA path does (attend_cached: weights.astype(
        # cache_v.dtype)); halves the VPU traffic of the [C, HD] product
        vt = vbuf[l % 2]
        pw = expand(p).astype(vt.dtype) * vt
        pv = jnp.sum(pw.astype(jnp.float32), axis=0, keepdims=True)  # [1, HD]
        attn = (pv + expand(e_new) * vv[...]) / expand(denom)
        xs[...] = xs[...] + wchunk_dot(attn.astype(hs.dtype))  # out_proj

    def ffn_in(idx):
        @pl.when(c == 4 + idx)
        def _():
            if idx == 0:
                ln(1)
            y = wchunk_dot(hs[...])
            # exact-GELU via erf. Mosaic lowers neither erf nor erfc, so erf
            # is the Abramowitz-Stegun 7.1.26 rational approximation (abs
            # error ~1.5e-7 — far below the bf16 rounding of the g scratch),
            # keeping numerics aligned with jax.nn.gelu(approximate=False).
            z = jnp.abs(y) * (1.0 / math.sqrt(2.0))
            t = 1.0 / (1.0 + 0.3275911 * z)
            poly = t * (0.254829592 + t * (-0.284496736 + t * (
                1.421413741 + t * (-1.453152027 + t * 1.061405429))))
            erf_abs = 1.0 - poly * jnp.exp(-z * z)
            erf = jnp.sign(y) * erf_abs
            y = 0.5 * y * (1.0 + erf)
            g[:, idx * CHUNK:(idx + 1) * CHUNK] = y.astype(g.dtype)

    def ffn_out(idx):
        @pl.when(c == 8 + idx)
        def _():
            gc = g[:, idx * CHUNK:(idx + 1) * CHUNK]
            part = jax.lax.dot_general(
                gc, w_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # w2t chunk: rows are the contraction dim
            y2[...] = part if idx == 0 else y2[...] + part

    for idx in range(4):
        ffn_in(idx)
        ffn_out(idx)

    @pl.when(c == N_CHUNKS - 1)
    def _():
        xs[...] = xs[...] + y2[...] * s2_ref[0]

        @pl.when(l == n_layers - 1)
        def _():
            xo_ref[...] = xs[...].astype(out_dtype)
            # drain the last layer's row-append DMA before the kernel retires
            # (earlier layers drained at their successor's c==1)
            for d in write_dma(n_layers - 1):
                d.wait()


@functools.partial(jax.jit, static_argnames=("H", "Dh", "interpret"),
                   donate_argnums=(3, 4))
def decode_stack_tpu(x, packed, write_pos, cache_k, cache_v, mask_bias,
                     cos_lane, sin_lane, *, H: int, Dh: int,
                     interpret: bool = False):
    """One fused pass of the whole stack (see module docstring).

    x: [1, D]; packed: pack_decode_stack output; write_pos: [1] int32 (the
    slot receiving this step's k/v row); cache_k/v: [L, 1, C, H, Dh]
    (DONATED — the kernel appends in place via aliased HBM refs); mask_bias:
    [C, 1] f32 (0 valid / -inf dead); cos/sin_lane: [1, H*Dh] f32.
    Returns (h [1, D] in x.dtype, cache_k, cache_v with the row appended).
    """
    D = x.shape[-1]
    HD = H * Dh
    L = cache_k.shape[0]
    C = cache_k.shape[2]
    # The caches' only producer/consumer on this path is the kernel itself
    # (the append happens in-kernel through the aliased outputs), so the jit
    # carry settles on the default layout and this reshape is a free bitcast.
    # (Appending with an XLA-side dynamic_update_slice instead made layout
    # assignment pick a tiled cache layout and materialize ~100 MB/frame of
    # relayout copies around the kernel — measured in the compiled HLO.)
    kf = cache_k.reshape(L, C, HD)
    vf = cache_v.reshape(L, C, HD)

    kernel = functools.partial(
        _kernel, H=H, Dh=Dh, C=C, n_layers=L, out_dtype=x.dtype,
        scaled=packed["wcat"].dtype == jnp.int8)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # write_pos
        grid=(L, N_CHUNKS),
        in_specs=[
            pl.BlockSpec((1, D), lambda l, c, wp: (0, 0),
                         memory_space=pltpu.VMEM),  # x
            pl.BlockSpec((1, CHUNK, D), lambda l, c, wp: (l, c, 0),
                         memory_space=pltpu.VMEM),  # wcat (streamed)
            pl.BlockSpec((1, 1, 1, CHUNK), lambda l, c, wp: (l, c, 0, 0),
                         memory_space=pltpu.VMEM),  # scat
            pl.BlockSpec((1, 1, D), lambda l, c, wp: (l, 0, 0),
                         memory_space=pltpu.VMEM),  # s2
            pl.BlockSpec((1, 4, D), lambda l, c, wp: (l, 0, 0),
                         memory_space=pltpu.VMEM),  # normcat
            pl.BlockSpec((1, HD), lambda l, c, wp: (0, 0),
                         memory_space=pltpu.VMEM),  # cos
            pl.BlockSpec((1, HD), lambda l, c, wp: (0, 0),
                         memory_space=pltpu.VMEM),  # sin (sign-folded)
            pl.BlockSpec((C, 1), lambda l, c, wp: (0, 0),
                         memory_space=pltpu.VMEM),  # mask bias
            pl.BlockSpec(memory_space=pl.ANY),   # cache_k (HBM, streamed)
            pl.BlockSpec(memory_space=pl.ANY),   # cache_v (HBM, streamed)
        ],
        out_specs=(
            pl.BlockSpec((1, D), lambda l, c, wp: (0, 0),
                         memory_space=pltpu.VMEM),  # h
            pl.BlockSpec(memory_space=pl.ANY),   # cache_k (aliased)
            pl.BlockSpec(memory_space=pl.ANY),   # cache_v (aliased)
        ),
        scratch_shapes=[
            pltpu.VMEM((1, D), jnp.float32),        # xs (residual stream)
            pltpu.VMEM((1, D), jnp.bfloat16),       # hs (normed operand)
            pltpu.VMEM((1, HD), jnp.float32),       # q (rotated)
            pltpu.VMEM((1, HD), jnp.float32),       # k (rotated)
            pltpu.VMEM((1, HD), jnp.float32),       # v
            pltpu.VMEM((1, 4 * CHUNK), jnp.bfloat16),  # gelu outputs
            pltpu.VMEM((1, D), jnp.float32),        # w2 accumulator
            pltpu.VMEM((2, C, HD), cache_k.dtype),  # k double buffer
            pltpu.VMEM((2, C, HD), cache_v.dtype),  # v double buffer
            pltpu.VMEM((16, HD), cache_k.dtype),    # staged k append tile
            pltpu.VMEM((16, HD), cache_v.dtype),    # staged v append tile
            pltpu.SemaphoreType.DMA((2, 2)),        # read sems (slot, k/v)
            pltpu.SemaphoreType.DMA((2,)),          # write sems (k, v)
        ],
    )
    h, k_out, v_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((1, D), x.dtype),
            jax.ShapeDtypeStruct((L, C, HD), cache_k.dtype),
            jax.ShapeDtypeStruct((L, C, HD), cache_v.dtype),
        ),
        # inputs (incl. the scalar-prefetch operand at index 0): kf is
        # operand 9, vf operand 10; they alias outputs 1 and 2 (in-place
        # append on the donated buffers)
        input_output_aliases={9: 1, 10: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(write_pos.astype(jnp.int32), x, packed["wcat"], packed["scat"],
      packed["s2"], packed["norm"], cos_lane, sin_lane, mask_bias, kf, vf)
    return (h, k_out.reshape(L, 1, C, H, Dh), v_out.reshape(L, 1, C, H, Dh))


def decode_stack_apply(cfg, packed, x, state, *, interpret: bool | None = None):
    """transformer_apply's T=1 decode body on the fused kernel.

    x: [1, 1, D]; state: StackState with k/v [L, 1, C, H, Dh]. Returns the
    post-step (h [1, 1, D], StackState): the k/v row is appended IN-KERNEL at
    slot write_pos (aliased caches), and the pos map / offset / write_pos
    advance exactly like append_kv for a fully-valid T=1 block.
    `interpret=None`: auto — interpreter mode on the CPU backend (tests).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    H = cfg.num_heads
    D = cfg.d_model
    Dh = D // H
    offset = state.offset  # [1]
    valid = (state.pos[0] >= 0) & (state.pos[0] <= offset[0])  # [C]
    mask_bias = jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)[:, None]
    cos_lane, sin_lane = rope_lane_tables(offset, H, Dh, cfg.max_period)
    wp = jnp.reshape(state.write_pos, (1,))
    h, new_k, new_v = decode_stack_tpu(
        x[:, 0], packed, wp, state.k, state.v, mask_bias, cos_lane, sin_lane,
        H=H, Dh=Dh, interpret=interpret,
    )
    from pocket_tts_tpu.nn.transformer import StackState

    pos = jax.lax.dynamic_update_slice(
        state.pos, offset[:, None], (0, state.write_pos))
    new_state = StackState(
        k=new_k, v=new_v, pos=pos, offset=offset + 1,
        write_pos=state.write_pos + 1,
    )
    return h[:, None], new_state
