"""Pallas TPU kernel: the whole SEANet decoder as ONE fused VMEM-resident program.

The per-frame codec decode (reference seanet.py:116-180, conv.py:118-163) is a
chain of ~15 small convolutions over tiny activations (16..1920 positions,
32..512 channels, ~330 MFLOPs total). Run as individual XLA ops, every one of
them round-trips its activation through HBM and pays kernel-launch overhead;
the whole stack is latency- not FLOP-bound. This kernel stages all decoder
weights (~8.6 MB bf16) and every intermediate activation in VMEM and emits the
1920-sample frame in a single launch.

Design notes:
* Activations are [B, T, C] (positions on sublanes, channels on lanes); batch
  folds into matmul rows, so one program serves B>=1 (bounded by VMEM).
* conv (stride 1, dilation d): accumulate K matmuls `full[:, k*d : k*d+T] @ W_k`
  with W pre-packed as [K, Cin, Cout] — no im2col materialization.
* conv-transpose (K = 2S, the only shape SEANet uses): one matmul against the
  pre-packed [Cin, K*Cout] kernel, then a static two-row overlap-add — the
  input-dilated correlation XLA uses wastes S x the MXU work on zeros.
* Streaming conv left-contexts / conv-transpose overlap tails are kernel inputs
  and outputs (pure function, like nn/conv.py's step functions). The
  replicate-pad first-step substitution happens OUTSIDE the kernel (host-side
  `where` on the tiny state), so the kernel sees plain arrays.
* Numerics match nn/conv.py's XLA path: matmuls accumulate in f32
  (`preferred_element_type`), results round to the weight dtype between ops,
  biases add in the weight dtype.

Parity is tested in interpret mode against `nn.seanet.seanet_apply`
(tests/test_codec_fused.py); the production path enables it on TPU for bf16
params via models/mimi.decoder_step.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pocket_tts_tpu.nn.conv import ConvSpec, ConvTrSpec
from pocket_tts_tpu.nn.seanet import SEANetSpec

# Rows of the batch processed per grid step. v5e VMEM is ~16 MB/core; the
# decoder weights (8.6 MB bf16) stay resident across the whole grid (constant
# index map) and each step's activations peak at ~2 MB/row f32 (the convtr
# matmul accumulator at the 1920-sample stage), so 4 rows fit and 8 do not
# (measured: bf16 b8 single-block failed Mosaic allocation; b4 compiled).
# Larger batches run more sequential grid steps instead of falling back to XLA.
BATCH_TILE = 4


def decoder_is_fusable(spec: SEANetSpec) -> bool:
    """The kernel covers stride-1 convs and K=2S transposed convs (all SEANet
    decoders); anything else falls back to the XLA op program. Replicate-pad
    bootstrapping is only resolvable pre-kernel for the stem (op 0), whose own
    first input sample is available on the host side — a replicate conv deeper
    in the program must fall back rather than hit seanet_decoder_fused's
    NotImplementedError at trace time."""
    for i, (kind, op) in enumerate(spec.ops):
        if kind == "conv":
            if op.stride != 1:
                return False
            if op.pad_mode == "replicate" and i != 0 and _conv_ctx(op) > 0:
                return False
        if kind == "convtr" and (op.kernel_size != 2 * op.stride or op.groups != 1):
            return False
        if kind == "resblock":
            for cspec in op.convs:
                if cspec.pad_mode == "replicate" and _conv_ctx(cspec) > 0:
                    return False
    return True


def pack_decoder_params(spec: SEANetSpec, params: dict) -> dict:
    """Re-layout torch-convention conv weights for the kernel, ONCE per model.

    conv  [Cout, Cin, K]  -> [K, Cin, Cout]   (per-tap matmul operands)
    convtr[Cin, Cout, K]  -> [Cin, K*Cout]    (single-matmul operand)
    biases -> [1, Cout] (2-D for VMEM).
    """

    def pack_conv(p):
        w = jnp.transpose(p.weight, (2, 1, 0))
        b = None if p.bias is None else p.bias.reshape(1, -1)
        return {"w": w, **({"b": b} if b is not None else {})}

    def pack_convtr(p):
        # output channels pad to a multiple of 128 lanes: Mosaic's shape cast
        # for the phase-interleave reshape ((T, S*C) -> (T*S, C)) requires the
        # destination lane dim to be a 128 multiple (probed on v5e; C=64 fails)
        ci, co, k = p.weight.shape
        cop = -(-co // 128) * 128
        w = p.weight
        b = p.bias
        if cop != co:
            w = jnp.pad(w, ((0, 0), (0, cop - co), (0, 0)))
            b = None if b is None else jnp.pad(b, (0, cop - co))
        w = jnp.transpose(w, (0, 2, 1)).reshape(ci, k * cop)
        b = None if b is None else b.reshape(1, -1)
        return {"w": w, **({"b": b} if b is not None else {})}

    packed: dict = {}
    for i, (kind, op) in enumerate(spec.ops):
        key = str(i)
        if kind == "conv":
            packed[key] = pack_conv(params[key])
        elif kind == "convtr":
            packed[key] = pack_convtr(params[key])
        elif kind == "resblock":
            packed[key] = [pack_conv(p) for p in params[key]]
    return packed


def _conv_ctx(op: ConvSpec) -> int:
    return op.effective_kernel_size - op.stride


def _flatten_io(spec: SEANetSpec, packed: dict, state: dict, wdtype):
    """Walk the op program collecting (weight arrays, state-in arrays) in kernel
    argument order, plus per-op slots describing what the kernel body consumes."""
    weights: list[jnp.ndarray] = []
    states: list[jnp.ndarray] = []
    slots: list[dict] = []

    def add_conv(op: ConvSpec, p: dict, s):
        slot = {"kind": "conv", "op": op, "wi": len(weights), "bias": "b" in p}
        weights.append(p["w"])
        if "b" in p:
            weights.append(p["b"])
        if _conv_ctx(op) > 0:
            slot["si"] = len(states)
            # [B, ctx, C], cast to the compute dtype (XLA path concatenates
            # state+input and casts the whole window inside conv1d_raw)
            states.append(jnp.transpose(s.previous, (0, 2, 1)).astype(wdtype))
        slots.append(slot)

    for i, (kind, op) in enumerate(spec.ops):
        key = str(i)
        if kind == "elu":
            slots.append({"kind": "elu"})
        elif kind == "conv":
            add_conv(op, packed[key], state[key])
        elif kind == "convtr":
            p = packed[key]
            slot = {"kind": "convtr", "op": op, "wi": len(weights), "bias": "b" in p,
                    "si": len(states)}
            weights.append(p["w"])
            if "b" in p:
                weights.append(p["b"])
            states.append(
                jnp.transpose(state[key].partial, (0, 2, 1)).astype(wdtype)
            )  # [B, PT, C]
            slots.append(slot)
        elif kind == "resblock":
            slot = {"kind": "res_begin"}
            slots.append(slot)
            for j, cspec in enumerate(op.convs):
                slots.append({"kind": "elu"})
                add_conv(cspec, packed[key][j], state[key][j])
            slots.append({"kind": "res_end"})
    return weights, states, slots


def _elu(x: jnp.ndarray) -> jnp.ndarray:
    """ELU without expm1 (unimplemented in the Mosaic TPU lowering). exp runs
    on the clamped negative half so the positive branch can't overflow.

    All math (including the comparison and min) runs in f32: v5e Mosaic has no
    bf16 `cmpf` lowering — `x > 0` on a bf16 vector is exactly the compile
    failure that zeroed BENCH_r01 — and the f32 exp is also more accurate than
    a bf16 one. Result rounds back to the activation dtype, matching the XLA
    path's op-boundary rounding."""
    xf = x.astype(jnp.float32)
    y = jnp.where(xf > 0.0, xf, jnp.exp(jnp.minimum(xf, 0.0)) - 1.0)
    return y.astype(x.dtype)


def _build_kernel(slots, n_w: int, n_s: int, B: int, T0: int, out_len: int,
                  wdtype, grid_mode: bool):
    """grid_mode: row-tiled refs carry a leading grid axis of size 1
    ([1, Bt, ...]) so Mosaic's block-shape rule (last two dims divisible by
    (8, 128) or equal to the array dims) is satisfied for every state shape;
    the kernel peels it off on load and re-adds it on store."""

    def load(ref):
        return ref[0] if grid_mode else ref[...]

    def store(ref, val):
        if grid_mode:
            ref[0] = val
        else:
            ref[...] = val

    def kernel(*refs):
        w_refs = refs[:n_w]
        s_refs = refs[n_w : n_w + n_s]
        x_ref = refs[n_w + n_s]
        audio_ref = refs[n_w + n_s + 1]
        s_out_refs = refs[n_w + n_s + 2 :]

        h = load(x_ref)  # [B, T, C]
        residual = None
        for slot in slots:
            kind = slot["kind"]
            if kind == "elu":
                h = _elu(h)
            elif kind == "res_begin":
                residual = h
            elif kind == "res_end":
                h = residual + h
                residual = None
            elif kind == "conv":
                op = slot["op"]
                K, d = op.kernel_size, op.dilation
                ctx = _conv_ctx(op)
                if ctx > 0:
                    prev = load(s_refs[slot["si"]])
                    full = jnp.concatenate([prev, h], axis=1)
                    store(s_out_refs[slot["si"]], full[:, -ctx:, :])
                else:
                    full = h
                T = full.shape[1] - ctx
                Cin = full.shape[2]
                acc = None
                for k in range(K):
                    win = full[:, k * d : k * d + T, :].reshape(B * T, Cin)
                    y = jax.lax.dot_general(
                        win, w_refs[slot["wi"]][k],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    acc = y if acc is None else acc + y
                h = acc.astype(wdtype)
                if slot["bias"]:
                    h = h + w_refs[slot["wi"] + 1][...]
                h = h.reshape(B, T, -1)
            elif kind == "convtr":
                op = slot["op"]
                S = op.stride
                PT = op.kernel_size - S  # == S
                Cout = op.out_channels
                K = op.kernel_size
                T = h.shape[1]
                w = w_refs[slot["wi"]][...]
                Cp = w.shape[1] // K  # 128-padded output channels
                u = jax.lax.dot_general(
                    h.reshape(B * T, h.shape[2]), w,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(wdtype).reshape(B, T, K * Cp)
                # lane layout of u[b, t]: [tap0 | tap1 | ... | tap_{K-1}], Cp
                # lanes each; taps 0..S-1 land at rows t*S+j (the "A" half),
                # taps S..2S-1 one input later (the "B" half)
                a = u[:, :, : S * Cp].reshape(B, T * S, Cp)
                bpart = u[:, :, S * Cp :].reshape(B, T * S, Cp)
                zrow = jnp.zeros((B, S, Cp), wdtype)
                full = (
                    jnp.concatenate([a, zrow], axis=1)
                    + jnp.concatenate([zrow, bpart], axis=1)
                )  # [B, T*S + S, Cp]
                if slot["bias"]:
                    bias = w_refs[slot["wi"] + 1][...]
                    full = full + bias
                else:
                    bias = None
                full = full[:, :, :Cout]
                tail = full[:, T * S :, :]
                if bias is not None:
                    tail = tail - bias[:, :Cout]
                store(s_out_refs[slot["si"]], tail)
                emit = full[:, : T * S, :]
                head = emit[:, :PT, :] + load(s_refs[slot["si"]])
                h = jnp.concatenate([head, emit[:, PT:, :]], axis=1)

        store(audio_ref, h[:, :, 0])

    return kernel


def seanet_decoder_fused(
    spec: SEANetSpec,
    packed: dict,
    x: jnp.ndarray,
    state: dict,
    *,
    interpret: bool | None = None,
) -> tuple[jnp.ndarray, dict]:
    """Fused replacement for `seanet_apply(decoder_spec, ...)` on the streaming
    path. x: [B, C, T] (channel-major, like seanet_apply); returns
    (audio [B, 1, T_out], new_state) with identical semantics.

    interpret=None auto-selects: compiled on TPU, interpreter elsewhere (lets
    the forced-on CPU path run for testing).

    Any batch size: rows are processed BATCH_TILE at a time by a 1-D grid —
    the packed weights use a constant index map so Mosaic keeps them VMEM-
    resident across grid steps, while per-row activations/states stream
    through in tiles that fit the ~16 MB budget. Batches that don't divide
    the tile are padded with garbage rows whose outputs are sliced away.
    """
    if interpret is None:
        interpret = jax.default_backend() in ("cpu", "gpu")
    B, C0, T0 = x.shape
    wdtype = x.dtype

    Bt = min(B, BATCH_TILE)
    Bp = -(-B // Bt) * Bt

    # resolve replicate-pad bootstrap outside the kernel (cheap, tiny states).
    # Replicate init needs the conv's own first input sample, which is only
    # available pre-kernel for the stem (op 0); SEANet decoders use constant
    # padding everywhere, so deeper replicate convs fall back to the XLA path.
    resolved: dict[str, Any] = {}
    for i, (kind, op) in enumerate(spec.ops):
        key = str(i)
        if kind == "conv" and _conv_ctx(op) > 0:
            s = state[key]
            prev = s.previous
            if op.pad_mode == "replicate":
                if i != 0:
                    raise NotImplementedError("replicate pad inside fused decoder")
                init = jnp.broadcast_to(x[:, :, :1], prev.shape)
                prev = jnp.where(s.first[:, None, None], init, prev)
            resolved[key] = s._replace(previous=prev)
        elif kind == "resblock":
            for cspec in op.convs:
                if _conv_ctx(cspec) > 0 and cspec.pad_mode == "replicate":
                    raise NotImplementedError("replicate pad inside fused decoder")
            resolved[key] = list(state[key])
        else:
            resolved[key] = state.get(key)

    weights, states_in, slots = _flatten_io(spec, packed, resolved, wdtype)

    x_in = x.transpose(0, 2, 1).astype(wdtype)

    # output geometry: stride-1 convs and elu preserve T; convtr scales by S
    out_len = T0
    for kind, op in spec.ops:
        if kind == "convtr":
            out_len *= op.stride

    grid_mode = B > BATCH_TILE
    kernel = _build_kernel(slots, len(weights), len(states_in), Bt, T0, out_len,
                           wdtype, grid_mode)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)

    if not grid_mode:
        # single block, no grid: every ref covers its whole array
        out_shapes = [jax.ShapeDtypeStruct((B, out_len), wdtype)] + [
            jax.ShapeDtypeStruct(s.shape, s.dtype) for s in states_in
        ]
        outs = pl.pallas_call(
            kernel,
            in_specs=[vmem] * (len(weights) + len(states_in) + 1),
            out_specs=[vmem] * len(out_shapes),
            out_shape=out_shapes,
            interpret=interpret,
        )(*weights, *states_in, x_in)
        audio = outs[0][:, None, :]
        new_flat = list(outs[1:])
    else:
        # 1-D grid over row tiles. Row-tiled arrays are reshaped to
        # [G, Bt, ...] so every block dim equals its array dim except the
        # leading grid axis (Mosaic's block-shape divisibility rule); the
        # packed weights keep a constant index map and stay VMEM-resident
        # across the sequential grid steps.
        G = Bp // Bt

        def to_tiles(a):
            if Bp != B:  # garbage rows; outputs sliced away below
                a = jnp.pad(a, ((0, Bp - B),) + ((0, 0),) * (a.ndim - 1))
            return a.reshape((G, Bt) + a.shape[1:])

        def whole(arr):  # resident across grid steps (constant index map)
            return pl.BlockSpec(arr.shape, lambda i, nd=arr.ndim: (0,) * nd,
                                memory_space=pltpu.VMEM)

        def row_tile(shape):  # shape: [G, Bt, ...]; one tile per grid step
            block = (1,) + tuple(shape[1:])
            return pl.BlockSpec(
                block, lambda i, nd=len(shape): (i,) + (0,) * (nd - 1),
                memory_space=pltpu.VMEM,
            )

        tiled_states = [to_tiles(s) for s in states_in]
        x_tiled = to_tiles(x_in)
        out_shapes = [jax.ShapeDtypeStruct((G, Bt, out_len), wdtype)] + [
            jax.ShapeDtypeStruct(s.shape, s.dtype) for s in tiled_states
        ]
        outs = pl.pallas_call(
            kernel,
            grid=(G,),
            in_specs=[whole(w) for w in weights]
            + [row_tile(s.shape) for s in tiled_states]
            + [row_tile(x_tiled.shape)],
            out_specs=[row_tile(o.shape) for o in out_shapes],
            out_shape=out_shapes,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)
            ),
            interpret=interpret,
        )(*weights, *tiled_states, x_tiled)

        def from_tiles(a):
            return a.reshape((Bp,) + a.shape[2:])[:B]

        audio = from_tiles(outs[0])[:, None, :]
        new_flat = [from_tiles(o) for o in outs[1:]]

    # scatter the flat new states back into the pytree
    new_state: dict = {}
    si = 0

    def take():
        nonlocal si
        arr = new_flat[si].transpose(0, 2, 1)  # back to [B, C, T]
        si += 1
        return arr

    # ctx-0 convs pass their state through untouched (conv1d_step does the same:
    # it returns early before flipping `first`)
    for i, (kind, op) in enumerate(spec.ops):
        key = str(i)
        if kind == "conv":
            s = resolved[key]
            if _conv_ctx(op) > 0:
                new_state[key] = s._replace(
                    previous=take(), first=jnp.zeros_like(s.first)
                )
            else:
                new_state[key] = s
        elif kind == "convtr":
            new_state[key] = state[key]._replace(partial=take())
        elif kind == "resblock":
            ss = []
            for j, cspec in enumerate(op.convs):
                s = resolved[key][j]
                if _conv_ctx(cspec) > 0:
                    ss.append(s._replace(previous=take(),
                                         first=jnp.zeros_like(s.first)))
                else:
                    ss.append(s)
            new_state[key] = ss
    assert si == len(new_flat), (si, len(new_flat))
    return audio, new_state
