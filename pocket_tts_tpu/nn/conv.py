"""Streaming 1-D convolutions as pure functions with explicit carried state.

Re-designs /root/reference/pocket_tts/modules/conv.py for XLA: states are
fixed-shape pytrees ({previous, first} for conv, {partial} for transposed conv)
threaded through jit instead of mutated module attributes. Semantics are
bit-matched to the reference:

* StreamingConv1d (conv.py:36-115): left-context of `K_eff - S` samples carried
  between calls; fresh state is zeros, or the first input sample replicated when
  pad_mode="replicate" (bootstrapped via a `first` flag).
* StreamingConvTranspose1d (conv.py:118-163): overlap-add of the trailing `K - S`
  partial output, with the bias subtracted from the saved partial so it is only
  added once.

Arrays are [B, C, T] (channel-major) to match reference weights; weight layout is
torch's ([C_out, C_in/groups, K] conv, [C_in, C_out/groups, K] conv-transpose).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class ConvParams(NamedTuple):
    weight: jnp.ndarray  # [C_out, C_in/groups, K]
    bias: jnp.ndarray | None


class ConvSpec(NamedTuple):
    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    pad_mode: str = "constant"  # "constant" | "replicate"

    @property
    def effective_kernel_size(self) -> int:
        return (self.kernel_size - 1) * self.dilation + 1


class ConvState(NamedTuple):
    previous: jnp.ndarray  # [B, C_in, K_eff - S]
    first: jnp.ndarray  # [B] bool


class ConvTrSpec(NamedTuple):
    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    groups: int = 1


class ConvTrState(NamedTuple):
    partial: jnp.ndarray  # [B, C_out, K - S]


def get_extra_padding_for_conv1d(
    length: int, kernel_size: int, stride: int, padding_total: int = 0
) -> int:
    """Extra right-padding so the last conv window is full (conv.py:11-18)."""
    n_frames = (length - kernel_size + padding_total) / stride + 1
    ideal_length = (math.ceil(n_frames) - 1) * stride + (kernel_size - padding_total)
    return ideal_length - length


def pad_for_conv1d(x: jnp.ndarray, kernel_size: int, stride: int) -> jnp.ndarray:
    extra = get_extra_padding_for_conv1d(x.shape[-1], kernel_size, stride)
    if extra <= 0:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, extra)))


def _conv1d_matmul(x: jnp.ndarray, spec: ConvSpec, params: ConvParams) -> jnp.ndarray:
    """Stride-1 groups-1 conv as K shifted time-major matmuls.

    MEASURED NEGATIVE on v5e (kept as the record + parity test): routing the
    codec decoder's convs here at b128 regressed 2,159 -> 1,567 audio-s/s.
    The conv op's internal accumulator never materializes partial products,
    while this form writes K f32 [B, T, O] partials to HBM — at the decoder's
    long-T low-C tail stages (T up to 61K samples) that is ~14 GB per block,
    dwarfing the conv lowering's poor MXU utilization. A Pallas conv kernel
    with VMEM accumulation would be the way to beat the conv op, not this."""
    w = params.weight  # [O, C, K]
    T = x.shape[2]
    T_out = T - spec.effective_kernel_size + 1
    xt = x.transpose(0, 2, 1)  # [B, T, C] time-major (one relayout)
    acc = None
    for k in range(spec.kernel_size):
        off = k * spec.dilation
        xs = lax.slice_in_dim(xt, off, off + T_out, axis=1)
        part = jnp.einsum("btc,oc->bto", xs, w[:, :, k],
                          preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    y = acc.astype(w.dtype).transpose(0, 2, 1)
    if params.bias is not None:
        y = y + params.bias[None, :, None]
    return y


def conv1d_raw(x: jnp.ndarray, spec: ConvSpec, params: ConvParams) -> jnp.ndarray:
    """VALID-padding grouped/dilated conv on [B, C, T]. Weight dtype sets the
    compute dtype (mixed-precision entry point)."""
    x = x.astype(params.weight.dtype)
    y = lax.conv_general_dilated(
        x,
        params.weight,
        window_strides=(spec.stride,),
        padding="VALID",
        rhs_dilation=(spec.dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=spec.groups,
    )
    if params.bias is not None:
        y = y + params.bias[None, :, None]
    return y


def init_conv_state(spec: ConvSpec, batch_size: int, dtype=jnp.float32) -> ConvState:
    ctx = spec.effective_kernel_size - spec.stride
    return ConvState(
        previous=jnp.zeros((batch_size, spec.in_channels, ctx), dtype),
        first=jnp.ones((batch_size,), jnp.bool_),
    )


def conv1d_step(
    x: jnp.ndarray, spec: ConvSpec, params: ConvParams, state: ConvState | None
) -> tuple[jnp.ndarray, ConvState]:
    """Streaming causal conv over a chunk x: [B, C, T] (T multiple of stride).

    Pass state=None for a one-shot call (fresh zero/replicate left context).
    """
    B = x.shape[0]
    if state is None:
        state = init_conv_state(spec, B, x.dtype)
    ctx = spec.effective_kernel_size - spec.stride
    if ctx == 0:
        return conv1d_raw(x, spec, params), state
    previous = state.previous
    if spec.pad_mode == "replicate":
        init = jnp.broadcast_to(x[:, :, :1], previous.shape)
        previous = jnp.where(state.first[:, None, None], init, previous)
    full = jnp.concatenate([previous, x], axis=-1)
    y = conv1d_raw(full, spec, params)
    new_state = ConvState(
        previous=full[:, :, -ctx:],
        first=jnp.zeros_like(state.first),
    )
    return y, new_state


def conv_transpose1d_raw(x: jnp.ndarray, spec: ConvTrSpec, params: ConvParams) -> jnp.ndarray:
    """Full transposed conv on [B, C, T] -> [B, C_out, (T-1)*S + K].

    Weight layout is torch's ConvTranspose1d [C_in, C_out/groups, K]; implemented
    as an input-dilated correlation with the kernel flipped and transposed.
    """
    w = params.weight  # [C_in, C_out/groups, K]
    x = x.astype(w.dtype)
    K = spec.kernel_size
    if spec.groups == 1:
        kernel = jnp.flip(w, axis=-1).transpose(1, 0, 2)  # [C_out, C_in, K]
        fgc = 1
    else:
        # Grouped: build the [C_out, C_in/groups, K] correlation kernel. For group
        # g, out channels g*og:(g+1)*og take inputs g*ig:(g+1)*ig.
        ig = spec.in_channels // spec.groups
        og = spec.out_channels // spec.groups
        wg = jnp.flip(w, axis=-1).reshape(spec.groups, ig, og, K)
        kernel = wg.transpose(0, 2, 1, 3).reshape(spec.out_channels, ig, K)
        fgc = spec.groups
    y = lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1,),
        padding=[(K - 1, K - 1)],
        lhs_dilation=(spec.stride,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=fgc,
    )
    if params.bias is not None:
        y = y + params.bias[None, :, None]
    return y


def init_conv_tr_state(spec: ConvTrSpec, batch_size: int, dtype=jnp.float32) -> ConvTrState:
    return ConvTrState(
        partial=jnp.zeros(
            (batch_size, spec.out_channels, spec.kernel_size - spec.stride), dtype
        )
    )


def conv_transpose1d_step(
    x: jnp.ndarray, spec: ConvTrSpec, params: ConvParams, state: ConvTrState
) -> tuple[jnp.ndarray, ConvTrState]:
    """Streaming transposed conv: emits T*S samples, carries K-S overlap-add tail."""
    y = conv_transpose1d_raw(x, spec, params)
    PT = spec.kernel_size - spec.stride
    if PT == 0:
        return y, state
    head = y[:, :, :PT] + state.partial
    y = jnp.concatenate([head, y[:, :, PT:]], axis=-1)
    tail = y[:, :, -PT:]
    if params.bias is not None:
        tail = tail - params.bias[None, :, None]
    return y[:, :, :-PT], ConvTrState(partial=tail)


def init_conv_params(spec, key, dtype=jnp.float32, bias: bool = True) -> ConvParams:
    """Torch-style fan-in uniform init."""
    if isinstance(spec, ConvSpec):
        shape = (spec.out_channels, spec.in_channels // spec.groups, spec.kernel_size)
        fan_in = (spec.in_channels // spec.groups) * spec.kernel_size
        bias_ch = spec.out_channels
    else:
        shape = (spec.in_channels, spec.out_channels // spec.groups, spec.kernel_size)
        fan_in = (spec.out_channels // spec.groups) * spec.kernel_size
        bias_ch = spec.out_channels
    bound = 1.0 / math.sqrt(fan_in)
    k1, k2 = jax.random.split(key)
    weight = jax.random.uniform(k1, shape, dtype, -bound, bound)
    b = jax.random.uniform(k2, (bias_ch,), dtype, -bound, bound) if bias else None
    return ConvParams(weight=weight, bias=b)
