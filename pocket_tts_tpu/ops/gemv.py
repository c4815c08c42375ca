"""Pallas TPU kernel: skinny matmul y = x @ W.T for decode-time activations.

At batch-1 decode every dense layer is a vector-matrix product streaming the
weight matrix from HBM — the whole step is bound by how fast W moves. XLA's
generic dot underutilizes HBM here; this kernel tiles W row-blocks through VMEM
(Pallas double-buffers grid blocks automatically, overlapping each tile's DMA
with the previous tile's FLOPs) and keeps the activation resident in VMEM.

Supports plain bf16/f32 weights and weight-only int8 dicts ({"q": int8 [O, I],
"s": f32 [O]}); the dequant (cast + per-channel scale) fuses into the tile
compute, so int8 halves the streamed bytes vs bf16.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rows are padded up to the sublane tile; weights tile over output rows
ROW_PAD = 8
DEFAULT_BLOCK_O = 512


def _kernel_plain(x_ref, w_ref, o_ref):
    w = w_ref[...]
    x = x_ref[...]
    o_ref[...] = jax.lax.dot_general(
        x, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _kernel_quant(x_ref, w_ref, s_ref, o_ref):
    w = w_ref[...].astype(x_ref.dtype)
    x = x_ref[...]
    y = jax.lax.dot_general(
        x, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[...] = (y * s_ref[...]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_o", "interpret"))
def gemv_t(x: jnp.ndarray, w, block_o: int = DEFAULT_BLOCK_O,
           interpret: bool = False) -> jnp.ndarray:
    """x: [R, I] (R small), w: [O, I] or {"q","s"} -> [R, O] in x.dtype."""
    R, I = x.shape
    quant = isinstance(w, dict)
    W = w["q"] if quant else w
    O = W.shape[0]
    bo = min(block_o, O)
    assert O % bo == 0, (O, bo)

    Rp = max(ROW_PAD, ((R + ROW_PAD - 1) // ROW_PAD) * ROW_PAD)
    if Rp != R:
        x = jnp.pad(x, ((0, Rp - R), (0, 0)))

    grid = (O // bo,)
    in_specs = [
        pl.BlockSpec((Rp, I), lambda o: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bo, I), lambda o: (o, 0), memory_space=pltpu.VMEM),
    ]
    args = [x, W]
    if quant:
        in_specs.append(pl.BlockSpec((1, bo), lambda o: (0, o),
                                     memory_space=pltpu.VMEM))
        args.append(w["s"].reshape(1, O))
        kernel = _kernel_quant
    else:
        kernel = _kernel_plain
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((Rp, bo), lambda o: (0, o), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, O), x.dtype),
        interpret=interpret,
    )(*args)
    return out[:R]


def matmul_t_decode(x: jnp.ndarray, w, interpret: bool = False) -> jnp.ndarray:
    """Drop-in for nn.linear.matmul_t on decode-shaped inputs: x [..., R, I]
    with small R. Flattens leading dims, pads rows, runs the Pallas kernel."""
    lead = x.shape[:-1]
    I = x.shape[-1]
    flat = x.reshape(-1, I)
    y = gemv_t(flat, w, interpret=interpret)
    return y.reshape(*lead, y.shape[-1])
