"""Matmul helper shared by all dense layers.

Weights are either a plain [O, I] array (torch Linear layout) or a weight-only
int8 quantized dict {"q": int8 [.., O, I], "s": f32 [.., O]} (per-output-channel
scales). On TPU the int8 path reads 4x fewer HBM bytes — the decode loop at
batch 1 is weight-bandwidth-bound, so this is the same ~1.3x win the reference
gets from dynamic int8 on CPU (docs/quantization.md), obtained the XLA way: the
int8->activation-dtype convert fuses into the dot.
"""

from __future__ import annotations

import functools
import os

import jax.numpy as jnp

_MAX_GEMV_ROWS = 32


@functools.cache
def _gemv_mode() -> str:
    """POCKET_TTS_TPU_GEMV: "1" = Pallas for all decode GEMVs, "0" = never,
    unset = "auto" (Pallas only for int8 weights on TPU).

    Measured on v5e: for PLAIN bf16 weights XLA's dot already streams at
    ~990 GB/s (the kernel hits 943), so auto keeps the simpler XLA path. For
    INT8 weights XLA materializes a dequantized copy in HBM every step (read
    1B + write 2B + read 2B per weight — ~25% slower than plain bf16), while
    the kernel dequantizes in-register and streams 1 byte/weight."""
    return {"1": "all", "0": "off"}.get(os.environ.get("POCKET_TTS_TPU_GEMV", ""),
                                        "auto")


@functools.cache
def _on_tpu() -> bool:
    import jax

    return jax.default_backend() not in ("cpu", "gpu")


def matmul_t(x: jnp.ndarray, w) -> jnp.ndarray:
    """x @ w.T for plain or int8-quantized weights (output keeps x's dtype).

    Decode-shaped calls (few rows) route to the Pallas weight-streaming kernel
    on TPU (always for int8, opt-in for plain weights); everything else takes
    the XLA dot.
    """
    quant = isinstance(w, dict) and "q" in w
    W = w["q"] if quant else w
    rows = 1
    for d in x.shape[:-1]:
        rows *= d
    mode = _gemv_mode()
    use_pallas = mode == "all" or (mode == "auto" and quant)
    if (
        use_pallas
        and rows <= _MAX_GEMV_ROWS
        and W.ndim == 2
        and W.shape[0] % 128 == 0
        and W.shape[1] % 128 == 0
        and _on_tpu()
    ):
        from pocket_tts_tpu.ops.gemv import matmul_t_decode

        return matmul_t_decode(x, w)
    if quant:
        y = x @ W.T.astype(x.dtype)
        return (y * w["s"]).astype(x.dtype)
    return x @ w.T


def weight_rows(w) -> int:
    return (w["q"] if isinstance(w, dict) and "q" in w else w).shape[-2]
