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
    """POCKET_TTS_TPU_GEMV: "1" = Pallas for decode GEMVs, default = never.

    Measured on v5e (full-pipeline A/B, batch-1 decode): XLA's dot wins for
    both plain and int8 weights — int8 ran 163 vs 147 audio-s/s in round 1,
    and on the 24-layer model (round 4, production schedule) the gap is
    decisive: int8 60.6 vs 38.1, bf16 45.9 vs 25.5 audio-s/s. Routing each
    GEMV to a separate Pallas launch breaks XLA's fusion across neighboring
    elementwise ops and its cross-layer weight prefetch. The kernel stays
    parity-tested as insurance against XLA GEMV regressions."""
    return "all" if os.environ.get("POCKET_TTS_TPU_GEMV") == "1" else "off"


@functools.cache
def _on_tpu() -> bool:
    import jax

    return jax.default_backend() not in ("cpu", "gpu")


def matmul_t(x: jnp.ndarray, w) -> jnp.ndarray:
    """x @ w.T for plain or int8-quantized weights (output keeps x's dtype).

    Decode-shaped calls (few rows) can route to the Pallas weight-streaming
    kernel on TPU (opt-in via POCKET_TTS_TPU_GEMV=1); everything else takes
    the XLA dot.
    """
    quant = isinstance(w, dict) and "q" in w
    W = w["q"] if quant else w
    rows = 1
    for d in x.shape[:-1]:
        rows *= d
    if (
        _gemv_mode() == "all"
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
