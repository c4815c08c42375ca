"""Weight-only int8 quantization of the FlowLM transformer.

Scope matches the reference RECOMMENDED_CONFIG ("attention" + "ffn",
quantization.py:21): only the backbone attention and FFN projections are
quantized; the flow head and Mimi stay f32 (quantization.py:8-9 notes quality
loss otherwise). On TPU the mechanism differs from the reference's dynamic-int8
CPU kernels: weights are stored int8 with per-output-channel f32 scales and
dequantized inside the dot (see nn/linear.py) — batch-1 decode is HBM-bandwidth
bound on weight reads, so int8 cuts the dominant traffic by 4x.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

RECOMMENDED_CONFIG = frozenset({"attention", "ffn"})

_ATTENTION_KEYS = ("in_proj", "out_proj")
_FFN_KEYS = ("w1", "w2")


def quantize_weight(w, axis: int = -1) -> dict:
    """Symmetric per-output-channel int8: w [.., O, I] -> {"q": int8, "s": f32 [.., O]}."""
    w = np.asarray(w)
    amax = np.max(np.abs(w), axis=axis, keepdims=True)
    scale = np.where(amax > 0, amax / 127.0, 1.0)
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return {"q": jnp.asarray(q), "s": jnp.asarray(scale.squeeze(axis).astype(np.float32))}


def dequantize_weight(qw: dict) -> jnp.ndarray:
    return qw["q"].astype(jnp.float32) * qw["s"][..., None]


def quantize_flow_lm_int8(params: dict, config=RECOMMENDED_CONFIG) -> dict:
    """Return a copy of the FlowLM params with backbone projections quantized."""
    keys: tuple[str, ...] = ()
    if "attention" in config:
        keys += _ATTENTION_KEYS
    if "ffn" in config:
        keys += _FFN_KEYS
    out = dict(params)
    t = dict(params["transformer"])
    for k in keys:
        t[k] = quantize_weight(t[k])
    out["transformer"] = t
    return out


def quantization_error(params: dict, qparams: dict) -> dict[str, float]:
    """Max relative error per quantized leaf (diagnostics)."""
    errs = {}
    for k, v in qparams["transformer"].items():
        if isinstance(v, dict) and "q" in v:
            w = np.asarray(params["transformer"][k])
            deq = np.asarray(dequantize_weight(v))
            errs[k] = float(np.max(np.abs(deq - w)) / (np.max(np.abs(w)) + 1e-12))
    return errs
