"""Adapters: reference torch module state_dicts -> pocket_tts_tpu parameter pytrees.

Test-side glue used by the parity suite; the production loader in
pocket_tts_tpu/core/weights.py uses the same layouts from safetensors files.
"""

import numpy as np


def t2n(t):
    return np.asarray(t.detach().cpu().numpy())


def stack_transformer_params(ref_transformer, layer_scale: bool = False):
    """reference StreamingTransformer -> stacked param dict (leaves [L, ...])."""
    layers = list(ref_transformer.layers)
    p = {
        "in_proj": np.stack([t2n(l.self_attn.in_proj.weight) for l in layers]),
        "out_proj": np.stack([t2n(l.self_attn.out_proj.weight) for l in layers]),
        "norm1_scale": np.stack([t2n(l.norm1.weight) for l in layers]),
        "norm1_bias": np.stack([t2n(l.norm1.bias) for l in layers]),
        "norm2_scale": np.stack([t2n(l.norm2.weight) for l in layers]),
        "norm2_bias": np.stack([t2n(l.norm2.bias) for l in layers]),
        "w1": np.stack([t2n(l.linear1.weight) for l in layers]),
        "w2": np.stack([t2n(l.linear2.weight) for l in layers]),
    }
    if layer_scale:
        p["ls1"] = np.stack([t2n(l.layer_scale_1.scale) for l in layers])
        p["ls2"] = np.stack([t2n(l.layer_scale_2.scale) for l in layers])
    return p
