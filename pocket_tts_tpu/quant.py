"""Weight-only int8 quantization of the FlowLM.

Scope mirrors the reference's quantization groups (quantization.py:60-75):
"attention" (in/out projections), "ffn" (w1/w2) and "flow_net" (every linear in
the SimpleMLPAdaLN head). The default — RECOMMENDED_CONFIG — is attention+ffn
(reference quantization.py:21); "all" adds flow_net, matching the reference's
eval config of the same name (docs/quantization.md:43-49: 450 -> 234 -> 206 MB).
On TPU the mechanism differs from the reference's dynamic-int8 CPU kernels:
weights are stored int8 with per-output-channel f32 scales and dequantized
inside the dot (see nn/linear.py) — batch-1 decode is HBM-bandwidth bound on
weight reads, so int8 cuts the dominant traffic by 4x (bf16) / 4x (f32).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

RECOMMENDED_CONFIG = frozenset({"attention", "ffn"})
VALID_GROUPS = frozenset({"attention", "ffn", "flow_net"})

# named configs accepted by the CLI / load_model(quantize_config=...), covering
# the reference eval harness's config ids (scripts/evaluate_quantization.py:36)
NAMED_CONFIGS: dict[str, frozenset] = {
    "baseline": frozenset(),
    "attention": frozenset({"attention"}),
    "ffn": frozenset({"ffn"}),
    "attention_ffn": RECOMMENDED_CONFIG,
    "flow_net": frozenset({"flow_net"}),
    "all": frozenset({"attention", "ffn", "flow_net"}),
}

_ATTENTION_KEYS = ("in_proj", "out_proj")
_FFN_KEYS = ("w1", "w2")


def resolve_config(config) -> frozenset:
    """Accept a named config ("attention_ffn", "all", ...) or an explicit set
    of group names; validate against VALID_GROUPS."""
    if isinstance(config, str):
        if config not in NAMED_CONFIGS:
            raise ValueError(
                f"Unknown quantization config {config!r}; "
                f"choose one of {sorted(NAMED_CONFIGS)}"
            )
        return NAMED_CONFIGS[config]
    groups = frozenset(config)
    unknown = groups - VALID_GROUPS
    if unknown:
        raise ValueError(
            f"Unknown quantization groups {sorted(unknown)}; "
            f"valid groups are {sorted(VALID_GROUPS)}"
        )
    return groups


def quantize_weight(w, axis: int = -1) -> dict:
    """Symmetric per-output-channel int8: w [.., O, I] -> {"q": int8, "s": f32 [.., O]}."""
    w = np.asarray(w)
    amax = np.max(np.abs(w), axis=axis, keepdims=True)
    scale = np.where(amax > 0, amax / 127.0, 1.0)
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return {"q": jnp.asarray(q), "s": jnp.asarray(scale.squeeze(axis).astype(np.float32))}


def dequantize_weight(qw: dict) -> jnp.ndarray:
    return qw["q"].astype(jnp.float32) * qw["s"][..., None]


# flow-head linear layer names (see nn/flow_mlp.init_flow_mlp_params): each is
# a {"w": [.., O, I], "b": [.., O]} dict, possibly stacked over blocks. Norm
# gains ("ln", "rms_alpha") and the sinusoid "freqs" are NOT in this set.
_FLOW_LINEAR_KEYS = frozenset(
    {"l0", "l1", "cond_embed", "input_proj", "mlp0", "mlp1", "ada", "linear"}
)


def _quantize_flow_net(flow: dict) -> dict:
    """Quantize every linear weight in the flow head (the reference's
    "flow_net" group quantizes all nn.Linear in SimpleMLPAdaLN,
    quantization.py:92-93)."""

    def walk(node, name=""):
        if isinstance(node, dict):
            if name in _FLOW_LINEAR_KEYS and "w" in node:
                return {**node, "w": quantize_weight(node["w"])}
            return {k: walk(v, k) for k, v in node.items()}
        return node

    return walk(flow)


def quantize_flow_lm_int8(params: dict, config=RECOMMENDED_CONFIG) -> dict:
    """Return a copy of the FlowLM params with the selected groups quantized."""
    groups = resolve_config(config)
    out = dict(params)
    # a pre-quantization decode-stack pack would be stale — drop it; the
    # model re-packs lazily at the first step compile (pipeline/tts.py)
    out.pop("stack_packed", None)
    keys: tuple[str, ...] = ()
    if "attention" in groups:
        keys += _ATTENTION_KEYS
    if "ffn" in groups:
        keys += _FFN_KEYS
    if keys:
        t = dict(params["transformer"])
        for k in keys:
            t[k] = quantize_weight(t[k])
        out["transformer"] = t
    if "flow_net" in groups:
        out["flow_net"] = _quantize_flow_net(params["flow_net"])
    return out


def tree_nbytes(tree) -> int:
    """Total bytes of every array leaf in a pytree (host-side weight size)."""
    import jax

    return sum(
        x.size * x.dtype.itemsize
        for x in jax.tree.leaves(tree)
        if hasattr(x, "dtype")
    )


def model_memory_mb(*trees) -> float:
    """Model-weight memory in MB across param trees — the runtime-memory
    column of the reference's quantization report (docs/quantization.md:43-49,
    450 -> 234 -> 206 MB)."""
    return sum(tree_nbytes(t) for t in trees) / 1e6


def device_memory_mb() -> float | None:
    """Live HBM usage of device 0 in MB, when the backend exposes it
    (TPU memory_stats); None on backends without allocator stats (CPU)."""
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats()
    except Exception:
        return None
    if not stats or "bytes_in_use" not in stats:
        return None
    return stats["bytes_in_use"] / 1e6


def quantization_error(params: dict, qparams: dict) -> dict[str, float]:
    """Max relative error per quantized leaf (diagnostics)."""
    errs = {}
    for k, v in qparams["transformer"].items():
        if isinstance(v, dict) and "q" in v:
            w = np.asarray(params["transformer"][k])
            deq = np.asarray(dequantize_weight(v))
            errs[k] = float(np.max(np.abs(deq - w)) / (np.max(np.abs(w)) + 1e-12))
    return errs
