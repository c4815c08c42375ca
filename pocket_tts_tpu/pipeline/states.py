"""Voice-state (de)serialization, byte-compatible with the reference format.

A voice is the FlowLM KV cache filled by one prompting pass over the encoded
voice audio (tts_model.py:787-905). The reference exports it as safetensors with
keys "transformer.layers.{i}.self_attn/{offset,cache}" where cache is
[2, B, T, H, Dh] NaN-filled beyond the offset (tts_model.py:1047-1072). Our
runtime state is a single stacked StackState ([L, B, C, H, Dh]); these helpers
convert both ways, including the legacy `current_end` encoding.
"""

from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp
import numpy as np

from pocket_tts_tpu.nn.transformer import StackState


def state_to_reference_dict(state: StackState) -> dict[str, np.ndarray]:
    """StackState -> flat {"module/key": array} dict in the reference layout."""
    out: dict[str, np.ndarray] = {}
    L = state.k.shape[0]
    k = np.asarray(state.k)
    v = np.asarray(state.v)
    offset = np.asarray(state.offset, dtype=np.int64)
    upto = int(offset.max()) if offset.size else 0
    for layer in range(L):
        cache = np.stack([k[layer], v[layer]]).astype(np.float32)
        # reference caches are NaN beyond the write watermark
        cache[:, :, upto:] = np.nan
        name = f"transformer.layers.{layer}.self_attn"
        out[f"{name}/offset"] = offset
        out[f"{name}/cache"] = cache
    return out


def export_model_state(state: StackState, dest: str | Path) -> None:
    from safetensors.numpy import save_file

    save_file(state_to_reference_dict(state), str(dest))


def import_model_state(source: str | Path, capacity: int | None = None) -> StackState:
    """Load a reference-format voice state; optionally expand to `capacity`."""
    from safetensors import safe_open

    modules: dict[str, dict[str, np.ndarray]] = {}
    with safe_open(str(source), framework="np") as f:
        for key in f.keys():
            module_name, tensor_key = key.split("/")
            entry = modules.setdefault(module_name, {})
            if tensor_key == "current_end":
                # legacy: step index was encoded as shape[0] for torch.compile
                entry["offset"] = np.full((1,), f.get_tensor(key).shape[0], dtype=np.int64)
            else:
                entry[tensor_key] = f.get_tensor(key)

    names = sorted(modules, key=lambda n: int(n.split(".")[2]))
    ks, vs = [], []
    offset = None
    for name in names:
        cache = modules[name]["cache"]
        ks.append(cache[0])
        vs.append(cache[1])
        offset = modules[name]["offset"]
    k = np.nan_to_num(np.stack(ks), nan=0.0)
    v = np.nan_to_num(np.stack(vs), nan=0.0)
    B = k.shape[1]
    off = np.broadcast_to(np.asarray(offset, np.int32).reshape(-1)[:1], (B,)).astype(np.int32)
    state = StackState(k=jnp.asarray(k), v=jnp.asarray(v), offset=jnp.asarray(off))
    if capacity is not None:
        state = expand_state(state, capacity)
    return state


def expand_state(state: StackState, capacity: int) -> StackState:
    """Grow (or keep) the cache capacity; the TPU analog of _expand_kv_cache
    (tts_model.py:390-421) with zeros instead of NaN fill."""
    cur = state.k.shape[2]
    if cur >= capacity:
        return state
    pad = [(0, 0), (0, 0), (0, capacity - cur), (0, 0), (0, 0)]
    return StackState(
        k=jnp.pad(state.k, pad), v=jnp.pad(state.v, pad), offset=state.offset
    )


def batch_states(states: list[StackState], capacity: int) -> StackState:
    """Stack several B=1 voice states into one batched state (per-row offsets)."""
    expanded = [expand_state(s, capacity) for s in states]
    return StackState(
        k=jnp.concatenate([s.k for s in expanded], axis=1),
        v=jnp.concatenate([s.v for s in expanded], axis=1),
        offset=jnp.concatenate([s.offset for s in expanded]),
    )
