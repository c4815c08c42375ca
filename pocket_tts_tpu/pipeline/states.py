"""Voice-state (de)serialization, byte-compatible with the reference format.

A voice is the FlowLM KV cache filled by one prompting pass over the encoded
voice audio (tts_model.py:787-905). The reference exports it as safetensors with
keys "transformer.layers.{i}.self_attn/{offset,cache}" where cache is
[2, B, T, H, Dh] in POSITION order, NaN-filled beyond the offset
(tts_model.py:1047-1072). Our runtime state is a single stacked StackState
([L, B, C, H, Dh]) whose slots are in WRITE order with an explicit slot->position
map (nn/transformer.StackState); these helpers convert both ways — compacting
slots by position on export — including the legacy `current_end` encoding.
"""

from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp
import numpy as np

from pocket_tts_tpu.core.typecheck import typechecked
from pocket_tts_tpu.nn.transformer import StackState


def state_to_reference_dict(state: StackState) -> dict[str, np.ndarray]:
    """StackState -> flat {"module/key": array} dict in the reference layout.

    Slots are gathered into position order; every real position 0..offset-1
    occupies exactly one slot (padding slots carry pos = -1 and are dropped).
    """
    out: dict[str, np.ndarray] = {}
    L, B = state.k.shape[0], state.k.shape[1]
    k = np.asarray(state.k)
    v = np.asarray(state.v)
    pos = np.asarray(state.pos)  # [B, C]
    offset = np.asarray(state.offset, dtype=np.int64)
    upto = int(offset.max()) if offset.size else 0
    # per-row slot index for each position p: slot_of[b, p]
    slot_of = np.zeros((B, upto), np.int64)
    for b in range(B):
        valid = pos[b] >= 0
        slots = np.nonzero(valid)[0]
        p = pos[b, slots]
        keep = p < offset[b]
        slot_of[b, : keep.sum()] = slots[keep][np.argsort(p[keep])]
    rows = np.arange(B)[:, None]
    for layer in range(L):
        ordered_k = k[layer][rows, slot_of]  # [B, upto, H, Dh]
        ordered_v = v[layer][rows, slot_of]
        cache = np.stack([ordered_k, ordered_v]).astype(np.float32)
        # rows shorter than upto are NaN beyond their own offset, matching the
        # reference's NaN watermark
        for b in range(B):
            cache[:, b, int(offset[b]):] = np.nan
        name = f"transformer.layers.{layer}.self_attn"
        out[f"{name}/offset"] = offset
        out[f"{name}/cache"] = cache
    return out


@typechecked(state=StackState, dest=(str, Path))
def export_model_state(state: StackState, dest: str | Path) -> None:
    from safetensors.numpy import save_file

    save_file(state_to_reference_dict(state), str(dest))


def import_model_state(source: str | Path, capacity: int | None = None) -> StackState:
    """Load a reference-format voice state (slot == position); optionally expand."""
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
    B, C = k.shape[1], k.shape[2]
    off = np.broadcast_to(np.asarray(offset, np.int32).reshape(-1)[:1], (B,)).astype(np.int32)
    pos = np.where(
        np.arange(C, dtype=np.int32)[None, :] < off[:, None],
        np.arange(C, dtype=np.int32)[None, :],
        -1,
    )
    state = StackState(
        k=jnp.asarray(k),
        v=jnp.asarray(v),
        pos=jnp.asarray(pos),
        offset=jnp.asarray(off),
        write_pos=jnp.asarray(int(off.max()) if off.size else 0, jnp.int32),
    )
    if capacity is not None:
        state = expand_state(state, capacity)
    return state


def expand_state(state: StackState, capacity: int) -> StackState:
    """Grow (or keep) the cache capacity; the TPU analog of _expand_kv_cache
    (tts_model.py:390-421) with zeros instead of NaN fill (new slots: pos=-1)."""
    cur = state.k.shape[2]
    if cur >= capacity:
        return state
    pad = [(0, 0), (0, 0), (0, capacity - cur), (0, 0), (0, 0)]
    return StackState(
        k=jnp.pad(state.k, pad),
        v=jnp.pad(state.v, pad),
        pos=jnp.pad(state.pos, [(0, 0), (0, capacity - cur)], constant_values=-1),
        offset=state.offset,
        write_pos=state.write_pos,
    )


def batch_states(states: list[StackState], capacity: int) -> StackState:
    """Stack several B=1 voice states into one batched state (per-row offsets).

    Rows keep their own slot layouts (pos maps them); the merged write pointer
    is the max so appends land on fresh slots for every row."""
    expanded = [expand_state(s, capacity) for s in states]
    return StackState(
        k=jnp.concatenate([s.k for s in expanded], axis=1),
        v=jnp.concatenate([s.v for s in expanded], axis=1),
        pos=jnp.concatenate([s.pos for s in expanded], axis=0),
        offset=jnp.concatenate([s.offset for s in expanded]),
        write_pos=jnp.max(jnp.stack([s.write_pos for s in expanded])),
    )
