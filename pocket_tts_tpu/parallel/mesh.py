"""Device mesh + sharding rules.

The scaling design (new capability — the reference is strictly single-process
CPU, see SURVEY.md §2.5): a 2-D `Mesh(('data', 'model'))` over the pod slice.

* `data`: utterance batches (DP). Voice states, decode states, noise and audio
  are sharded on their batch axis.
* `model`: tensor parallelism for the 24-layer variants — attention heads and
  FFN hidden dim are column/row split megatron-style; XLA/GSPMD inserts the
  psum/all-gather collectives over ICI.

Weights' stacked layer axis [L, ...] is always replicated (scan iterates it);
within a layer: in_proj/w1 are column-parallel (shard output features), and
out_proj/w2 are row-parallel (shard input features), so each FFN/attention block
needs a single reduce per residual add.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def _spec_for_transformer_leaf(path: str) -> P:
    # leaves are [L, out, in] / [L, dim]; shard the megatron axis over 'model'
    if path in ("in_proj", "w1"):
        return P(None, "model", None)  # column parallel (output features)
    if path in ("out_proj", "w2"):
        return P(None, None, "model")  # row parallel (input features)
    return P()  # norms / layer scales replicated


def flow_lm_param_specs(params: dict) -> dict:
    """PartitionSpec tree matching a FlowLM param tree."""

    def spec(path, leaf):
        keys = [str(getattr(p, "key", getattr(p, "idx", ""))) for p in path]
        if "transformer" in keys:
            return _spec_for_transformer_leaf(keys[-1])
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def state_specs(state, model_axis: bool = False) -> Any:
    """Decode-state sharding: the batch axis over 'data' (heads over 'model'
    when tensor parallelism is on).

    Leaves: StackState k/v [L, B, C, H, Dh]; offsets/flags [B]; conv states
    [B, C, T].
    """

    def spec(leaf):
        if leaf.ndim == 5:
            return P(None, "data", None, "model" if model_axis else None, None)
        if leaf.ndim == 3:
            return P("data", None, None)
        if leaf.ndim == 2:
            return P("data", None)  # StackState.pos [B, C]
        if leaf.ndim == 1:
            return P("data")
        return P()  # write_pos scalar and friends: replicated

    return jax.tree.map(spec, state)


def shard_decode_state(state, mesh: Mesh, model_axis: bool = False):
    """Place a decode/voice state pytree batch-sharded on the mesh."""
    return shard_tree(state, state_specs(state, model_axis), mesh)


def shard_tree(tree, specs, mesh: Mesh):
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs
    )


def replicated(tree, mesh: Mesh):
    return jax.tree.map(lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)
