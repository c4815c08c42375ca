"""TP-vs-replicated A/B for the 24-layer variants (VERDICT r2 item 4 / r3 item 2).

Runs the italian_24l-shaped FlowLM decode step at batch 1 on a virtual device
mesh, twice: (a) weights replicated (DP-only serving), (b) megatron TP over the
'model' axis (parallel/mesh.flow_lm_param_specs). Reports ms/step for each.

Caveat, stated up front: only one real TPU chip is reachable here, so the
measured A/B runs on the CPU backend (8 virtual devices) — it validates that
the TP sharding compiles, executes, and shows the expected weight-traffic
split, but CPU step times do NOT predict v5e step times. The TPU decision
therefore combines this with the roofline model printed at the end (per-chip
weight bytes / HBM bandwidth vs per-layer ICI all-reduce latency), using the
on-chip numbers from tools/measure_r4 24parts. The conclusion lives in
STATUS.md ("24-layer scaling: TP decision").

Usage: python tools/tp_ab.py [n_model=4] [steps=20]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

N_MODEL = int(sys.argv[1]) if len(sys.argv) > 1 else 4
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 20

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + f" --xla_force_host_platform_device_count={N_MODEL}"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from pocket_tts_tpu.config import CONFIGS_DIR, load_config  # noqa: E402
from pocket_tts_tpu.models.flow_lm import (  # noqa: E402
    build_flow_lm_specs,
    decode_step,
    init_flow_lm_params,
    init_flow_lm_state,
)
from pocket_tts_tpu.parallel.mesh import (  # noqa: E402
    flow_lm_param_specs,
    make_mesh,
    replicated,
    shard_decode_state,
    shard_tree,
)


def build():
    cfg = load_config(CONFIGS_DIR / "italian_24l.yaml")
    specs = build_flow_lm_specs(cfg)
    params = init_flow_lm_params(specs, jax.random.PRNGKey(0))
    return specs, params


def time_steps(specs, params, state, label):
    B = state.offset.shape[0]
    ldim = specs.ldim

    def step(params, state, prev, noise):
        latent, eos, state = decode_step(
            specs, params, state, prev, jnp.zeros((B,), bool), noise,
            lsd_steps=1, eos_threshold=-4.0)
        return state, latent, eos

    fn = jax.jit(step, donate_argnums=(1,))
    prev = jnp.zeros((B, ldim), jnp.float32)
    noise = jnp.zeros((B, ldim), jnp.float32)
    state, prev, eos = fn(params, state, prev, noise)  # compile
    np.asarray(eos)
    t0 = time.monotonic()
    for _ in range(STEPS):
        state, prev, eos = fn(params, state, prev, noise)
    np.asarray(eos)
    ms = (time.monotonic() - t0) / STEPS * 1000
    print(f"  {label:28s} {ms:9.2f} ms/step", flush=True)
    return ms


def main():
    specs, params = build()
    capacity = 512

    mesh = make_mesh(n_data=1, n_model=N_MODEL)
    print(f"virtual mesh: data=1, model={N_MODEL} ({jax.default_backend()})",
          flush=True)

    with mesh:
        rep = time_steps(
            specs, replicated(params, mesh),
            shard_decode_state(init_flow_lm_state(specs, 1, capacity), mesh),
            "24l b1 replicated",
        )
        tp = time_steps(
            specs, shard_tree(params, flow_lm_param_specs(params), mesh),
            shard_decode_state(init_flow_lm_state(specs, 1, capacity), mesh,
                               model_axis=True),
            f"24l b1 TP over {N_MODEL}",
        )

    # ---- the v5e roofline model the TPU decision actually rests on ----
    n_params = sum(x.size for x in jax.tree.leaves(params)
                   if hasattr(x, "size"))
    backbone = sum(
        x.size for k, v in params.items() if k == "transformer"
        for x in jax.tree.leaves(v)
    )
    hbm_gbps = 800.0  # v5e ~819 GB/s
    for name, bytes_per in (("bf16", 2), ("int8", 1)):
        full_ms = backbone * bytes_per / (hbm_gbps * 1e6)
        shard_ms = full_ms / N_MODEL
        # megatron: 2 all-reduces per layer of [1, 1, d_model]; latency-bound
        n_reduce = 2 * specs.transformer.num_layers
        for lat_us in (5.0, 15.0):
            coll_ms = n_reduce * lat_us / 1000
            verdict = "TP wins" if shard_ms + coll_ms < full_ms else "replicated wins"
            print(f"  roofline {name}: weights {full_ms:.2f} ms -> shard "
                  f"{shard_ms:.2f} + collectives {coll_ms:.2f} ms "
                  f"(@{lat_us:.0f}us/all-reduce) => {verdict}", flush=True)
    print(f"  (backbone {backbone/1e6:.0f}M of {n_params/1e6:.0f}M params; "
          f"measured virtual-mesh ratio TP/replicated = {tp/rep:.2f})", flush=True)


if __name__ == "__main__":
    main()
