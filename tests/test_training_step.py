"""Sharded flow-matching training step: loss decreases and gradients flow to
every parameter group (virtual 8-device mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from pocket_tts_tpu.models.flow_lm import FlowLMSpecs, init_flow_lm_params
from pocket_tts_tpu.nn.flow_mlp import FlowMLPConfig
from pocket_tts_tpu.nn.transformer import TransformerConfig
from pocket_tts_tpu.parallel.mesh import flow_lm_param_specs, make_mesh, shard_tree
from pocket_tts_tpu.parallel.training import TrainState, make_train_step

SPECS = FlowLMSpecs(
    transformer=TransformerConfig(d_model=32, num_heads=2, num_layers=2,
                                  dim_feedforward=64),
    flow=FlowMLPConfig(in_channels=8, model_channels=32, cond_channels=32,
                       num_res_blocks=2),
    ldim=8,
    n_bins=15,
    insert_bos_before_voice=False,
)


def _batch(mesh, B, S, Tt, key):
    k1, k2 = jax.random.split(key)
    return {
        "tokens": jax.device_put(
            jax.random.randint(k1, (B, Tt), 0, SPECS.n_bins),
            NamedSharding(mesh, P("data", None)),
        ),
        "latents": jax.device_put(
            jax.random.normal(k2, (B, S, SPECS.ldim)),
            NamedSharding(mesh, P("data", None, None)),
        ),
        "eos_labels": jax.device_put(
            jnp.zeros((B, S)).at[:, -1].set(1.0),
            NamedSharding(mesh, P("data", None)),
        ),
    }


def test_training_loss_decreases_on_mesh():
    mesh = make_mesh(n_data=4, n_model=2)
    params = init_flow_lm_params(SPECS, jax.random.PRNGKey(0))
    params = shard_tree(params, flow_lm_param_specs(params), mesh)
    optimizer = optax.adam(3e-3)
    state = TrainState(params, optimizer.init(params))
    train_step = jax.jit(make_train_step(SPECS, optimizer))

    batch = _batch(mesh, B=8, S=6, Tt=4, key=jax.random.PRNGKey(1))
    losses = []
    with mesh:
        for i in range(12):
            state, loss = train_step(state, batch, jax.random.PRNGKey(100))
            losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses


def test_gradients_cover_all_params():
    from pocket_tts_tpu.parallel.training import flow_matching_loss

    params = init_flow_lm_params(SPECS, jax.random.PRNGKey(0))
    batch = {
        "tokens": jnp.zeros((2, 3), jnp.int32),
        "latents": jnp.ones((2, 4, SPECS.ldim)),
        "eos_labels": jnp.zeros((2, 4)),
    }
    grads = jax.grad(lambda p: flow_matching_loss(SPECS, p, batch,
                                                  jax.random.PRNGKey(2)))(params)
    zero_leaves = [
        path for path, g in jax.tree_util.tree_leaves_with_path(grads)
        if not np.any(np.asarray(g))
    ]
    # everything except the (unused-in-loss) speaker projection must get grads
    names = ["/".join(str(getattr(p, "key", "")) for p in path) for path in zero_leaves]
    assert all("speaker_proj" in n or "emb_" in n for n in names), names
