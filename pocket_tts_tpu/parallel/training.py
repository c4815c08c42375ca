"""Sharded training step for the FlowLM (conditional flow matching + EOS BCE).

The reference ships no training code; this step exists so the framework scales
the way a production deployment trains/fine-tunes these models on TPU pods, and
it is what `__graft_entry__.dryrun_multichip` compiles over an N-device mesh:
batch over 'data', megatron-split transformer over 'model', gradients psum'd by
GSPMD over ICI.

Objective (matching the model family's training setup):
  x_t = (1 - t) * noise + t * latent_target;  v* = latent_target - noise
  L = E_t || flow_net(backbone(x_prefix), s=t, t=t, x_t) - v* ||^2  +  BCE(eos)
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from pocket_tts_tpu.models.flow_lm import FlowLMSpecs, embed_text_tokens
from pocket_tts_tpu.nn.flow_mlp import flow_mlp_apply
from pocket_tts_tpu.nn.transformer import layer_norm, transformer_oneshot


class TrainState(NamedTuple):
    params: Any
    opt_state: Any


def full_sequence_backbone(specs: FlowLMSpecs, params: dict, embeddings: jnp.ndarray):
    """Teacher-forced causal forward over [B, S, D] (one-shot, no KV cache)."""
    h = transformer_oneshot(specs.transformer, params["transformer"], embeddings)
    return layer_norm(h.astype(jnp.float32), params["out_norm"]["w"], params["out_norm"]["b"])


def flow_matching_loss(
    specs: FlowLMSpecs,
    params: dict,
    batch: dict,
    rng: jax.Array,
) -> jnp.ndarray:
    """batch: tokens [B, Tt] int32, latents [B, S, ldim], eos_labels [B, S]."""
    tokens, latents, eos_labels = batch["tokens"], batch["latents"], batch["eos_labels"]
    B, S, ldim = latents.shape

    text_emb = embed_text_tokens(params, tokens)
    # teacher forcing: BOS then latents[:-1] as inputs
    bos = jnp.broadcast_to(params["bos_emb"], (B, 1, ldim))
    lat_in = jnp.concatenate([bos, latents[:, :-1]], axis=1)
    seq = jnp.concatenate([text_emb, lat_in @ params["input_linear"].T], axis=1)

    h = full_sequence_backbone(specs, params, seq)[:, -S:]  # [B, S, D]

    k_t, k_n = jax.random.split(rng)
    t = jax.random.uniform(k_t, (B, S, 1))
    noise = jax.random.normal(k_n, latents.shape)
    x_t = (1.0 - t) * noise + t * latents
    v_star = latents - noise

    cond = h.reshape(B * S, -1)
    pred = flow_mlp_apply(
        specs.flow, params["flow_net"],
        cond, t.reshape(B * S, 1), t.reshape(B * S, 1), x_t.reshape(B * S, ldim),
    ).reshape(B, S, ldim)
    flow_loss = jnp.mean(jnp.square(pred - v_star))

    eos_logit = (h @ params["out_eos"]["w"].T + params["out_eos"]["b"])[..., 0]
    eos_loss = jnp.mean(optax.sigmoid_binary_cross_entropy(eos_logit, eos_labels))
    return flow_loss + eos_loss


def make_train_step(specs: FlowLMSpecs, optimizer: optax.GradientTransformation):
    def train_step(state: TrainState, batch: dict, rng: jax.Array):
        loss, grads = jax.value_and_grad(
            lambda p: flow_matching_loss(specs, p, batch, rng)
        )(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state), loss

    return train_step
