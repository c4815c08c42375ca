"""FlowLM: causal transformer backbone + EOS head + flow-matching latent head.

Functional re-design of /root/reference/pocket_tts/models/flow_lm.py:43-216 for
TPU decoding:

* One jit-able `decode_step`: previous latent (or BOS flag) -> next latent + EOS,
  advancing a static-capacity KV cache. NaN-as-BOS sentinels are replaced by an
  explicit boolean flag; sampling noise is injected as an argument so the whole
  pipeline is deterministic given a noise stream (the only stochastic input).
* `prompt_step`: feeds right-padded text-embedding / audio-conditioning prefixes
  into the KV cache (offset advances by the true length; see nn/attention.py for
  why trailing-pad garbage is harmless). Used for both the text prompt and the
  voice prompt (whose resulting cache IS the exportable voice state).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from pocket_tts_tpu.config import Config
from pocket_tts_tpu.nn.flow_mlp import (
    FlowMLPConfig,
    init_flow_mlp_params,
    lsd_decode,
)
from pocket_tts_tpu.nn.transformer import (
    StackState,
    TransformerConfig,
    init_layer_params,
    init_stack_state,
    layer_norm,
    transformer_apply,
)


@dataclass(frozen=True)
class FlowLMSpecs:
    transformer: TransformerConfig
    flow: FlowMLPConfig
    ldim: int  # latent dim (mimi quantizer dimension)
    n_bins: int  # text vocab size (LUT has n_bins + 1 rows)
    insert_bos_before_voice: bool


def build_flow_lm_specs(cfg: Config) -> FlowLMSpecs:
    t = cfg.flow_lm.transformer
    return FlowLMSpecs(
        transformer=TransformerConfig(
            d_model=t.d_model,
            num_heads=t.num_heads,
            num_layers=t.num_layers,
            dim_feedforward=t.d_model * t.hidden_scale,
            context=None,
            max_period=float(t.max_period),
            layer_scale=None,
        ),
        flow=FlowMLPConfig(
            in_channels=cfg.mimi.quantizer.dimension,
            model_channels=cfg.flow_lm.flow.dim,
            cond_channels=t.d_model,
            num_res_blocks=cfg.flow_lm.flow.depth,
        ),
        ldim=cfg.mimi.quantizer.dimension,
        n_bins=cfg.flow_lm.lookup_table.n_bins,
        insert_bos_before_voice=cfg.flow_lm.insert_bos_before_voice,
    )


def init_flow_lm_params(specs: FlowLMSpecs, key, dtype=jnp.float32) -> dict:
    D = specs.transformer.d_model
    inner = specs.ldim
    ks = jax.random.split(key, 8)
    bound = 1.0 / jnp.sqrt(jnp.asarray(inner, jnp.float32))
    params = {
        "conditioner_embed": jax.random.normal(ks[0], (specs.n_bins + 1, D), dtype),
        "input_linear": jax.random.uniform(ks[1], (D, inner), dtype, -bound, bound),
        "bos_emb": jax.random.normal(ks[2], (inner,), dtype),
        "emb_std": jnp.ones((inner,), dtype),
        "emb_mean": jnp.zeros((inner,), dtype),
        "out_norm": {"w": jnp.ones((D,), dtype), "b": jnp.zeros((D,), dtype)},
        "out_eos": {
            "w": jax.random.normal(ks[3], (1, D), dtype) * 0.02,
            "b": jnp.zeros((1,), dtype),
        },
        "transformer": init_layer_params(specs.transformer, ks[4], dtype),
        "flow_net": init_flow_mlp_params(specs.flow, ks[5], dtype),
        "speaker_proj_weight": jax.random.normal(ks[6], (D, inner), dtype) * 0.02,
    }
    if specs.insert_bos_before_voice:
        params["bos_before_voice"] = jax.random.normal(ks[7], (1, 1, D), dtype)
    return params


def init_flow_lm_state(specs: FlowLMSpecs, batch_size: int, capacity: int,
                       dtype=jnp.float32) -> StackState:
    return init_stack_state(specs.transformer, batch_size, capacity, dtype)


def embed_text_tokens(params: dict, tokens: jnp.ndarray) -> jnp.ndarray:
    """Token ids [B, T] -> embeddings [B, T, D] (LUT conditioner, text.py:74-76)."""
    return params["conditioner_embed"][tokens]


def prompt_step(
    specs: FlowLMSpecs,
    params: dict,
    state: StackState,
    embeddings: jnp.ndarray,
    true_len: jnp.ndarray | int | None = None,
) -> StackState:
    """Fill the KV cache with conditioning embeddings [B, T, D] (right-padded to T;
    offset advances by `true_len`). Backbone outputs are discarded — prompting
    only exists to populate the cache (tts_model.py:722-725, 896-899)."""
    _, state = transformer_apply(
        specs.transformer, params["transformer"], embeddings, state, increment=true_len
    )
    return state


def decode_step(
    specs: FlowLMSpecs,
    params: dict,
    state: StackState,
    prev_latent: jnp.ndarray,
    is_bos: jnp.ndarray,
    noise: jnp.ndarray,
    *,
    lsd_steps: int,
    eos_threshold: float,
    att_len: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, StackState]:
    """One autoregressive step.

    prev_latent: [B, ldim] (ignored where is_bos), is_bos: [B] bool,
    noise: [B, ldim] (pre-scaled flow noise, std = sqrt(temp)).
    Returns (next_latent [B, ldim], eos [B] bool, state).
    """
    wdtype = params["input_linear"].dtype
    latent = jnp.where(is_bos[:, None], params["bos_emb"], prev_latent.astype(wdtype))
    x = (latent @ params["input_linear"].T)[:, None, :]  # [B, 1, D]
    h, state = transformer_apply(
        specs.transformer, params["transformer"], x, state, unroll=True,
        att_len=att_len, packed=params.get("stack_packed"),
    )
    # heads always run in f32 (matches reference flow_lm.py:125 f32 cast; the
    # flow head stays f32 even when the backbone is bf16/int8)
    h = layer_norm(h[:, -1].astype(jnp.float32), params["out_norm"]["w"],
                   params["out_norm"]["b"])
    eos_logit = h @ params["out_eos"]["w"].T.astype(jnp.float32) + params["out_eos"]["b"]
    eos = eos_logit[:, 0] > eos_threshold
    next_latent = lsd_decode(
        specs.flow, params["flow_net"], h, noise.astype(jnp.float32), lsd_steps
    )
    return next_latent, eos, state
