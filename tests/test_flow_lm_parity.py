"""Parity: FlowLM prompt + autoregressive decode vs the torch reference.

The reference FlowLMModel is constructed from reference modules (its tokenizer-
bearing conditioner is bypassed — text embeddings are injected directly, exactly
as tts_model.py:348-367 does). Noise is generated once and fed to both sides, so
every step must match allclose. The torch-side forward glue below mirrors
flow_lm.py:121-139 with the internal noise sampling replaced by injection.
"""

import numpy as np
import torch

from refloader import import_reference

import_reference()

from functools import partial  # noqa: E402

import jax.numpy as jnp  # noqa: E402
from pocket_tts.models.flow_lm import FlowLMModel, lsd_decode as torch_lsd  # noqa: E402
from pocket_tts.modules.mimi_transformer import StreamingTransformer  # noqa: E402
from pocket_tts.modules.mlp import SimpleMLPAdaLN  # noqa: E402
from pocket_tts.modules.stateful_module import (  # noqa: E402
    StatefulModule,
    increment_steps,
    init_states,
)

from pocket_tts_tpu.core.weights import flow_lm_params_from_sd  # noqa: E402
from pocket_tts_tpu.models.flow_lm import (  # noqa: E402
    FlowLMSpecs,
    decode_step,
    init_flow_lm_state,
    prompt_step,
)
from pocket_tts_tpu.nn.flow_mlp import FlowMLPConfig  # noqa: E402
from pocket_tts_tpu.nn.transformer import TransformerConfig  # noqa: E402

D_MODEL, HEADS, LAYERS, FFN, LDIM, FLOW_DIM, DEPTH = 64, 4, 3, 128, 16, 48, 2

SPECS = FlowLMSpecs(
    transformer=TransformerConfig(
        d_model=D_MODEL, num_heads=HEADS, num_layers=LAYERS, dim_feedforward=FFN
    ),
    flow=FlowMLPConfig(
        in_channels=LDIM, model_channels=FLOW_DIM, cond_channels=D_MODEL,
        num_res_blocks=DEPTH,
    ),
    ldim=LDIM,
    n_bins=11,
    insert_bos_before_voice=True,
)


class _NoTokenizer(torch.nn.Module):
    """Conditioner stand-in: just the embedding LUT, no tokenizer download."""

    def __init__(self):
        super().__init__()
        self.embed = torch.nn.Embedding(SPECS.n_bins + 1, D_MODEL)


def build_reference():
    torch.manual_seed(0)
    transformer = StreamingTransformer(
        d_model=D_MODEL, num_heads=HEADS, num_layers=LAYERS, dim_feedforward=FFN
    )
    flow_net = SimpleMLPAdaLN(LDIM, FLOW_DIM, LDIM, D_MODEL, DEPTH, num_time_conds=2)
    ref = FlowLMModel(
        conditioner=_NoTokenizer(),
        flow_net=flow_net,
        transformer=transformer,
        dim=D_MODEL,
        ldim=LDIM,
        dtype=torch.float32,
        insert_bos_before_voice=True,
    )
    for name, module in ref.named_modules():
        if isinstance(module, StatefulModule):
            module._module_absolute_name = name
    ref.eval()
    return ref


def ref_decode_step(ref, state, prev_latent, noise, eos_threshold=-4.0, lsd_steps=1):
    """Reference flow_lm.py:96-139 decode with injected noise (torch)."""
    sequence = torch.where(torch.isnan(prev_latent), ref.bos_emb, prev_latent)
    input_ = ref.input_linear(sequence)
    out = ref.transformer(input_, state)
    out = ref.out_norm(out).to(torch.float32)[:, -1]
    is_eos = ref.out_eos(out) > eos_threshold
    increment_steps(ref, state, 1)
    latent = torch_lsd(partial(ref.flow_net, out), noise.clone(), lsd_steps)
    return latent, is_eos


def compare_caches(ref_state, j_state, prompt_only_len=None):
    for l in range(LAYERS):
        name = f"transformer.layers.{l}.self_attn"
        cache = ref_state[name]["cache"].numpy()
        upto = int(ref_state[name]["offset"][0])
        np.testing.assert_allclose(
            np.asarray(j_state.k[l])[:, :upto], cache[0][:, :upto], rtol=3e-5, atol=3e-5
        )
        np.testing.assert_allclose(
            np.asarray(j_state.v[l])[:, :upto], cache[1][:, :upto], rtol=3e-5, atol=3e-5
        )


def test_flow_lm_prompt_and_decode_matches_reference():
    ref = build_reference()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = flow_lm_params_from_sd(SPECS.transformer, SPECS.flow, sd)

    rng = np.random.default_rng(0)
    B, prompt_len, cap, n_steps = 1, 9, 64, 8
    prompt = rng.standard_normal((B, prompt_len, D_MODEL)).astype(np.float32)

    ref_state = init_states(ref, batch_size=B, sequence_length=cap)
    with torch.no_grad():
        # reference prompting: embeddings straight into the backbone
        ref.transformer(torch.from_numpy(prompt), ref_state)
        increment_steps(ref, ref_state, prompt_len)

    j_state = init_flow_lm_state(SPECS, B, cap)
    j_state = prompt_step(SPECS, params, j_state, jnp.asarray(prompt))
    compare_caches(ref_state, j_state)

    prev_t = torch.full((B, 1, LDIM), float("nan"))
    prev_j = jnp.zeros((B, LDIM), jnp.float32)
    is_bos = jnp.ones((B,), bool)
    with torch.no_grad():
        for step in range(n_steps):
            noise = rng.standard_normal((B, LDIM)).astype(np.float32) * (0.7**0.5)
            t_latent, t_eos = ref_decode_step(ref, ref_state, prev_t, torch.from_numpy(noise))
            j_latent, j_eos, j_state = decode_step(
                SPECS, params, j_state, prev_j, is_bos, jnp.asarray(noise),
                lsd_steps=1, eos_threshold=-4.0,
            )
            np.testing.assert_allclose(
                np.asarray(j_latent), t_latent.numpy(), rtol=5e-4, atol=5e-4,
                err_msg=f"step {step}",
            )
            assert bool(j_eos[0]) == bool(t_eos.item()), f"eos mismatch at {step}"
            prev_t = t_latent[:, None, :]
            prev_j = j_latent
            is_bos = jnp.zeros((B,), bool)
    compare_caches(ref_state, j_state)


def test_flow_lm_padded_text_prompt_equivalence():
    """Bucketed (right-padded) text prompts must reproduce the unpadded decode."""
    ref = build_reference()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = flow_lm_params_from_sd(SPECS.transformer, SPECS.flow, sd)

    rng = np.random.default_rng(1)
    B, true_len, pad_to, cap = 1, 5, 12, 64
    prompt = rng.standard_normal((B, true_len, D_MODEL)).astype(np.float32)
    padded = np.concatenate(
        [prompt, np.zeros((B, pad_to - true_len, D_MODEL), np.float32)], axis=1
    )
    noise = rng.standard_normal((B, LDIM)).astype(np.float32)

    s1 = prompt_step(SPECS, params, init_flow_lm_state(SPECS, B, cap), jnp.asarray(prompt))
    l1, e1, _ = decode_step(SPECS, params, s1, jnp.zeros((B, LDIM)),
                            jnp.ones((B,), bool), jnp.asarray(noise),
                            lsd_steps=1, eos_threshold=-4.0)
    s2 = prompt_step(SPECS, params, init_flow_lm_state(SPECS, B, cap),
                     jnp.asarray(padded), true_len=true_len)
    l2, e2, _ = decode_step(SPECS, params, s2, jnp.zeros((B, LDIM)),
                            jnp.ones((B,), bool), jnp.asarray(noise),
                            lsd_steps=1, eos_threshold=-4.0)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-6, atol=1e-6)
    assert bool(e1[0]) == bool(e2[0])
