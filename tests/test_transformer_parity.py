"""Parity: streaming KV-cache attention + transformer stack vs the torch reference.

Drives both implementations with identical random weights through a prompt phase
followed by autoregressive single-step decodes, checking allclose at every step.
"""

import numpy as np
import torch

from refloader import import_reference

import_reference()

import jax.numpy as jnp  # noqa: E402
from pocket_tts.modules.mimi_transformer import StreamingTransformer  # noqa: E402
from pocket_tts.modules.stateful_module import increment_steps, init_states  # noqa: E402

from pocket_tts_tpu.nn.transformer import (  # noqa: E402
    TransformerConfig,
    init_stack_state,
    transformer_apply,
)
from tests.torch_adapters import stack_transformer_params  # noqa: E402


def _name_modules(model):
    for name, module in model.named_modules():
        if hasattr(module, "_module_absolute_name"):
            module._module_absolute_name = name


def _run_both(cfg: TransformerConfig, window: bool, seq_len: int, prompt_len: int, steps: int):
    torch.manual_seed(0)
    ref = StreamingTransformer(
        d_model=cfg.d_model,
        num_heads=cfg.num_heads,
        num_layers=cfg.num_layers,
        layer_scale=cfg.layer_scale,
        dim_feedforward=cfg.dim_feedforward,
        context=cfg.context,
        max_period=cfg.max_period,
    )
    _name_modules(ref)
    params = stack_transformer_params(ref, layer_scale=cfg.layer_scale is not None)

    B = 2
    # window mode: capacity IS the sliding window; >= context-1 history suffices
    capacity = seq_len if not window else max(cfg.context or seq_len, prompt_len)
    state = init_stack_state(cfg, B, capacity)
    ref_state = init_states(ref, batch_size=B, sequence_length=seq_len)

    rng = np.random.default_rng(42)
    with torch.no_grad():
        # prompt phase
        x = rng.standard_normal((B, prompt_len, cfg.d_model)).astype(np.float32)
        ty = ref(torch.from_numpy(x), ref_state)
        increment_steps(ref, ref_state, prompt_len)
        jy, state = transformer_apply(cfg, params, jnp.asarray(x), state, window=window)
        np.testing.assert_allclose(np.asarray(jy), ty.numpy(), rtol=2e-5, atol=2e-5)

        # autoregressive steps
        for _ in range(steps):
            x = rng.standard_normal((B, 1, cfg.d_model)).astype(np.float32)
            ty = ref(torch.from_numpy(x), ref_state)
            increment_steps(ref, ref_state, 1)
            jy, state = transformer_apply(cfg, params, jnp.asarray(x), state, window=window)
            np.testing.assert_allclose(np.asarray(jy), ty.numpy(), rtol=2e-5, atol=2e-5)


def test_full_causal_stack_matches_reference():
    cfg = TransformerConfig(
        d_model=64, num_heads=4, num_layers=3, dim_feedforward=128, context=None
    )
    _run_both(cfg, window=False, seq_len=32, prompt_len=9, steps=6)


def test_sliding_window_cache_matches_reference():
    cfg = TransformerConfig(
        d_model=32,
        num_heads=2,
        num_layers=2,
        dim_feedforward=64,
        context=10,
        layer_scale=0.01,
    )
    # enough steps that the window slides far past its capacity
    _run_both(cfg, window=True, seq_len=64, prompt_len=4, steps=40)


def test_sliding_window_mixed_block_sizes_match_reference():
    """Window cache with varying block lengths (1, 8, then T >= W) must track
    the reference exactly — the batched drivers feed whole scan blocks."""
    cfg = TransformerConfig(
        d_model=32, num_heads=2, num_layers=2, dim_feedforward=64, context=10,
    )
    torch.manual_seed(1)
    ref = StreamingTransformer(
        d_model=32, num_heads=2, num_layers=2, dim_feedforward=64, context=10
    )
    _name_modules(ref)
    params = stack_transformer_params(ref)
    B, W = 2, 12
    state = init_stack_state(cfg, B, W)
    ref_state = init_states(ref, batch_size=B, sequence_length=128)
    rng = np.random.default_rng(5)
    with torch.no_grad():
        for T in (1, 1, 8, 8, 16, 3, 16):  # 16 > W exercises the T >= W crop
            x = rng.standard_normal((B, T, cfg.d_model)).astype(np.float32)
            ty = ref(torch.from_numpy(x), ref_state)
            increment_steps(ref, ref_state, T)
            jy, state = transformer_apply(cfg, params, jnp.asarray(x), state,
                                          window=True)
            np.testing.assert_allclose(np.asarray(jy), ty.numpy(),
                                       rtol=2e-5, atol=2e-5)


def test_padded_prompt_matches_unpadded():
    """Right-padding a prompt and advancing offset by the true length must leave
    subsequent decode steps bit-identical to the unpadded run."""
    cfg = TransformerConfig(
        d_model=32, num_heads=2, num_layers=2, dim_feedforward=64, context=None
    )
    torch.manual_seed(3)
    ref = StreamingTransformer(
        d_model=32, num_heads=2, num_layers=2, dim_feedforward=64
    )
    params = stack_transformer_params(ref)
    rng = np.random.default_rng(7)
    B, true_len, pad_len = 1, 5, 12
    prompt = rng.standard_normal((B, true_len, 32)).astype(np.float32)
    padded = np.concatenate(
        [prompt, np.zeros((B, pad_len - true_len, 32), np.float32)], axis=1
    )
    step = rng.standard_normal((B, 1, 32)).astype(np.float32)

    s1 = init_stack_state(cfg, B, 64)
    y1, s1 = transformer_apply(cfg, params, jnp.asarray(prompt), s1)
    o1, s1 = transformer_apply(cfg, params, jnp.asarray(step), s1)

    s2 = init_stack_state(cfg, B, 64)
    y2, s2 = transformer_apply(
        cfg, params, jnp.asarray(padded), s2, increment=true_len
    )
    o2, s2 = transformer_apply(cfg, params, jnp.asarray(step), s2)

    np.testing.assert_allclose(
        np.asarray(y2)[:, :true_len], np.asarray(y1), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1), rtol=1e-6, atol=1e-6)
    assert int(s1.offset[0]) == int(s2.offset[0])
