"""Parity: the fused Pallas SEANet decoder kernel (interpret mode) vs the XLA
op-program path (nn/seanet.seanet_apply), streaming frame by frame."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pocket_tts_tpu.nn.seanet import (
    SEANetArch,
    decoder_spec,
    init_seanet_params,
    init_seanet_state,
    seanet_apply,
)
from pocket_tts_tpu.ops.codec_decode import (
    decoder_is_fusable,
    pack_decoder_params,
    seanet_decoder_fused,
)

ARCH = SEANetArch(
    channels=1,
    dimension=64,
    n_filters=8,
    n_residual_layers=1,
    ratios=(6, 5, 4),
    kernel_size=7,
    last_kernel_size=3,
    residual_kernel_size=3,
    dilation_base=2,
    pad_mode="constant",
    compress=2,
)


@pytest.mark.parametrize("batch", [1, 3, 6, 12])
def test_fused_decoder_matches_xla(batch):
    """batch 6 exercises the non-divisible pad path (tile 4 -> padded to 8);
    batch 12 runs a 3-step grid with resident weights."""
    spec = decoder_spec(ARCH)
    assert decoder_is_fusable(spec)
    params = init_seanet_params(spec, jax.random.PRNGKey(0))
    packed = pack_decoder_params(spec, params)

    state_ref = init_seanet_state(spec, batch)
    state_fused = init_seanet_state(spec, batch)
    rng = np.random.default_rng(0)
    for frame in range(4):
        x = jnp.asarray(rng.standard_normal((batch, ARCH.dimension, 16)),
                        jnp.float32)
        y_ref, state_ref = seanet_apply(spec, params, x, state_ref)
        y_fused, state_fused = seanet_decoder_fused(
            spec, packed, x, state_fused, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(y_fused), np.asarray(y_ref), rtol=1e-5, atol=1e-5,
            err_msg=f"frame {frame}",
        )

    # carried streaming state stays equivalent too
    flat_ref = jax.tree.leaves(state_ref)
    flat_fused = jax.tree.leaves(state_fused)
    assert len(flat_ref) == len(flat_fused)
    for a, b in zip(flat_ref, flat_fused):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5,
                                   atol=1e-5)


def test_fused_decoder_multi_frame_input():
    """T>1 frames per call (the 8-frame steady-state block)."""
    spec = decoder_spec(ARCH)
    params = init_seanet_params(spec, jax.random.PRNGKey(1))
    packed = pack_decoder_params(spec, params)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, ARCH.dimension, 32)),
                    jnp.float32)
    state = init_seanet_state(spec, 1)
    y_ref, _ = seanet_apply(spec, params, x, state)
    y_fused, _ = seanet_decoder_fused(spec, packed, x, state, interpret=True)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_non_fusable_specs_detected():
    from pocket_tts_tpu.nn.seanet import encoder_spec

    # encoder has strided convs -> not fusable
    assert not decoder_is_fusable(encoder_spec(ARCH))


def test_fused_codec_e2e_pipeline(monkeypatch):
    """Full generation with the fused codec forced on (interpret mode on CPU)
    matches the XLA op-program pipeline sample for sample."""
    from small_model import build_small_tts_model

    voice = (np.random.default_rng(5).standard_normal((1, 1, 24000)) * 0.1
             ).astype(np.float32)

    model_ref = build_small_tts_model(seed=3)
    assert "decoder_packed" not in model_ref.mimi_params
    state = model_ref.get_state_for_audio_prompt(voice)
    audio_ref = model_ref.generate_audio(state, "hello world test", seed=11)

    monkeypatch.setenv("POCKET_TTS_TPU_CODEC", "1")
    model_fused = build_small_tts_model(seed=3)
    assert "decoder_packed" in model_fused.mimi_params
    state = model_fused.get_state_for_audio_prompt(voice)
    audio_fused = model_fused.generate_audio(state, "hello world test", seed=11)

    np.testing.assert_allclose(np.asarray(audio_fused), np.asarray(audio_ref),
                               rtol=2e-4, atol=2e-4)
