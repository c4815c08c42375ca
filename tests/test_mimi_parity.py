"""Parity: full Mimi codec (SEANet + transformers + resamplers) vs the torch
reference — one-shot encode and frame-by-frame streaming decode."""

import numpy as np
import torch
import yaml

from refloader import import_reference

import_reference()

import jax.numpy as jnp  # noqa: E402
from pocket_tts.models.mimi import MimiModel  # noqa: E402
from pocket_tts.modules import mimi_transformer as ref_mt  # noqa: E402
from pocket_tts.modules.dummy_quantizer import DummyQuantizer  # noqa: E402
from pocket_tts.modules.seanet import SEANetDecoder, SEANetEncoder  # noqa: E402
from pocket_tts.modules.stateful_module import (  # noqa: E402
    StatefulModule,
    increment_steps,
    init_states,
)

from pocket_tts_tpu.config import CONFIGS_DIR, load_config  # noqa: E402
from pocket_tts_tpu.core.weights import mimi_params_from_sd  # noqa: E402
from pocket_tts_tpu.models.mimi import (  # noqa: E402
    build_mimi_specs,
    decoder_step,
    encode_to_latent,
    init_decoder_state,
    project_latent,
)


def build_reference_mimi(mimi_cfg):
    d = mimi_cfg.model_dump()
    torch.manual_seed(0)
    encoder = SEANetEncoder(**d["seanet"])
    decoder = SEANetDecoder(**d["seanet"])
    enc_t = ref_mt.ProjectedTransformer(**d["transformer"])
    dec_t = ref_mt.ProjectedTransformer(**d["transformer"])
    quantizer = DummyQuantizer(**d["quantizer"])
    mimi = MimiModel(
        encoder,
        decoder,
        quantizer,
        channels=d["channels"],
        sample_rate=d["sample_rate"],
        frame_rate=d["frame_rate"],
        encoder_frame_rate=d["sample_rate"] / encoder.hop_length,
        inner_dim=d["inner_dim"],
        outer_dim=d["outer_dim"],
        encoder_transformer=enc_t,
        decoder_transformer=dec_t,
    )
    for name, module in mimi.named_modules():
        if isinstance(module, StatefulModule):
            module._module_absolute_name = name
    mimi.eval()
    return mimi


def small_mimi_config():
    cfg = load_config(CONFIGS_DIR / "english.yaml")
    d = cfg.mimi.model_dump()
    d["seanet"].update(dimension=64, n_filters=8)
    d["transformer"].update(d_model=64, num_heads=4, dim_feedforward=128,
                            input_dimension=64, output_dimensions=(64,), context=30)
    d["quantizer"].update(dimension=8, output_dimension=64)
    d["inner_dim"] = 8
    d["outer_dim"] = 64
    from pocket_tts_tpu.config import MimiConfig

    return MimiConfig(**d)


def test_mimi_encode_decode_matches_reference():
    mimi_cfg = small_mimi_config()
    ref = build_reference_mimi(mimi_cfg)
    specs = build_mimi_specs(mimi_cfg)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = mimi_params_from_sd(specs, sd)

    rng = np.random.default_rng(0)
    # ~4.3 frames of audio: exercises pad_for_conv1d too
    audio = (rng.standard_normal((1, 1, 8300)) * 0.3).astype(np.float32)

    with torch.no_grad():
        t_latent = ref.encode_to_latent(torch.from_numpy(audio))
    j_latent = encode_to_latent(specs, params, jnp.asarray(audio))
    np.testing.assert_allclose(
        np.asarray(j_latent), t_latent.numpy(), rtol=5e-4, atol=5e-4
    )

    # streaming decode, frame by frame (16 codec steps per frame)
    n_frames = t_latent.shape[-1]
    steps_per = specs.downsample_stride
    ref_state = init_states(ref, batch_size=1, sequence_length=n_frames * steps_per)
    j_state = init_decoder_state(specs, 1)
    with torch.no_grad():
        for i in range(n_frames):
            frame = t_latent[:, :, i : i + 1]
            t_quant = ref.quantizer(frame)
            t_audio = ref.decode_from_latent(t_quant, ref_state)
            increment_steps(ref, ref_state, increment=steps_per)

            j_quant = project_latent(specs, params, jnp.asarray(frame.numpy()))
            np.testing.assert_allclose(
                np.asarray(j_quant), t_quant.numpy(), rtol=1e-4, atol=1e-4
            )
            j_audio, j_state = decoder_step(specs, params, j_quant, j_state)
            np.testing.assert_allclose(
                np.asarray(j_audio), t_audio.numpy(), rtol=2e-3, atol=2e-4,
                err_msg=f"frame {i}",
            )


def test_mimi_projected_transformer_non_identity():
    """input_dimension/output_dimensions != d_model: the ProjectedTransformer
    wraps the stack in linear projections (reference mimi_transformer.py:129-137
    and forward :141-150). All shipped configs are identity; this guards the
    projection path against silent mis-builds on non-identity checkpoints."""
    cfg = load_config(CONFIGS_DIR / "english.yaml")
    d = cfg.mimi.model_dump()
    d["seanet"].update(dimension=64, n_filters=8)
    # d_model 48 != dimension 64 -> input_proj 64->48 and output_proj 48->64
    d["transformer"].update(d_model=48, num_heads=4, dim_feedforward=96,
                            input_dimension=64, output_dimensions=(64,), context=30)
    d["quantizer"].update(dimension=8, output_dimension=64)
    d["inner_dim"] = 8
    d["outer_dim"] = 64
    from pocket_tts_tpu.config import MimiConfig

    mimi_cfg = MimiConfig(**d)
    ref = build_reference_mimi(mimi_cfg)
    assert ref.encoder_transformer.input_proj is not None  # non-identity indeed
    specs = build_mimi_specs(mimi_cfg)
    assert specs.has_input_proj and specs.has_output_proj
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = mimi_params_from_sd(specs, sd)
    assert "encoder_transformer_in_proj" in params
    assert "decoder_transformer_out_proj" in params

    rng = np.random.default_rng(7)
    audio = (rng.standard_normal((1, 1, 4000)) * 0.3).astype(np.float32)
    with torch.no_grad():
        t_latent = ref.encode_to_latent(torch.from_numpy(audio))
    j_latent = encode_to_latent(specs, params, jnp.asarray(audio))
    np.testing.assert_allclose(
        np.asarray(j_latent), t_latent.numpy(), rtol=5e-4, atol=5e-4
    )

    steps_per = specs.downsample_stride
    n_frames = 3
    latents = rng.standard_normal((1, specs.quantizer_dim, n_frames)).astype(np.float32)
    ref_state = init_states(ref, batch_size=1, sequence_length=n_frames * steps_per)
    j_state = init_decoder_state(specs, 1)
    with torch.no_grad():
        for i in range(n_frames):
            frame = torch.from_numpy(latents[:, :, i : i + 1])
            t_audio = ref.decode_from_latent(ref.quantizer(frame), ref_state)
            increment_steps(ref, ref_state, increment=steps_per)
            j_quant = project_latent(specs, params, jnp.asarray(latents[:, :, i : i + 1]))
            j_audio, j_state = decoder_step(specs, params, j_quant, j_state)
            np.testing.assert_allclose(
                np.asarray(j_audio), t_audio.numpy(), rtol=2e-3, atol=2e-4,
                err_msg=f"frame {i}",
            )


def test_mimi_multi_output_dims_rejected():
    """The Mimi container consumes exactly one transformer output (reference
    mimi.py:93); ambiguous configs must fail loudly at build time."""
    import pytest

    cfg = load_config(CONFIGS_DIR / "english.yaml")
    d = cfg.mimi.model_dump()
    d["transformer"]["output_dimensions"] = (512, 256)
    from pocket_tts_tpu.config import MimiConfig

    with pytest.raises(ValueError, match="exactly one output dimension"):
        build_mimi_specs(MimiConfig(**d))


def test_mimi_streaming_decode_long_ring_wrap():
    """Enough frames that the decoder transformer ring cache wraps (context=30,
    16 steps/frame -> wraps after ~5 frames)."""
    mimi_cfg = small_mimi_config()
    ref = build_reference_mimi(mimi_cfg)
    specs = build_mimi_specs(mimi_cfg)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = mimi_params_from_sd(specs, sd)

    rng = np.random.default_rng(1)
    n_frames = 12
    latents = rng.standard_normal((1, specs.quantizer_dim, n_frames)).astype(np.float32)
    steps_per = specs.downsample_stride
    ref_state = init_states(ref, batch_size=1, sequence_length=n_frames * steps_per)
    j_state = init_decoder_state(specs, 1)
    with torch.no_grad():
        for i in range(n_frames):
            frame = torch.from_numpy(latents[:, :, i : i + 1])
            t_audio = ref.decode_from_latent(ref.quantizer(frame), ref_state)
            increment_steps(ref, ref_state, increment=steps_per)
            j_quant = project_latent(specs, params, jnp.asarray(latents[:, :, i : i + 1]))
            j_audio, j_state = decoder_step(specs, params, j_quant, j_state)
            np.testing.assert_allclose(
                np.asarray(j_audio), t_audio.numpy(), rtol=2e-3, atol=2e-4,
                err_msg=f"frame {i}",
            )
