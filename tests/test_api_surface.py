"""API-contract tests (mirrors reference tests/test_python_api.py)."""

import pocket_tts_tpu


def test_public_api():
    assert set(pocket_tts_tpu.__all__) == {"TTSModel", "export_model_state"}
    model_cls = pocket_tts_tpu.TTSModel
    for attr in (
        "load_model",
        "generate_audio",
        "generate_audio_stream",
        "get_state_for_audio_prompt",
        "sample_rate",
        "device",
    ):
        assert hasattr(model_cls, attr), attr


def test_cli_parser():
    from pocket_tts_tpu.api.cli import build_parser

    p = build_parser()
    args = p.parse_args(["generate", "hello", "--out", "x.wav", "--temp", "0.5"])
    assert args.command == "generate" and args.temp == 0.5
    args = p.parse_args(["serve", "--port", "1234"])
    assert args.port == 1234
    args = p.parse_args(["export-voice", "a.wav", "b.safetensors"])
    assert args.audio == "a.wav"


def test_quantization_roundtrip():
    import jax
    import numpy as np

    from pocket_tts_tpu.models.flow_lm import FlowLMSpecs, init_flow_lm_params
    from pocket_tts_tpu.nn.flow_mlp import FlowMLPConfig
    from pocket_tts_tpu.nn.transformer import TransformerConfig
    from pocket_tts_tpu.quant import (
        dequantize_weight,
        quantization_error,
        quantize_flow_lm_int8,
    )

    specs = FlowLMSpecs(
        transformer=TransformerConfig(d_model=32, num_heads=2, num_layers=2,
                                      dim_feedforward=64),
        flow=FlowMLPConfig(in_channels=8, model_channels=16, cond_channels=32,
                           num_res_blocks=1),
        ldim=8, n_bins=7, insert_bos_before_voice=False,
    )
    params = init_flow_lm_params(specs, jax.random.PRNGKey(0))
    q = quantize_flow_lm_int8(params)
    assert q["transformer"]["in_proj"]["q"].dtype.name == "int8"
    errs = quantization_error(params, q)
    assert all(e < 0.02 for e in errs.values()), errs
    w = np.asarray(params["transformer"]["w1"])
    deq = np.asarray(dequantize_weight(q["transformer"]["w1"]))
    assert np.max(np.abs(w - deq)) / np.max(np.abs(w)) < 0.02


def test_public_api_runtime_typechecks():
    """The public entry points reject wrong argument types with a clear
    TypeError at call time (the reference beartypes its package,
    pocket_tts/__init__.py:6-19; here: core/typecheck.py)."""
    import numpy as np
    import pytest

    from small_model import build_small_tts_model
    from pocket_tts_tpu import TTSModel, export_model_state

    model = build_small_tts_model()
    rng = np.random.default_rng(0)
    state = model.state_for_audio_array(
        (rng.standard_normal((1, 1, 3000)) * 0.1).astype(np.float32))

    with pytest.raises(TypeError, match="text_to_generate"):
        model.generate_audio(state, 123)
    with pytest.raises(TypeError, match="model_state"):
        model.generate_audio("not a state", "hello")
    with pytest.raises(TypeError, match="seed"):
        # generator: the check must fire at call time, not first next()
        model.generate_audio_stream(state, "hello", seed="zero")
    with pytest.raises(TypeError, match="audio_conditioning"):
        model.get_state_for_audio_prompt(12345)
    with pytest.raises(TypeError, match="dest"):
        export_model_state(state, 42)
    with pytest.raises(TypeError, match="language"):
        TTSModel.load_model(language=3)
