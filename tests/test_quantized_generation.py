"""Quantized model produces valid, non-silent audio and the weights really are
int8 (mirrors reference tests/test_quantization.py intent)."""

import numpy as np
import pytest

from small_model import build_small_tts_model

from pocket_tts_tpu.quant import (
    NAMED_CONFIGS,
    RECOMMENDED_CONFIG,
    model_memory_mb,
    quantize_flow_lm_int8,
    resolve_config,
)


def test_quantized_generation_not_silent():
    model = build_small_tts_model()
    rng = np.random.default_rng(0)
    voice = model.state_for_audio_array(
        (rng.standard_normal((1, 1, 4000)) * 0.1).astype(np.float32)
    )
    model.params = quantize_flow_lm_int8(model.params, RECOMMENDED_CONFIG)
    for key in ("in_proj", "out_proj", "w1", "w2"):
        assert model.params["transformer"][key]["q"].dtype.name == "int8"

    audio = model.generate_audio(voice, "hello world this is a test", seed=0)
    assert audio.size > 0
    assert np.isfinite(audio).all()
    assert np.abs(audio).max() > 1e-6  # not silence


def test_quantize_all_scope_finite_and_noise_sensitive():
    """The "all" config (attention+ffn+flow_net, reference
    quantization.py:92-93 / docs/quantization.md:43-49) must quantize the flow
    head too, shrink the weights, and still produce finite audio that responds
    to the injected flow noise (i.e. the quantized flow head actually runs)."""
    model = build_small_tts_model()
    rng = np.random.default_rng(2)
    voice = model.state_for_audio_array(
        (rng.standard_normal((1, 1, 4000)) * 0.1).astype(np.float32)
    )
    f32_params = model.params
    mb_f32 = model_memory_mb(f32_params)
    model.params = quantize_flow_lm_int8(f32_params, "all")
    # flow-head linears are int8 now
    fn = model.params["flow_net"]
    assert fn["cond_embed"]["w"]["q"].dtype.name == "int8"
    assert fn["res_blocks"]["mlp0"]["w"]["q"].dtype.name == "int8"
    assert fn["time_embed"]["l0"]["w"]["q"].dtype.name == "int8"
    assert fn["final"]["linear"]["w"]["q"].dtype.name == "int8"
    # norm gains and sinusoid table stay f32
    assert fn["res_blocks"]["ln"]["w"].dtype.name == "float32"
    assert fn["time_embed"]["rms_alpha"].dtype.name == "float32"
    assert "q" not in fn["freqs"] if isinstance(fn["freqs"], dict) else True
    mb_all = model_memory_mb(model.params)
    assert mb_all < mb_f32  # memory actually shrinks

    a1 = model.generate_audio(voice, "hello world this is a test", seed=0)
    assert a1.size > 0 and np.isfinite(a1).all() and np.abs(a1).max() > 1e-6
    a2 = model.generate_audio(voice, "hello world this is a test", seed=123)
    n = min(len(a1), len(a2))
    assert not np.allclose(a1[:n], a2[:n])  # noise-sensitive: flow head is live


def test_named_configs_and_validation():
    assert resolve_config("attention_ffn") == RECOMMENDED_CONFIG
    assert resolve_config("all") == frozenset({"attention", "ffn", "flow_net"})
    assert resolve_config("baseline") == frozenset()
    assert resolve_config({"ffn"}) == frozenset({"ffn"})
    assert set(NAMED_CONFIGS) >= {"attention", "ffn", "attention_ffn", "all"}
    with pytest.raises(ValueError):
        resolve_config("everything")
    with pytest.raises(ValueError):
        resolve_config({"attention", "mimi"})


def test_quantized_close_to_f32():
    model = build_small_tts_model()
    rng = np.random.default_rng(1)
    voice = model.state_for_audio_array(
        (rng.standard_normal((1, 1, 4000)) * 0.1).astype(np.float32)
    )
    a_f32 = model.generate_audio(voice, "hello world", seed=7)
    f32_params = model.params
    model.params = quantize_flow_lm_int8(f32_params)
    model._jit_cache.clear()
    a_int8 = model.generate_audio(voice, "hello world", seed=7)
    n = min(len(a_f32), len(a_int8))
    assert n > 0
    # same length modulo one EOS frame; correlated waveforms
    assert abs(len(a_f32) - len(a_int8)) <= 2 * 1920
    c = np.corrcoef(a_f32[:n], a_int8[:n])[0, 1]
    assert c > 0.9, c
