"""Quantized model produces valid, non-silent audio and the weights really are
int8 (mirrors reference tests/test_quantization.py intent)."""

import numpy as np

from small_model import build_small_tts_model

from pocket_tts_tpu.quant import RECOMMENDED_CONFIG, quantize_flow_lm_int8


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
