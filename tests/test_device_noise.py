"""Distribution tests for the production-default device-side flow noise.

`TTSModel._device_noise` generates N(0, temp) noise with absolute ±noise_clamp
truncation inside the jitted step (the production default since noise_source
injection became test-only). The host twin `NoiseSource` is parity-tested
against torch's trunc_normal_ (test_pipeline_e2e.py); these tests pin the
device path to the same distribution so a silent `* std` vs `scale=` slip in
either twin fails CI (reference noise contract: flow_lm.py:132-137).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from small_model import build_small_tts_model

from pocket_tts_tpu.pipeline.tts import GenerationParams, NoiseSource, TTSModel


@pytest.fixture(scope="module")
def model():
    return build_small_tts_model()


@pytest.mark.parametrize("clamp", [None, 1.0])
def test_device_noise_matches_host_twin(model, clamp):
    temp, n = 0.7, 1_000_000
    orig = model.gen
    model.gen = GenerationParams(temp=temp, noise_clamp=clamp)
    try:
        draw = jax.jit(lambda k: model._device_noise(k, (n,)))
        x = np.asarray(draw(jax.random.PRNGKey(0)))
    finally:
        model.gen = orig

    std = temp**0.5
    if clamp is None:
        expected_std = std
    else:
        assert np.abs(x).max() <= clamp + 1e-6
        from scipy.stats import truncnorm

        expected_std = float(truncnorm.std(-clamp / std, clamp / std, scale=std))
    assert abs(float(x.mean())) < 5e-3
    assert abs(float(x.std()) - expected_std) < 5e-3

    host = NoiseSource(GenerationParams(temp=temp, noise_clamp=clamp), seed=5)((n,))
    assert abs(float(host.mean()) - float(x.mean())) < 1e-2
    assert abs(float(host.std()) - float(x.std())) < 1e-2
    if clamp is not None:
        assert np.abs(host).max() <= clamp + 1e-6


def test_clamped_device_noise_within_bounds_e2e(model, monkeypatch):
    """A clamped generation through the PUBLIC driver (device-noise default
    path) must only ever feed the flow head noise within ±clamp. The observer
    wraps _device_noise with a jax.debug.callback so the real jitted step is
    what runs — the wrapper only records the max |noise| of every draw."""
    clamp = 0.5
    seen: list[float] = []
    orig_noise = TTSModel._device_noise

    def wrapped(self, key, shape):
        noise = orig_noise(self, key, shape)
        jax.debug.callback(
            lambda m: seen.append(float(m)), jnp.max(jnp.abs(noise))
        )
        return noise

    monkeypatch.setattr(TTSModel, "_device_noise", wrapped)
    orig_gen = model.gen
    model.gen = dataclasses.replace(model.gen, noise_clamp=clamp)
    model._jit_cache.clear()
    try:
        rng = np.random.default_rng(0)
        voice = model.state_for_audio_array(
            (rng.standard_normal((1, 1, 4000)) * 0.1).astype(np.float32)
        )
        audio = model.generate_audio(voice, "hello world bounds test", seed=0)
    finally:
        model.gen = orig_gen
        model._jit_cache.clear()

    assert seen, "device-noise path never ran (driver routed to host noise?)"
    assert max(seen) <= clamp + 1e-6
    assert audio.size > 0 and np.isfinite(audio).all()
