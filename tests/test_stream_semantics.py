"""Streaming-driver semantics: EOS cut edge cases, multi-chunk long text,
voice-state reuse, deterministic seeds."""

import numpy as np

from small_model import build_small_tts_model


class ForcedEosModel:
    """Wrap a model so eos fires at a chosen step (monkeypatch the step fn)."""


def _voice(model, seed=0):
    rng = np.random.default_rng(seed)
    return model.state_for_audio_array(
        (rng.standard_normal((1, 1, 4000)) * 0.1).astype(np.float32)
    )


def test_frames_after_eos_zero_and_large():
    model = build_small_tts_model()
    voice = _voice(model)
    tokens = [3, 9, 4]

    from pocket_tts_tpu.pipeline.tts import NoiseSource

    n0 = list(model.generate_audio_stream_from_tokens(
        voice, tokens, 0, NoiseSource(model.gen, 1), max_gen_len=10))
    n3 = list(model.generate_audio_stream_from_tokens(
        voice, tokens, 3, NoiseSource(model.gen, 1), max_gen_len=10))
    # frames_after_eos=0 can never emit MORE than frames_after_eos=3
    assert len(n0) <= len(n3)
    # and with no EOS both would hit max_gen_len; either way bounded
    assert len(n3) <= 10


def test_long_text_multi_chunk_stream():
    model = build_small_tts_model()
    voice = _voice(model)
    text = ". ".join(f"sentence number {i} with several words" for i in range(6)) + "."
    chunks = list(model.generate_audio_stream(voice, text, max_tokens=12, seed=0))
    assert len(chunks) > 0
    total = np.concatenate(chunks)
    assert total.size % model.samples_per_frame == 0
    assert np.isfinite(total).all()


def test_voice_state_reusable_after_generation():
    model = build_small_tts_model()
    voice = _voice(model)
    k0 = np.asarray(voice.k).copy()
    a1 = model.generate_audio(voice, "hello world", seed=5)
    # immutable voice state: untouched by generation, reusable bit-identically
    np.testing.assert_array_equal(np.asarray(voice.k), k0)
    a2 = model.generate_audio(voice, "hello world", seed=5)
    np.testing.assert_allclose(a1, a2, rtol=0, atol=0)


def test_different_seeds_differ():
    model = build_small_tts_model()
    voice = _voice(model)
    a1 = model.generate_audio(voice, "hello world", seed=1)
    a2 = model.generate_audio(voice, "hello world", seed=2)
    n = min(len(a1), len(a2))
    assert n == 0 or not np.allclose(a1[:n], a2[:n])
