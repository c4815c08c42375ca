"""Tensor-parallel inference (megaton split over 'model') must reproduce
single-device results — the serving mode for the 24-layer variants."""

import numpy as np

import jax

from small_model import build_small_tts_model
from test_sharded_inference import RowNoise

from pocket_tts_tpu.parallel.mesh import make_mesh


def test_tp_decode_matches_unsharded():
    assert len(jax.devices()) >= 2
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal((1, 1, 3000)) * 0.1).astype(np.float32)
    tokens = [3, 9, 4, 7]

    model = build_small_tts_model()
    voice = model.state_for_audio_array(wav)
    base = np.concatenate(
        list(
            model.generate_audio_stream_from_tokens(
                voice, tokens, 2, RowNoise([42]), max_gen_len=8
            )
        )
    )

    tp_model = build_small_tts_model()
    mesh = make_mesh(n_data=1, n_model=2)
    tp_model.shard_for_mesh(mesh, tensor_parallel=True)
    voice2 = tp_model.state_for_audio_array(wav)
    tp = np.concatenate(
        list(
            tp_model.generate_audio_stream_from_tokens(
                voice2, tokens, 2, RowNoise([42]), max_gen_len=8
            )
        )
    )
    assert base.shape == tp.shape
    np.testing.assert_allclose(base, tp, rtol=5e-4, atol=5e-4)


def test_tp_plus_dp_batch():
    """2x2 mesh: DP over rows, TP over heads, ragged batch."""
    assert len(jax.devices()) >= 4
    rng = np.random.default_rng(1)
    wavs = [(rng.standard_normal((1, 1, 3000)) * 0.1).astype(np.float32)
            for _ in range(2)]
    token_lists = [[3, 7, 2], [9, 4, 8, 1]]
    seeds = [5, 6]

    model = build_small_tts_model()
    voices = [model.state_for_audio_array(w) for w in wavs]
    base = model.generate_audio_batch(voices, token_lists, frames_after_eos=2,
                                      noise_source=RowNoise(seeds))

    tp_model = build_small_tts_model()
    mesh = make_mesh(n_data=2, n_model=2)
    tp_model.shard_for_mesh(mesh, tensor_parallel=True)
    voices2 = [tp_model.state_for_audio_array(w) for w in wavs]
    out = tp_model.generate_audio_batch(voices2, token_lists, frames_after_eos=2,
                                        noise_source=RowNoise(seeds))
    for b in range(2):
        assert base[b].shape == out[b].shape
        np.testing.assert_allclose(base[b], out[b], rtol=5e-4, atol=5e-4,
                                   err_msg=f"row {b}")
