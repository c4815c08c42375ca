"""Multi-device data-parallel batched inference on the virtual CPU mesh must
reproduce single-device results exactly."""

import numpy as np

import jax

from small_model import build_small_tts_model

from pocket_tts_tpu.parallel.mesh import make_mesh


class RowNoise:
    def __init__(self, seeds):
        self.rngs = [np.random.default_rng(s) for s in seeds]

    def __call__(self, shape):
        *lead, B, L = shape if len(shape) == 3 else (shape[0], shape[1])
        if len(shape) == 2:
            B, L = shape
            return np.stack([r.standard_normal(L) for r in self.rngs]).astype(np.float32)
        K = shape[0]
        return np.stack(
            [np.stack([r.standard_normal(L) for r in self.rngs]) for _ in range(K)]
        ).astype(np.float32)


def test_dp_sharded_batch_matches_unsharded():
    assert len(jax.devices()) >= 4, "conftest should provide 8 virtual devices"
    token_lists = [[3, 7, 2], [9, 4, 8, 1], [5, 5], [2, 9, 6]]
    seeds = [10, 11, 12, 13]

    rng = np.random.default_rng(0)
    voice_wavs = [
        (rng.standard_normal((1, 1, 3000)) * 0.1).astype(np.float32) for _ in range(4)
    ]

    model = build_small_tts_model()
    voices = [model.state_for_audio_array(w) for w in voice_wavs]
    base = model.generate_audio_batch(
        voices, token_lists, frames_after_eos=2, noise_source=RowNoise(seeds)
    )

    sharded_model = build_small_tts_model()
    mesh = make_mesh(n_data=4, n_model=1)
    sharded_model.shard_for_mesh(mesh)
    voices2 = [sharded_model.state_for_audio_array(w) for w in voice_wavs]
    sharded = sharded_model.generate_audio_batch(
        voices2, token_lists, frames_after_eos=2, noise_source=RowNoise(seeds)
    )

    assert len(base) == len(sharded)
    for b, (a1, a2) in enumerate(zip(base, sharded)):
        assert a1.shape == a2.shape, (b, a1.shape, a2.shape)
        np.testing.assert_allclose(a1, a2, rtol=2e-4, atol=2e-4, err_msg=f"row {b}")
