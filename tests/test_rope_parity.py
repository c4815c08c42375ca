import numpy as np
import torch

from refloader import import_reference

import_reference()

from pocket_tts.modules.rope import apply_rope as torch_rope  # noqa: E402

from pocket_tts_tpu.nn.rope import apply_rope as jax_rope  # noqa: E402


def test_rope_matches_reference():
    rng = np.random.default_rng(0)
    B, T, H, D = 2, 7, 4, 16
    q = rng.standard_normal((B, T, H, D)).astype(np.float32)
    k = rng.standard_normal((B, T, H, D)).astype(np.float32)
    for offset in (0, 3, 117):
        tq, tk = torch_rope(torch.from_numpy(q), torch.from_numpy(k), offset=offset)
        jq, jk = jax_rope(q, k, offset=offset)
        np.testing.assert_allclose(np.asarray(jq), tq.numpy(), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(jk), tk.numpy(), rtol=1e-5, atol=1e-5)


def test_rope_traced_offset():
    import jax

    rng = np.random.default_rng(1)
    q = rng.standard_normal((1, 1, 2, 8)).astype(np.float32)
    k = rng.standard_normal((1, 1, 2, 8)).astype(np.float32)
    f = jax.jit(lambda q, k, o: jax_rope(q, k, offset=o))
    jq, _ = f(q, k, np.int32(5))
    tq, _ = torch_rope(torch.from_numpy(q), torch.from_numpy(k), offset=5)
    np.testing.assert_allclose(np.asarray(jq), tq.numpy(), rtol=1e-5, atol=1e-5)
