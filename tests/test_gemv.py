"""Pallas GEMV kernel vs XLA dot (interpret mode on CPU)."""

import numpy as np

import jax.numpy as jnp

from pocket_tts_tpu.ops.gemv import gemv_t, matmul_t_decode
from pocket_tts_tpu.quant import quantize_weight


def test_gemv_matches_dot():
    rng = np.random.default_rng(0)
    for R, I, O in ((1, 256, 512), (8, 128, 1024), (3, 384, 512)):
        x = rng.standard_normal((R, I)).astype(np.float32)
        w = rng.standard_normal((O, I)).astype(np.float32)
        y = gemv_t(jnp.asarray(x), jnp.asarray(w), block_o=256, interpret=True)
        np.testing.assert_allclose(np.asarray(y), x @ w.T, rtol=1e-5, atol=1e-4)


def test_gemv_quantized():
    rng = np.random.default_rng(1)
    R, I, O = 2, 256, 512
    x = rng.standard_normal((R, I)).astype(np.float32)
    w = rng.standard_normal((O, I)).astype(np.float32)
    qw = quantize_weight(w)
    y = gemv_t(jnp.asarray(x), qw, block_o=256, interpret=True)
    deq = np.asarray(qw["q"]).astype(np.float32) * np.asarray(qw["s"])[:, None]
    np.testing.assert_allclose(np.asarray(y), x @ deq.T, rtol=1e-3, atol=1e-3)


def test_matmul_t_decode_leading_dims():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 4, 128)).astype(np.float32)
    w = rng.standard_normal((256, 128)).astype(np.float32)
    y = matmul_t_decode(jnp.asarray(x), jnp.asarray(w), interpret=True)
    np.testing.assert_allclose(np.asarray(y), x @ w.T, rtol=1e-5, atol=1e-4)
