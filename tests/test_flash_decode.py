"""Pallas flash-decode kernel vs the XLA attention path (interpret mode on CPU)."""

import numpy as np

import jax.numpy as jnp

from pocket_tts_tpu.nn.attention import attend
from pocket_tts_tpu.ops.flash_decode import flash_decode


def test_flash_decode_matches_xla_attend():
    rng = np.random.default_rng(0)
    B, C, H, D = 2, 64, 4, 16
    q = rng.standard_normal((B, 1, H, D)).astype(np.float32)
    k = rng.standard_normal((B, C, H, D)).astype(np.float32)
    v = rng.standard_normal((B, C, H, D)).astype(np.float32)
    offsets = np.array([5, 37], np.int32)

    pos_q = offsets[:, None]
    pos_k = np.broadcast_to(np.arange(C, dtype=np.int32), (B, C))
    ref = attend(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                 jnp.asarray(pos_q), jnp.asarray(pos_k), None)  # [B,1,H,D]

    out = flash_decode(jnp.asarray(q[:, 0]), jnp.asarray(k), jnp.asarray(v),
                       jnp.asarray(offsets), interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref)[:, 0],
                               rtol=2e-5, atol=2e-5)


def test_flash_decode_full_cache():
    rng = np.random.default_rng(1)
    B, C, H, D = 1, 32, 2, 8
    q = rng.standard_normal((B, H, D)).astype(np.float32)
    k = rng.standard_normal((B, C, H, D)).astype(np.float32)
    v = rng.standard_normal((B, C, H, D)).astype(np.float32)
    offsets = np.array([C - 1], np.int32)  # everything valid
    out = flash_decode(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                       jnp.asarray(offsets), interpret=True)
    # plain softmax attention over the full cache
    scores = np.einsum("bhd,bchd->bhc", q, k) / np.sqrt(D)
    w = np.exp(scores - scores.max(-1, keepdims=True))
    w /= w.sum(-1, keepdims=True)
    ref = np.einsum("bhc,bchd->bhd", w, v)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)
