"""attend_windowed_chunked must equal the naive two-piece windowed SDPA.

The chunked path is the large-batch serving route for multi-frame codec
blocks (nn/transformer.transformer_apply window mode, T >= 128): per-chunk
[B, H, chunk, W+chunk] logits instead of [B, H, T, W+T]. Numerics must match
attend_cached + decode_masks exactly (same mask rule over sliced positions),
including partially-filled windows at stream start (pos = -1 slots).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pocket_tts_tpu.nn.attention import (
    attend_cached,
    attend_windowed_chunked,
    decode_masks,
)

B, H, Dh, W, CONTEXT = 3, 4, 16, 64, 60


def _case(T, offset, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, T, H, Dh)), jnp.float32)
    k_new = jnp.asarray(rng.standard_normal((B, T, H, Dh)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((B, T, H, Dh)), jnp.float32)
    ck = jnp.asarray(rng.standard_normal((B, W, H, Dh)), jnp.float32)
    cv = jnp.asarray(rng.standard_normal((B, W, H, Dh)), jnp.float32)
    # sliding-window cache positions: slot j holds offset - W + j; slots
    # whose position would be negative are unfilled (pos = -1), like a
    # stream that started fewer than W steps ago
    pos = np.arange(W)[None, :] - W + offset
    pos = np.where(pos >= 0, pos, -1).astype(np.int32)
    pos_cache = jnp.asarray(np.broadcast_to(pos, (B, W)))
    off = jnp.full((B,), offset, jnp.int32)
    pos_q = off[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
    return q, ck, cv, k_new, v_new, pos_cache, off, pos_q


@pytest.mark.parametrize("T,offset", [(128, 500), (128, 10), (192, 77)])
def test_chunked_matches_naive(T, offset):
    q, ck, cv, k_new, v_new, pos_cache, off, pos_q = _case(T, offset)
    mc, ms = decode_masks(pos_cache, off, T, CONTEXT)
    expected = attend_cached(q, ck, cv, k_new, v_new, mc, ms)
    actual = attend_windowed_chunked(
        q, ck, cv, k_new, v_new, pos_cache, pos_q, CONTEXT, chunk=64)
    np.testing.assert_allclose(
        np.asarray(actual), np.asarray(expected), rtol=2e-5, atol=2e-5)


def test_chunked_odd_tail():
    """T not divisible by the chunk exercises the shorter final slice."""
    q, ck, cv, k_new, v_new, pos_cache, off, pos_q = _case(144, 300, seed=3)
    mc, ms = decode_masks(pos_cache, off, 144, CONTEXT)
    expected = attend_cached(q, ck, cv, k_new, v_new, mc, ms)
    actual = attend_windowed_chunked(
        q, ck, cv, k_new, v_new, pos_cache, pos_q, CONTEXT, chunk=64)
    np.testing.assert_allclose(
        np.asarray(actual), np.asarray(expected), rtol=2e-5, atol=2e-5)
