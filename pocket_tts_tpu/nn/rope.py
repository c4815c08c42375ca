"""Rotary positional embeddings (interleaved-pair convention).

Numerics match the reference implementation (/root/reference/pocket_tts/modules/
rope.py:7-58): pairs are interleaved along the head dim ([..., D//2, 2] view),
rotation math is float32 regardless of input dtype, and the angle for position p
and pair index j is p * max_period**(-2j/D).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def apply_rope(
    q: jnp.ndarray,
    k: jnp.ndarray,
    offset: jnp.ndarray | int = 0,
    max_period: float = 10_000.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Rotate queries/keys of shape [B, T, H, D] by their absolute position.

    `offset` is the absolute position of the first timestep (a traced scalar is
    fine — everything here is shape-static).
    """
    B, T, H, D = q.shape
    assert D % 2 == 0

    ds = jnp.arange(D // 2, dtype=jnp.float32)
    freqs = jnp.exp(ds * (-math.log(max_period) * 2 / D))
    ts = jnp.arange(T, dtype=jnp.float32) + jnp.asarray(offset, dtype=jnp.float32)
    angles = ts[:, None, None] * freqs  # [T, 1, D//2] broadcasting over heads
    rotr = jnp.cos(angles)
    roti = jnp.sin(angles)

    def rotate(x: jnp.ndarray) -> jnp.ndarray:
        shape = x.shape
        xp = x.reshape(*shape[:-1], D // 2, 2)
        xr = xp[..., 0].astype(jnp.float32)
        xi = xp[..., 1].astype(jnp.float32)
        yr = xr * rotr - xi * roti
        yi = xr * roti + xi * rotr
        y = jnp.stack([yr.astype(x.dtype), yi.astype(x.dtype)], axis=-1)
        return y.reshape(shape)

    return rotate(q), rotate(k)
