"""Rotary positional embeddings (interleaved-pair convention).

Numerics match the reference implementation (/root/reference/pocket_tts/modules/
rope.py:7-58): pairs are interleaved along the head dim ([..., D//2, 2] view),
rotation math is float32 regardless of input dtype, and the angle for position p
and pair index j is p * max_period**(-2j/D).

Generalization over the reference: `offset` may be per-row ([B]) instead of a
single scalar, so a batch can hold utterances at different stream positions.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def rope_tables(
    offset: jnp.ndarray | int,
    T: int,
    head_dim: int,
    max_period: float = 10_000.0,
    batch: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin rotation tables [B, T, 1, D//2] for positions offset + 0..T-1.

    Layer-invariant — compute once per step and share across the layer scan."""
    D = head_dim
    ds = jnp.arange(D // 2, dtype=jnp.float32)
    freqs = jnp.exp(ds * (-math.log(max_period) * 2 / D))
    off = jnp.asarray(offset, dtype=jnp.float32).reshape(-1)
    if batch is not None:
        off = jnp.broadcast_to(off, (batch,))
    ts = jnp.arange(T, dtype=jnp.float32)[None, :] + off[:, None]  # [B, T]
    angles = ts[:, :, None, None] * freqs  # [B, T, 1, D//2]
    return jnp.cos(angles), jnp.sin(angles)


def rotate(x: jnp.ndarray, rotr: jnp.ndarray, roti: jnp.ndarray) -> jnp.ndarray:
    """Apply interleaved-pair rotation tables to [B, T, H, D]."""
    shape = x.shape
    D = shape[-1]
    xp = x.reshape(*shape[:-1], D // 2, 2)
    xr = xp[..., 0].astype(jnp.float32)
    xi = xp[..., 1].astype(jnp.float32)
    yr = xr * rotr - xi * roti
    yi = xr * roti + xi * rotr
    y = jnp.stack([yr.astype(x.dtype), yi.astype(x.dtype)], axis=-1)
    return y.reshape(shape)


def apply_rope(
    q: jnp.ndarray,
    k: jnp.ndarray,
    offset: jnp.ndarray | int = 0,
    max_period: float = 10_000.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Rotate queries/keys of shape [B, T, H, D] by absolute position.

    `offset`: scalar or [B] — absolute position of x[:, 0] (per row).
    """
    B, T, H, D = q.shape
    assert D % 2 == 0
    rotr, roti = rope_tables(offset, T, D, max_period, batch=B)
    return rotate(q, rotr, roti), rotate(k, rotr, roti)
