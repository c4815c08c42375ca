"""Pallas flash-decode kernel vs the production XLA attention path.

The kernel's contract is the exact decode-time (T=1, context=None) semantics of
nn/attention.attend_cached over the append-ordered pos-map cache: valid slots
are `pos >= 0 & pos <= offset`, plus the step's own new K/V at position offset.
CPU runs interpret mode; tools/kernel_gate.py compiles the same checks on the
real chip in bf16.
"""

import numpy as np

import jax.numpy as jnp

from pocket_tts_tpu.nn.attention import attend_cached, decode_masks
from pocket_tts_tpu.ops.flash_decode import (
    flash_decode_ref,
    flash_decode_supported,
    flash_decode_tpu,
)


def _case(B, C, H, D, seed=0, dead_every=7):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((B, H, D)).astype(np.float32)
    k = rng.standard_normal((B, C, H, D)).astype(np.float32)
    v = rng.standard_normal((B, C, H, D)).astype(np.float32)
    kn = rng.standard_normal((B, H, D)).astype(np.float32)
    vn = rng.standard_normal((B, H, D)).astype(np.float32)
    # append-ordered positions with interleaved dead (-1) slots and a tail of
    # never-written slots; per-row heterogeneous offsets
    pos = np.full((B, C), -1, np.int32)
    offset = np.zeros((B,), np.int32)
    for b in range(B):
        p = 0
        fill = int(C * (0.4 + 0.5 * b / max(B - 1, 1)))
        for c in range(fill):
            if c % dead_every == dead_every - 1:
                continue  # dead slot (right-padding garbage)
            pos[b, c] = p
            p += 1
        offset[b] = p
    return tuple(jnp.asarray(a) for a in (q, k, v, kn, vn, pos, offset))


def _xla_production(q, k, v, kn, vn, pos, offset):
    """The production path: decode_masks + attend_cached with T=1."""
    mc, ms = decode_masks(pos, offset, 1, None)
    out = attend_cached(q[:, None], k, v, kn[:, None], vn[:, None], mc, ms)
    return out[:, 0]


def test_ref_matches_production_attention():
    args = _case(3, 128, 4, 64)
    got = flash_decode_ref(*args)
    want = _xla_production(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_kernel_matches_ref_interpret():
    for B, C, H, D in ((1, 128, 2, 64), (3, 384, 4, 64), (2, 768, 16, 64)):
        args = _case(B, C, H, D, seed=B)
        got = flash_decode_tpu(*args, interpret=True)
        want = flash_decode_ref(*args)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5,
            err_msg=f"B={B} C={C} H={H} D={D}")


def test_kernel_all_dead_slots_attends_only_new_kv():
    """A fresh cache (all pos = -1) must attend exclusively the new K/V."""
    B, C, H, D = 2, 256, 4, 64
    rng = np.random.default_rng(9)
    q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, C, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, C, H, D)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
    pos = jnp.full((B, C), -1, jnp.int32)
    offset = jnp.zeros((B,), jnp.int32)
    out = flash_decode_tpu(q, k, v, kn, vn, pos, offset, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(vn),
                               rtol=2e-5, atol=2e-5)


def test_supported_predicate():
    assert flash_decode_supported(768, 64)
    assert flash_decode_supported(384, 64)
    assert flash_decode_supported(4096, 64)
    assert not flash_decode_supported(100, 64)  # no 128-multiple tile
    assert not flash_decode_supported(768, 48)  # unaligned head dim
