"""Fused decode-stack kernel (ops/decode_stack.py) parity vs the XLA scan.

The kernel must reproduce transformer_apply's T=1 decode body — LN -> qkv ->
rope -> pos-mapped cache attention (+ the step's own new key) -> out_proj ->
LN -> GELU FFN, residuals throughout — for bf16 and int8-quantized weights,
including dead cache slots (pos = -1) and speculative slots past the offset.
Runs in Pallas interpreter mode on the CPU backend (auto in
decode_stack_apply)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pocket_tts_tpu.nn.transformer import (
    StackState,
    TransformerConfig,
    init_layer_params,
    transformer_apply,
)
from pocket_tts_tpu.ops.decode_stack import (
    decode_stack_apply,
    pack_decode_stack,
    stack_supported,
)
from pocket_tts_tpu.quant import quantize_weight

CFG = TransformerConfig(d_model=1024, num_heads=16, num_layers=2,
                        dim_feedforward=4096)


def make_state(C: int, offset: int, seed: int = 0) -> StackState:
    """A realistic mid-generation cache: valid slots at positions
    0..offset-1 in write order with interspersed dead slots (pos = -1) and a
    few speculative slots past the offset (never attended)."""
    rng = np.random.default_rng(seed)
    L, H, Dh = CFG.num_layers, CFG.num_heads, CFG.d_model // CFG.num_heads
    k = rng.standard_normal((L, 1, C, H, Dh)).astype(np.float32) * 0.5
    v = rng.standard_normal((L, 1, C, H, Dh)).astype(np.float32) * 0.5
    pos = np.full((1, C), -1, np.int32)
    n_filled = offset + 7  # some slots hold positions past the offset
    perm_positions = np.arange(n_filled, dtype=np.int32)
    pos[0, :n_filled] = perm_positions
    pos[0, 5] = -1  # a dead slot mid-prefix (padding)
    return StackState(
        k=jnp.asarray(k, jnp.bfloat16),
        v=jnp.asarray(v, jnp.bfloat16),
        pos=jnp.asarray(pos),
        offset=jnp.asarray([offset], jnp.int32),
        write_pos=jnp.asarray(n_filled, jnp.int32),
    )


def quantize_params(params):
    out = dict(params)
    for key in ("in_proj", "out_proj", "w1", "w2"):
        out[key] = quantize_weight(params[key])
    return out


@pytest.mark.parametrize("C,offset", [(256, 100), (384, 300)])
@pytest.mark.parametrize("quantized", [False, True], ids=["bf16", "int8"])
def test_kernel_matches_xla_scan(C, offset, quantized):
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16),
        init_layer_params(CFG, jax.random.PRNGKey(1)),
    )
    if quantized:
        params = quantize_params(params)
    packed = pack_decode_stack(CFG, params)
    assert packed is not None
    assert stack_supported(CFG, 1, 1, C, jnp.bfloat16)

    state = make_state(C, offset)
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((1, 1, CFG.d_model)) * 0.3,
        jnp.bfloat16,
    )

    slot = int(state.write_pos)
    h_ref, st_ref = transformer_apply(CFG, params, x, state, unroll=True)
    h_k, st_k = decode_stack_apply(CFG, packed, x, state)

    # the kernel keeps the residual stream in f32 between layers while the
    # XLA scan rounds to bf16 per op, so agreement is bf16-grade
    np.testing.assert_allclose(
        np.asarray(h_k, np.float32), np.asarray(h_ref, np.float32),
        rtol=5e-2, atol=5e-2,
    )
    # the in-kernel append wrote the new K/V at the same slot with the same
    # values as the scan path's append_kv, leaving every other slot untouched
    np.testing.assert_allclose(
        np.asarray(st_k.k[:, :, slot], np.float32),
        np.asarray(st_ref.k[:, :, slot], np.float32), rtol=5e-2, atol=5e-2)
    np.testing.assert_allclose(
        np.asarray(st_k.v[:, :, slot], np.float32),
        np.asarray(st_ref.v[:, :, slot], np.float32), rtol=5e-2, atol=5e-2)
    mask = np.arange(st_k.k.shape[2]) != slot
    np.testing.assert_array_equal(
        np.asarray(st_k.k[:, :, mask], np.float32),
        np.asarray(st_ref.k[:, :, mask], np.float32))
    assert np.array_equal(np.asarray(st_k.pos), np.asarray(st_ref.pos))
    assert np.array_equal(np.asarray(st_k.offset), np.asarray(st_ref.offset))
    assert int(st_k.write_pos) == int(st_ref.write_pos)


def test_routed_step_equals_unrouted(monkeypatch):
    """transformer_apply with packed params + POCKET_TTS_TPU_STACK=1 must
    route through the kernel and agree with the scan path end-to-end
    (h AND the appended state)."""
    from pocket_tts_tpu.ops import decode_stack

    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16),
        init_layer_params(CFG, jax.random.PRNGKey(5)),
    )
    packed = pack_decode_stack(CFG, params)
    state = make_state(256, 120, seed=9)
    x = jnp.asarray(
        np.random.default_rng(11).standard_normal((1, 1, CFG.d_model)) * 0.3,
        jnp.bfloat16,
    )

    h_scan, st_scan = transformer_apply(CFG, params, x, state, unroll=True)

    monkeypatch.setenv("POCKET_TTS_TPU_STACK", "1")
    decode_stack._stack_mode.cache_clear()
    try:
        called = {}
        orig = decode_stack.decode_stack_apply

        def spy(*a, **kw):
            called["yes"] = True
            return orig(*a, **kw)

        monkeypatch.setattr(decode_stack, "decode_stack_apply", spy)
        import pocket_tts_tpu.nn.transformer as tr

        monkeypatch.setattr(tr, "decode_stack_apply", spy)
        h_routed, st_routed = transformer_apply(
            CFG, params, x, state, unroll=True, packed=packed)
    finally:
        decode_stack._stack_mode.cache_clear()

    assert called.get("yes"), "packed path did not route to the kernel"
    np.testing.assert_allclose(
        np.asarray(h_routed, np.float32), np.asarray(h_scan, np.float32),
        rtol=5e-2, atol=5e-2,
    )
    np.testing.assert_allclose(
        np.asarray(st_routed.k, np.float32), np.asarray(st_scan.k, np.float32),
        rtol=5e-2, atol=5e-2,
    )
    assert np.array_equal(np.asarray(st_routed.pos), np.asarray(st_scan.pos))
    assert np.array_equal(np.asarray(st_routed.offset),
                          np.asarray(st_scan.offset))


def test_pack_rejects_mixed_quantization():
    params = init_layer_params(CFG, jax.random.PRNGKey(2))
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    params["in_proj"] = quantize_weight(params["in_proj"])  # attention only
    assert pack_decode_stack(CFG, params) is None


def test_pack_rejects_f32():
    params = init_layer_params(CFG, jax.random.PRNGKey(2))
    assert pack_decode_stack(CFG, params) is None


def test_pack_rejects_non_flagship_geometry():
    """Small/experimental configs (different d_model / hidden_scale) must not
    pack — the kernel's chunk geometry assumes D=1024, F=4D. Regression: the
    small e2e test model used to crash the packer's reshape."""
    small = TransformerConfig(d_model=64, num_heads=4, num_layers=2,
                              dim_feedforward=128)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16),
        init_layer_params(small, jax.random.PRNGKey(0)),
    )
    assert pack_decode_stack(small, params) is None
