"""Parity: streaming conv / transposed-conv vs the torch reference, including
chunked streaming equivalence (the hardest numerics in the codec path)."""

import numpy as np
import torch

from refloader import import_reference

import_reference()

import jax.numpy as jnp  # noqa: E402
from pocket_tts.modules.conv import (  # noqa: E402
    StreamingConv1d,
    StreamingConvTranspose1d,
)

from pocket_tts_tpu.nn.conv import (  # noqa: E402
    ConvParams,
    ConvSpec,
    ConvTrSpec,
    conv1d_step,
    conv_transpose1d_step,
    init_conv_state,
    init_conv_tr_state,
)


def _torch_conv(spec: ConvSpec, bias=True):
    torch.manual_seed(0)
    m = StreamingConv1d(
        spec.in_channels,
        spec.out_channels,
        spec.kernel_size,
        stride=spec.stride,
        dilation=spec.dilation,
        groups=spec.groups,
        bias=bias,
        pad_mode=spec.pad_mode,
    )
    m._module_absolute_name = "conv"
    params = ConvParams(
        weight=jnp.asarray(m.conv.weight.detach().numpy()),
        bias=jnp.asarray(m.conv.bias.detach().numpy()) if bias else None,
    )
    return m, params


def _torch_convtr(spec: ConvTrSpec, bias=True):
    torch.manual_seed(0)
    m = StreamingConvTranspose1d(
        spec.in_channels,
        spec.out_channels,
        spec.kernel_size,
        stride=spec.stride,
        groups=spec.groups,
        bias=bias,
    )
    m._module_absolute_name = "convtr"
    params = ConvParams(
        weight=jnp.asarray(m.convtr.weight.detach().numpy()),
        bias=jnp.asarray(m.convtr.bias.detach().numpy()) if bias else None,
    )
    return m, params


CONV_CASES = [
    ConvSpec(4, 8, 7, stride=1, pad_mode="constant"),
    ConvSpec(4, 8, 3, stride=1, dilation=2, pad_mode="constant"),
    ConvSpec(6, 12, 8, stride=4, pad_mode="constant"),
    ConvSpec(6, 12, 8, stride=4, pad_mode="replicate"),
    ConvSpec(8, 8, 4, stride=2, pad_mode="replicate"),
    ConvSpec(4, 4, 1, stride=1, pad_mode="constant"),
]


def test_streaming_conv_matches_reference_chunked():
    rng = np.random.default_rng(0)
    for spec in CONV_CASES:
        m, params = _torch_conv(spec)
        B = 2
        ref_state = {"conv": m.init_state(B, 0)}
        state = init_conv_state(spec, B)
        chunk_lens = [spec.stride * n for n in (4, 1, 3, 2, 5)]
        with torch.no_grad():
            for T in chunk_lens:
                x = rng.standard_normal((B, spec.in_channels, T)).astype(np.float32)
                ty = m(torch.from_numpy(x), ref_state)
                jy, state = conv1d_step(jnp.asarray(x), spec, params, state)
                np.testing.assert_allclose(
                    np.asarray(jy), ty.numpy(), rtol=1e-5, atol=1e-5, err_msg=str(spec)
                )


def test_oneshot_conv_matches_reference_stateless():
    rng = np.random.default_rng(1)
    for spec in CONV_CASES:
        m, params = _torch_conv(spec)
        x = rng.standard_normal((1, spec.in_channels, spec.stride * 12)).astype(np.float32)
        with torch.no_grad():
            ty = m(torch.from_numpy(x), None)
        jy, _ = conv1d_step(jnp.asarray(x), spec, params, None)
        np.testing.assert_allclose(
            np.asarray(jy), ty.numpy(), rtol=1e-5, atol=1e-5, err_msg=str(spec)
        )


CONVTR_CASES = [
    ConvTrSpec(8, 4, 8, stride=4),
    ConvTrSpec(8, 4, 12, stride=6),
    ConvTrSpec(16, 16, 32, stride=16, groups=16),  # depthwise upsample (resample.py:41-48)
    ConvTrSpec(6, 3, 4, stride=2),
]


def test_streaming_convtr_matches_reference_chunked():
    rng = np.random.default_rng(2)
    for spec in CONVTR_CASES:
        for bias in (True, False):
            m, params = _torch_convtr(spec, bias=bias)
            B = 2
            ref_state = {"convtr": m.init_state(B, 0)}
            state = init_conv_tr_state(spec, B)
            with torch.no_grad():
                for T in (4, 1, 3, 1, 1, 6):
                    x = rng.standard_normal((B, spec.in_channels, T)).astype(np.float32)
                    ty = m(torch.from_numpy(x), ref_state)
                    jy, state = conv_transpose1d_step(jnp.asarray(x), spec, params, state)
                    np.testing.assert_allclose(
                        np.asarray(jy),
                        ty.numpy(),
                        rtol=1e-4,
                        atol=1e-5,
                        err_msg=f"{spec} bias={bias}",
                    )


def test_matmul_conv_form_matches_conv_op():
    """The large-batch shifted-matmul conv form (nn/conv._conv1d_matmul) must
    match lax.conv_general_dilated on the same inputs for every decoder conv
    shape (K, dilation) — it routes automatically above MATMUL_CONV_MIN_WORK
    rows*timesteps."""
    import jax
    import jax.numpy as jnp

    from pocket_tts_tpu.nn.conv import (
        ConvSpec,
        _conv1d_matmul,
        conv1d_raw,
        init_conv_params,
    )

    rng = np.random.default_rng(0)
    for K, dil, C, O in ((7, 1, 32, 48), (3, 1, 48, 32), (1, 1, 32, 32),
                         (3, 2, 24, 24)):
        spec = ConvSpec(in_channels=C, out_channels=O, kernel_size=K,
                        dilation=dil)
        params = init_conv_params(spec, jax.random.PRNGKey(K + dil))
        x = jnp.asarray(rng.standard_normal((2, C, 64)), jnp.float32)
        ref = conv1d_raw(x, spec, params)  # small work: conv op path
        got = _conv1d_matmul(x, spec, params)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
