"""Parity: AdaLN flow head + LSD sampler vs the torch reference."""

import numpy as np
import torch

from refloader import import_reference

import_reference()

from functools import partial  # noqa: E402

import jax.numpy as jnp  # noqa: E402
from pocket_tts.models.flow_lm import lsd_decode as torch_lsd  # noqa: E402
from pocket_tts.modules.mlp import SimpleMLPAdaLN  # noqa: E402

from pocket_tts_tpu.core.weights import flow_mlp_params_from_sd  # noqa: E402
from pocket_tts_tpu.nn.flow_mlp import (  # noqa: E402
    FlowMLPConfig,
    flow_mlp_apply,
    lsd_decode,
)

CFG = FlowMLPConfig(in_channels=32, model_channels=64, cond_channels=96, num_res_blocks=3)


def _make_pair():
    torch.manual_seed(0)
    ref = SimpleMLPAdaLN(
        in_channels=CFG.in_channels,
        model_channels=CFG.model_channels,
        out_channels=CFG.in_channels,
        cond_channels=CFG.cond_channels,
        num_res_blocks=CFG.num_res_blocks,
        num_time_conds=2,
    )
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = flow_mlp_params_from_sd(CFG, sd)
    return ref, params


def test_flow_mlp_matches_reference():
    ref, params = _make_pair()
    rng = np.random.default_rng(0)
    B = 3
    cond = rng.standard_normal((B, CFG.cond_channels)).astype(np.float32)
    x = rng.standard_normal((B, CFG.in_channels)).astype(np.float32)
    s = np.full((B, 1), 0.25, np.float32)
    t = np.full((B, 1), 0.5, np.float32)
    with torch.no_grad():
        ty = ref(torch.from_numpy(cond), torch.from_numpy(s), torch.from_numpy(t),
                 torch.from_numpy(x))
    jy = flow_mlp_apply(CFG, params, jnp.asarray(cond), jnp.asarray(s), jnp.asarray(t),
                        jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(jy), ty.numpy(), rtol=1e-5, atol=1e-5)


def test_lsd_decode_matches_reference():
    ref, params = _make_pair()
    rng = np.random.default_rng(1)
    B = 2
    cond = rng.standard_normal((B, CFG.cond_channels)).astype(np.float32)
    noise = rng.standard_normal((B, CFG.in_channels)).astype(np.float32)
    for steps in (1, 4):
        with torch.no_grad():
            ty = torch_lsd(
                partial(ref, torch.from_numpy(cond)), torch.from_numpy(noise.copy()), steps
            )
        jy = lsd_decode(CFG, params, jnp.asarray(cond), jnp.asarray(noise), steps)
        np.testing.assert_allclose(np.asarray(jy), ty.numpy(), rtol=2e-5, atol=2e-5)
