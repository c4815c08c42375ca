"""Checkpoint round-trips: reference state-dict -> pytree -> state-dict must be
identity, and a combined safetensors written by us must load back losslessly."""

import numpy as np
import torch

from refloader import import_reference

import_reference()

from pocket_tts_tpu.core.weights import (  # noqa: E402
    flow_lm_params_from_sd,
    flow_lm_params_to_sd,
    fuse_weight_norm,
    load_safetensors,
    mimi_params_from_sd,
    mimi_params_to_sd,
    save_combined_checkpoint,
)
from tests.test_mimi_parity import build_reference_mimi, small_mimi_config  # noqa: E402
from tests.test_pipeline_e2e import build_reference_flow_lm, small_config  # noqa: E402


def test_flow_lm_sd_roundtrip():
    cfg = small_config()
    ref = build_reference_flow_lm(cfg)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    from pocket_tts_tpu.models.flow_lm import build_flow_lm_specs

    specs = build_flow_lm_specs(cfg)
    params = flow_lm_params_from_sd(specs.transformer, specs.flow, sd)
    sd2 = flow_lm_params_to_sd(params)
    assert set(sd2) == set(sd), (set(sd) - set(sd2), set(sd2) - set(sd))
    for k in sd:
        np.testing.assert_array_equal(sd[k], sd2[k], err_msg=k)


def test_mimi_sd_roundtrip():
    mimi_cfg = small_mimi_config()
    ref = build_reference_mimi(mimi_cfg)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    from pocket_tts_tpu.models.mimi import build_mimi_specs

    specs = build_mimi_specs(mimi_cfg)
    params = mimi_params_from_sd(specs, sd)
    sd2 = mimi_params_to_sd(specs, params)
    assert set(sd2) == set(sd), (set(sd) - set(sd2), set(sd2) - set(sd))
    for k in sd:
        np.testing.assert_array_equal(sd[k], sd2[k], err_msg=k)


def test_combined_checkpoint_save_load(tmp_path):
    cfg = small_config()
    ref_lm = build_reference_flow_lm(cfg)
    ref_mimi = build_reference_mimi(cfg.mimi)
    from pocket_tts_tpu.models.flow_lm import build_flow_lm_specs
    from pocket_tts_tpu.models.mimi import build_mimi_specs

    specs = build_flow_lm_specs(cfg)
    mimi_specs = build_mimi_specs(cfg.mimi)
    params = flow_lm_params_from_sd(
        specs.transformer, specs.flow,
        {k: v.numpy() for k, v in ref_lm.state_dict().items()},
    )
    mimi_params = mimi_params_from_sd(
        mimi_specs, {k: v.numpy() for k, v in ref_mimi.state_dict().items()}
    )
    dest = tmp_path / "model.safetensors"
    save_combined_checkpoint(dest, params, mimi_specs, mimi_params)

    sd = load_safetensors(dest)
    params2 = flow_lm_params_from_sd(specs.transformer, specs.flow, sd, prefix="flow_lm.")
    mimi_params2 = mimi_params_from_sd(mimi_specs, sd, prefix="mimi.")
    for a, b in zip(
        np.asarray(params["transformer"]["in_proj"]).ravel()[:10],
        np.asarray(params2["transformer"]["in_proj"]).ravel()[:10],
    ):
        assert a == b
    np.testing.assert_array_equal(
        np.asarray(mimi_params["upsample"].weight),
        np.asarray(mimi_params2["upsample"].weight),
    )


def test_weight_norm_fusion_matches_torch():
    rng = np.random.default_rng(0)
    v = rng.standard_normal((8, 4, 5)).astype(np.float32)
    g = rng.standard_normal((8, 1, 1)).astype(np.float32)
    ours = fuse_weight_norm(v, g)
    theirs = torch._weight_norm(torch.from_numpy(v), torch.from_numpy(g), 0).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-6)
