"""Single-step parity at FLAGSHIP shapes (english.yaml: d_model 1024, 16 heads,
6 layers, ffn 4096, flow 512x6, ldim 32; Mimi 512/8h/2L ctx 250) vs the torch
reference with shared random weights.

The toy-shape suites prove semantics; this suite proves numerics that only
show up at scale (softmax over wide caches, f32 accumulation over the 4096-wide
FFN) with a tight single-step tolerance (<=1e-4, f32), complementing the
looser full-generation waveform tests in test_pipeline_e2e.py.
"""

import numpy as np
import torch

from refloader import import_reference

import_reference()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import pytest  # noqa: E402
from pocket_tts.models.flow_lm import FlowLMModel  # noqa: E402
from pocket_tts.models.tts_model import TTSModel as RefTTSModel  # noqa: E402
from pocket_tts.modules.mimi_transformer import StreamingTransformer  # noqa: E402
from pocket_tts.modules.mlp import SimpleMLPAdaLN  # noqa: E402
from pocket_tts.modules.stateful_module import (  # noqa: E402
    StatefulModule,
    increment_steps,
    init_states,
)

from pocket_tts_tpu.config import CONFIGS_DIR, load_config  # noqa: E402
from pocket_tts_tpu.core.weights import (  # noqa: E402
    flow_lm_params_from_sd,
    mimi_params_from_sd,
)
from pocket_tts_tpu.models.flow_lm import (  # noqa: E402
    build_flow_lm_specs,
    decode_step,
)
from pocket_tts_tpu.models.mimi import (  # noqa: E402
    build_mimi_specs,
    decoder_step,
    init_decoder_state,
    project_latent,
)
from pocket_tts_tpu.pipeline.states import expand_state  # noqa: E402
from pocket_tts_tpu.pipeline.tts import GenerationParams, TTSModel  # noqa: E402
from tests.test_mimi_parity import build_reference_mimi  # noqa: E402
from tests.test_pipeline_e2e import _Cond, patch_reference_noise  # noqa: E402

TOL = dict(rtol=1e-4, atol=1e-4)


def flagship_config():
    cfg = load_config(CONFIGS_DIR / "english.yaml")
    d = cfg.model_dump()
    d["weights_path"] = None
    d["flow_lm"]["weights_path"] = None
    d["mimi"]["weights_path"] = None
    # keep every model dimension; only the text vocab shrinks so the fake
    # word-map conditioner (test_pipeline_e2e._Cond) can stand in offline
    d["flow_lm"]["lookup_table"]["n_bins"] = 31
    from pocket_tts_tpu.config import Config

    return Config(**d)


class _FlagshipCond(_Cond):
    def __init__(self, d_model):
        torch.nn.Module.__init__(self)
        self.embed = torch.nn.Embedding(32, d_model)


@pytest.fixture(scope="module")
def flagship():
    cfg = flagship_config()
    t = cfg.flow_lm.transformer
    torch.manual_seed(42)
    transformer = StreamingTransformer(
        d_model=t.d_model, num_heads=t.num_heads, num_layers=t.num_layers,
        dim_feedforward=t.d_model * t.hidden_scale,
    )
    flow_net = SimpleMLPAdaLN(
        cfg.mimi.quantizer.dimension, cfg.flow_lm.flow.dim,
        cfg.mimi.quantizer.dimension, t.d_model, cfg.flow_lm.flow.depth,
        num_time_conds=2,
    )
    ref_lm = FlowLMModel(
        conditioner=_FlagshipCond(t.d_model), flow_net=flow_net,
        transformer=transformer, dim=t.d_model,
        ldim=cfg.mimi.quantizer.dimension, dtype=torch.float32,
        insert_bos_before_voice=cfg.flow_lm.insert_bos_before_voice,
    )
    ref_lm.speaker_proj_weight = torch.nn.Parameter(
        torch.randn(t.d_model, cfg.mimi.quantizer.dimension) * 0.05
    )
    ref_mimi = build_reference_mimi(cfg.mimi)
    for m in (ref_lm, ref_mimi):
        for name, module in m.named_modules():
            if isinstance(module, StatefulModule):
                module._module_absolute_name = name
        m.eval()
    ref_tts = RefTTSModel(
        flow_lm=ref_lm, temp=0.7, lsd_decode_steps=1, noise_clamp=None,
        eos_threshold=-4.0, config=cfg, origin=None,
    )
    ref_tts.mimi = ref_mimi
    ref_tts.eval()

    specs = build_flow_lm_specs(cfg)
    mimi_specs = build_mimi_specs(cfg.mimi)
    lm_sd = {k: v.numpy() for k, v in ref_lm.state_dict().items()}
    mimi_sd = {k: v.numpy() for k, v in ref_mimi.state_dict().items()}
    params = jax.tree.map(
        jnp.asarray, flow_lm_params_from_sd(specs.transformer, specs.flow, lm_sd))
    mimi_params = jax.tree.map(jnp.asarray, mimi_params_from_sd(mimi_specs, mimi_sd))
    model = TTSModel(specs, mimi_specs, params, mimi_params, tokenizer=None,
                     config=cfg, gen_params=GenerationParams(),
                     origin=CONFIGS_DIR / "english.yaml")
    return cfg, ref_tts, model


def test_flagship_decode_step_parity(flagship, monkeypatch):
    """Voice prompt (1 s) -> text prompt (6 tokens) -> two AR steps: the BOS
    step and one latent-fed step, each within 1e-4 of the reference."""
    cfg, ref_tts, model = flagship
    ref_lm = ref_tts.flow_lm
    rng = np.random.default_rng(11)
    voice_wav = (rng.standard_normal((1, 1, 24000)) * 0.1).astype(np.float32)
    tokens = [3, 14, 15, 9, 2, 6]
    noise = [rng.standard_normal((1, model.specs.ldim)).astype(np.float32) * 0.7**0.5
             for _ in range(3)]  # [text-prompt dummy draw, step 1, step 2]

    # ---- reference: its own voice-prompt, text-prompt and flow-lm step paths
    # (voice state built before the patch: its discarded draw must not consume
    # from the shared stream; the text prompt still draws noise[0], discarded)
    with torch.no_grad():
        ref_state = ref_tts.get_state_for_audio_prompt(torch.from_numpy(voice_wav[0]))
    stream_iter = iter(noise)
    patch_reference_noise(monkeypatch, lambda shape: next(stream_iter))
    with torch.no_grad():
        cur_end = ref_tts._flow_lm_current_end(ref_state)
        ref_tts._expand_kv_cache(ref_state, sequence_length=cur_end + len(tokens) + 4)
        ref_tts._run_flow_lm_and_increment_step(
            model_state=ref_state,
            text_tokens=torch.tensor(tokens, dtype=torch.long)[None],
        )
        nan = torch.full((1, 1, model.specs.ldim), float("nan"))
        lat1_t, eos1_t = ref_tts._run_flow_lm_and_increment_step(
            model_state=ref_state, backbone_input_latents=nan)
        lat2_t, eos2_t = ref_tts._run_flow_lm_and_increment_step(
            model_state=ref_state, backbone_input_latents=lat1_t)

    # ---- ours
    state = model.state_for_audio_array(voice_wav)
    lm_state = expand_state(state, 512)
    lm_state = model._prompt_text_tokens(lm_state, tokens)
    B, ldim = 1, model.specs.ldim
    lat1, eos1, lm_state = decode_step(
        model.specs, model.params, lm_state, jnp.zeros((B, ldim), jnp.float32),
        jnp.ones((B,), bool), jnp.asarray(noise[1]),
        lsd_steps=1, eos_threshold=-4.0,
    )
    lat2, eos2, lm_state = decode_step(
        model.specs, model.params, lm_state, lat1,
        jnp.zeros((B,), bool), jnp.asarray(noise[2]),
        lsd_steps=1, eos_threshold=-4.0,
    )

    np.testing.assert_allclose(np.asarray(lat1), lat1_t[0].numpy(), **TOL)
    np.testing.assert_allclose(np.asarray(lat2), lat2_t[0].numpy(), **TOL)
    assert bool(np.asarray(eos1)[0]) == bool(eos1_t.item())
    assert bool(np.asarray(eos2)[0]) == bool(eos2_t.item())


def test_flagship_codec_frame_parity(flagship):
    """One streaming Mimi decode frame (latent -> 1920 samples) at flagship
    shapes, within 1e-4 of the reference."""
    cfg, ref_tts, model = flagship
    ref_mimi = ref_tts.mimi
    specs = model.mimi_specs
    rng = np.random.default_rng(12)
    latents = rng.standard_normal((1, specs.quantizer_dim, 2)).astype(np.float32)

    steps_per = specs.downsample_stride
    ref_state = init_states(ref_mimi, batch_size=1, sequence_length=2 * steps_per)
    j_state = init_decoder_state(specs, 1)
    with torch.no_grad():
        for i in range(2):
            frame = torch.from_numpy(latents[:, :, i : i + 1])
            t_audio = ref_mimi.decode_from_latent(ref_mimi.quantizer(frame), ref_state)
            increment_steps(ref_mimi, ref_state, increment=steps_per)
            j_quant = project_latent(specs, model.mimi_params,
                                     jnp.asarray(latents[:, :, i : i + 1]))
            j_audio, j_state = decoder_step(specs, model.mimi_params, j_quant, j_state)
            np.testing.assert_allclose(
                np.asarray(j_audio), t_audio.numpy(), **TOL, err_msg=f"frame {i}"
            )
