"""End-to-end pipeline parity: voice prompt -> text prompt -> AR generation ->
streamed waveform, vs the torch reference driven with the same weights and the
same injected noise stream. Also covers voice-state export/import round-trip and
batched-vs-sequential consistency.
"""

import numpy as np
import pytest
import torch

from refloader import import_reference

import_reference()

from functools import partial  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from pocket_tts.models.flow_lm import FlowLMModel, lsd_decode as torch_lsd  # noqa: E402
from pocket_tts.modules.mimi_transformer import StreamingTransformer  # noqa: E402
from pocket_tts.modules.mlp import SimpleMLPAdaLN  # noqa: E402
from pocket_tts.modules.stateful_module import (  # noqa: E402
    StatefulModule,
    increment_steps,
    init_states,
)

from pocket_tts_tpu.config import CONFIGS_DIR, Config, load_config  # noqa: E402
from pocket_tts_tpu.core.weights import (  # noqa: E402
    flow_lm_params_from_sd,
    mimi_params_from_sd,
)
from pocket_tts_tpu.models.flow_lm import build_flow_lm_specs  # noqa: E402
from pocket_tts_tpu.models.mimi import build_mimi_specs  # noqa: E402
from pocket_tts_tpu.pipeline.states import (  # noqa: E402
    export_model_state,
    import_model_state,
)
from pocket_tts_tpu.pipeline.tts import GenerationParams, TTSModel  # noqa: E402
from tests.test_mimi_parity import build_reference_mimi  # noqa: E402

D_MODEL, HEADS, LAYERS, FFN, LDIM = 64, 4, 2, 128, 8
N_BINS = 31


def small_config() -> Config:
    cfg = load_config(CONFIGS_DIR / "english.yaml")
    d = cfg.model_dump()
    d["flow_lm"]["transformer"].update(d_model=D_MODEL, num_heads=HEADS,
                                       num_layers=LAYERS, hidden_scale=2)
    d["flow_lm"]["flow"].update(dim=48, depth=2)
    d["flow_lm"]["lookup_table"].update(n_bins=N_BINS)
    d["mimi"]["seanet"].update(dimension=64, n_filters=8)
    d["mimi"]["transformer"].update(d_model=64, num_heads=4, dim_feedforward=128,
                                    input_dimension=64, output_dimensions=(64,),
                                    context=30)
    d["mimi"]["quantizer"].update(dimension=LDIM, output_dimension=64)
    d["mimi"]["inner_dim"] = LDIM
    d["mimi"]["outer_dim"] = 64
    d["weights_path"] = None
    d["flow_lm"]["weights_path"] = None
    d["mimi"]["weights_path"] = None
    return Config(**d)


class _Cond(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.embed = torch.nn.Embedding(N_BINS + 1, D_MODEL)


def build_reference_flow_lm(cfg: Config):
    torch.manual_seed(7)
    transformer = StreamingTransformer(
        d_model=D_MODEL, num_heads=HEADS, num_layers=LAYERS, dim_feedforward=FFN
    )
    flow_net = SimpleMLPAdaLN(LDIM, 48, LDIM, D_MODEL, 2, num_time_conds=2)
    ref = FlowLMModel(
        conditioner=_Cond(), flow_net=flow_net, transformer=transformer,
        dim=D_MODEL, ldim=LDIM, dtype=torch.float32, insert_bos_before_voice=True,
    )
    ref.speaker_proj_weight = torch.nn.Parameter(
        torch.randn(D_MODEL, LDIM) * 0.2
    )
    for name, module in ref.named_modules():
        if isinstance(module, StatefulModule):
            module._module_absolute_name = name
    ref.eval()
    return ref


class RecordedNoise:
    """Deterministic noise stream shared by both implementations."""

    def __init__(self, seed=123, std=0.7**0.5):
        self.rng = np.random.default_rng(seed)
        self.std = std

    def __call__(self, shape):
        return (self.rng.standard_normal(shape) * self.std).astype(np.float32)


@pytest.fixture(scope="module")
def models():
    cfg = small_config()
    ref_lm = build_reference_flow_lm(cfg)
    ref_mimi = build_reference_mimi(cfg.mimi)
    specs = build_flow_lm_specs(cfg)
    mimi_specs = build_mimi_specs(cfg.mimi)
    lm_sd = {k: v.numpy() for k, v in ref_lm.state_dict().items()}
    mimi_sd = {k: v.numpy() for k, v in ref_mimi.state_dict().items()}
    params = flow_lm_params_from_sd(specs.transformer, specs.flow, lm_sd)
    mimi_params = mimi_params_from_sd(mimi_specs, mimi_sd)
    params = jax.tree.map(jnp.asarray, params)
    mimi_params = jax.tree.map(jnp.asarray, mimi_params)
    model = TTSModel(
        specs, mimi_specs, params, mimi_params,
        tokenizer=None, config=cfg, gen_params=GenerationParams(),
        origin=CONFIGS_DIR / "english.yaml",
    )
    return cfg, ref_lm, ref_mimi, model


def reference_voice_state(ref_lm, ref_mimi, voice_wav, extra_capacity):
    """Voice-prompting pass of the reference (tts_model.py:787-905); the state
    is created with enough capacity for the chunks that follow."""
    with torch.no_grad():
        latent = ref_mimi.encode_to_latent(torch.from_numpy(voice_wav))
        cond = torch.nn.functional.linear(
            latent.transpose(-1, -2), ref_lm.speaker_proj_weight
        )
        cond = torch.cat([ref_lm.bos_before_voice, cond], dim=1)
        prompt_len = cond.shape[1]
        state = init_states(ref_lm, batch_size=1,
                            sequence_length=prompt_len + extra_capacity)
        ref_lm.transformer(cond, state)
        increment_steps(ref_lm, state, prompt_len)
        return state


def reference_ar_from_state(ref_lm, ref_mimi, state, tokens, noise_source,
                            max_gen_len, frames_after_eos):
    """Mirror of the reference text-prompt + AR loop (tts_model.py:317-779)
    with injected noise, mutating `state` in place like copy_state=False."""
    with torch.no_grad():
        emb = ref_lm.conditioner.embed(torch.tensor(tokens)[None])
        ref_lm.transformer(emb, state)
        increment_steps(ref_lm, state, len(tokens))

        # AR loop + streaming mimi decode
        mimi_state = init_states(ref_mimi, batch_size=1,
                                 sequence_length=max_gen_len * 16)
        frames = []
        prev = torch.full((1, 1, LDIM), float("nan"))
        eos_step = None
        for step in range(max_gen_len):
            seq = torch.where(torch.isnan(prev), ref_lm.bos_emb, prev)
            x = ref_lm.input_linear(seq)
            out = ref_lm.out_norm(ref_lm.transformer(x, state)).to(torch.float32)[:, -1]
            is_eos = (ref_lm.out_eos(out) > -4.0).item()
            increment_steps(ref_lm, state, 1)
            noise = torch.from_numpy(noise_source((1, LDIM)))
            lat = torch_lsd(partial(ref_lm.flow_net, out), noise, 1)
            if is_eos and eos_step is None:
                eos_step = step
            if eos_step is not None and step >= eos_step + frames_after_eos:
                break
            # decode this latent through mimi
            dec_in = (lat * ref_lm.emb_std + ref_lm.emb_mean).unsqueeze(-1)
            quant = ref_mimi.quantizer(dec_in)
            audio = ref_mimi.decode_from_latent(quant, mimi_state)
            increment_steps(ref_mimi, mimi_state, 16)
            frames.append(audio[0, 0].numpy())
            prev = lat[:, None, :]
        return np.concatenate(frames) if frames else np.zeros(0, np.float32)


def reference_generate(cfg, ref_lm, ref_mimi, voice_wav, tokens, noise_source,
                       max_gen_len, frames_after_eos):
    state = reference_voice_state(ref_lm, ref_mimi, voice_wav,
                                  len(tokens) + max_gen_len)
    audio = reference_ar_from_state(ref_lm, ref_mimi, state, tokens,
                                    noise_source, max_gen_len, frames_after_eos)
    return state, audio


def test_end_to_end_waveform_matches_reference(models):
    cfg, ref_lm, ref_mimi, model = models
    rng = np.random.default_rng(0)
    voice_wav = (rng.standard_normal((1, 1, 5000)) * 0.1).astype(np.float32)
    tokens = [3, 14, 15, 9, 2, 6]
    max_gen_len, frames_after_eos = 12, 2

    ref_state, ref_audio = reference_generate(
        cfg, ref_lm, ref_mimi, voice_wav, tokens, RecordedNoise(), max_gen_len,
        frames_after_eos,
    )

    voice_state = model.state_for_audio_array(voice_wav)
    chunks = list(
        model.generate_audio_stream_from_tokens(
            voice_state, tokens, frames_after_eos, RecordedNoise(),
            max_gen_len=max_gen_len,
        )
    )
    ours = np.concatenate(chunks) if chunks else np.zeros(0, np.float32)

    assert ours.shape == ref_audio.shape, (ours.shape, ref_audio.shape)
    np.testing.assert_allclose(ours, ref_audio, rtol=5e-3, atol=2e-3)


def test_copy_state_false_continuation_matches_reference(models):
    """copy_state=False (write_back) reproduces the reference's in-place state
    accumulation: a second chunk generated from the mutated state yields the
    same waveform, and the flow-lm offsets agree after every chunk."""
    cfg, ref_lm, ref_mimi, model = models
    rng = np.random.default_rng(9)
    voice_wav = (rng.standard_normal((1, 1, 5000)) * 0.1).astype(np.float32)
    tok_a, tok_b = [3, 14, 15, 9, 2, 6], [5, 9, 2, 11]
    gl_a, gl_b, fae = 10, 8, 2

    ref_state = reference_voice_state(
        ref_lm, ref_mimi, voice_wav, len(tok_a) + gl_a + len(tok_b) + gl_b
    )
    ref_a = reference_ar_from_state(ref_lm, ref_mimi, ref_state, tok_a,
                                    RecordedNoise(21), gl_a, fae)
    ref_b = reference_ar_from_state(ref_lm, ref_mimi, ref_state, tok_b,
                                    RecordedNoise(22), gl_b, fae)

    def ref_end(state):
        return max(int(v["offset"].max()) for v in state.values() if "offset" in v)

    state = model.state_for_audio_array(voice_wav)
    ours_a = np.concatenate(list(model.generate_audio_stream_from_tokens(
        state, tok_a, fae, RecordedNoise(21), max_gen_len=gl_a, write_back=True,
    )) or [np.zeros(0, np.float32)])
    ours_b = np.concatenate(list(model.generate_audio_stream_from_tokens(
        state, tok_b, fae, RecordedNoise(22), max_gen_len=gl_b, write_back=True,
    )) or [np.zeros(0, np.float32)])

    np.testing.assert_allclose(ours_a, ref_a, rtol=5e-3, atol=2e-3)
    assert ours_b.shape == ref_b.shape, (ours_b.shape, ref_b.shape)
    np.testing.assert_allclose(ours_b, ref_b, rtol=5e-3, atol=2e-3)
    assert int(np.asarray(state.offset)[0]) == ref_end(ref_state)


def test_voice_state_export_import_roundtrip(models, tmp_path):
    _, _, _, model = models
    rng = np.random.default_rng(1)
    voice_wav = (rng.standard_normal((1, 1, 4000)) * 0.1).astype(np.float32)
    state = model.state_for_audio_array(voice_wav)
    dest = tmp_path / "voice.safetensors"
    export_model_state(state, dest)
    loaded = import_model_state(dest)
    assert int(loaded.offset[0]) == int(state.offset[0])
    upto = int(state.offset[0])
    np.testing.assert_allclose(
        np.asarray(loaded.k)[:, :, :upto], np.asarray(state.k)[:, :, :upto],
        rtol=1e-6, atol=1e-6,
    )

    # generation from the re-imported state matches generation from the original
    tokens = [5, 9, 2]
    a1 = np.concatenate(list(model.generate_audio_stream_from_tokens(
        state, tokens, 2, RecordedNoise(5), max_gen_len=6)))
    a2 = np.concatenate(list(model.generate_audio_stream_from_tokens(
        loaded, tokens, 2, RecordedNoise(5), max_gen_len=6)))
    np.testing.assert_allclose(a1, a2, rtol=1e-5, atol=1e-5)


def test_reference_exported_state_imports(models, tmp_path):
    """A voice exported by the torch reference must load (format compat)."""
    cfg, ref_lm, ref_mimi, model = models
    import safetensors.torch
    from pocket_tts.models.tts_model import export_model_state as ref_export

    rng = np.random.default_rng(2)
    voice_wav = (rng.standard_normal((1, 1, 4000)) * 0.1).astype(np.float32)
    with torch.no_grad():
        latent = ref_mimi.encode_to_latent(torch.from_numpy(voice_wav))
        cond = torch.nn.functional.linear(latent.transpose(-1, -2),
                                          ref_lm.speaker_proj_weight)
        cond = torch.cat([ref_lm.bos_before_voice, cond], dim=1)
        state = init_states(ref_lm, batch_size=1, sequence_length=cond.shape[1])
        ref_lm.transformer(cond, state)
        increment_steps(ref_lm, state, cond.shape[1])
    dest = tmp_path / "ref_voice.safetensors"
    ref_export(state, dest)

    ours = import_model_state(dest)
    ours_from_audio = model.state_for_audio_array(voice_wav)
    upto = int(ours.offset[0])
    assert upto == int(ours_from_audio.offset[0])
    np.testing.assert_allclose(
        np.asarray(ours.k)[:, :, :upto],
        np.asarray(ours_from_audio.k)[:, :, :upto],
        rtol=5e-4, atol=5e-4,
    )


def test_batched_generation_matches_sequential(models):
    _, _, _, model = models
    rng = np.random.default_rng(3)
    voices = [
        model.state_for_audio_array(
            (rng.standard_normal((1, 1, 3000 + 1000 * i)) * 0.1).astype(np.float32)
        )
        for i in range(2)
    ]
    token_lists = [[4, 8, 2], [11, 3, 9, 14, 5]]

    # batched run (one noise stream per row so rows match their solo runs)
    row_noise = [RecordedNoise(100 + i) for i in range(2)]

    def batch_noise(shape):
        B, L = shape
        return np.stack([row_noise[b]((L,)) for b in range(B)])

    batched = model.generate_audio_batch(voices, token_lists, frames_after_eos=2,
                                         noise_source=batch_noise)

    for b in range(2):
        solo = np.concatenate(list(model.generate_audio_stream_from_tokens(
            voices[b], token_lists[b], 2, RecordedNoise(100 + b),
            max_gen_len=model._estimate_max_gen_len(
                max(len(t) for t in token_lists)),
        )) or [np.zeros(0, np.float32)])
        np.testing.assert_allclose(batched[b], solo, rtol=5e-4, atol=5e-4,
                                   err_msg=f"row {b}")
