"""Shared tiny-model builder for tests that need a working TTSModel without
checkpoints (random weights, no tokenizer download)."""

import jax
import jax.numpy as jnp

from pocket_tts_tpu.config import CONFIGS_DIR, Config, load_config
from pocket_tts_tpu.models.flow_lm import build_flow_lm_specs, init_flow_lm_params
from pocket_tts_tpu.models.mimi import build_mimi_specs, init_mimi_params
from pocket_tts_tpu.pipeline.tts import GenerationParams, TTSModel


class WordTokenizer:
    """Deterministic toy tokenizer satisfying the encode/decode protocol."""

    def __init__(self, n_bins: int):
        self.n_bins = n_bins

    def encode(self, text):
        ids = [0]
        for word in text.split():
            ids.append(1 + (hash(word) % (self.n_bins - 1)))
        return ids

    def decode(self, ids):
        return " ".join(f"w{i}" for i in ids if i != 0)


def small_config(n_bins: int = 31) -> Config:
    cfg = load_config(CONFIGS_DIR / "english.yaml")
    d = cfg.model_dump()
    d["flow_lm"]["transformer"].update(d_model=64, num_heads=4, num_layers=2,
                                       hidden_scale=2)
    d["flow_lm"]["flow"].update(dim=48, depth=2)
    d["flow_lm"]["lookup_table"].update(n_bins=n_bins)
    d["mimi"]["seanet"].update(dimension=64, n_filters=8)
    d["mimi"]["transformer"].update(d_model=64, num_heads=4, dim_feedforward=128,
                                    input_dimension=64, output_dimensions=(64,),
                                    context=30)
    d["mimi"]["quantizer"].update(dimension=8, output_dimension=64)
    d["mimi"]["inner_dim"] = 8
    d["mimi"]["outer_dim"] = 64
    d["weights_path"] = None
    d["flow_lm"]["weights_path"] = None
    d["mimi"]["weights_path"] = None
    return Config(**d)


def build_small_tts_model(seed: int = 0, tokenizer=None) -> TTSModel:
    cfg = small_config()
    specs = build_flow_lm_specs(cfg)
    mimi_specs = build_mimi_specs(cfg.mimi)
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    params = init_flow_lm_params(specs, k1)
    mimi_params = init_mimi_params(mimi_specs, k2)
    return TTSModel(
        specs, mimi_specs, params, mimi_params,
        tokenizer=tokenizer or WordTokenizer(cfg.flow_lm.lookup_table.n_bins),
        config=cfg, gen_params=GenerationParams(),
        origin=CONFIGS_DIR / "english.yaml",
    )
