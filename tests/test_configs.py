"""Every language config must build specs whose parameter counts match the
published model family (~100M total for 6-layer, ~24-layer adds ~150M)."""

import jax
import numpy as np
import pytest

from pocket_tts_tpu.config import CONFIGS_DIR, load_config
from pocket_tts_tpu.models.flow_lm import build_flow_lm_specs, init_flow_lm_params
from pocket_tts_tpu.models.mimi import build_mimi_specs

ALL_CONFIGS = sorted(p.stem for p in CONFIGS_DIR.glob("*.yaml"))


def count_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


@pytest.mark.parametrize("name", ALL_CONFIGS)
def test_config_builds_specs(name):
    cfg = load_config(CONFIGS_DIR / f"{name}.yaml")
    specs = build_flow_lm_specs(cfg)
    mimi_specs = build_mimi_specs(cfg.mimi)
    assert specs.transformer.num_layers in (6, 24)
    assert mimi_specs.frame_size == 1920
    assert mimi_specs.downsample_stride == 16
    assert specs.ldim == cfg.mimi.quantizer.dimension


def test_param_counts_match_family():
    eager = jax.eval_shape  # shapes only, no memory

    def total(name):
        cfg = load_config(CONFIGS_DIR / f"{name}.yaml")
        specs = build_flow_lm_specs(cfg)
        shapes = eager(lambda k: init_flow_lm_params(specs, k), jax.random.PRNGKey(0))
        return count_params(shapes)

    n6 = total("english")
    n24 = total("italian_24l")
    # FlowLM ~82M for 6 layers (README.md:20, docs/quantization.md:71-76)
    assert 70e6 < n6 < 100e6, n6
    assert n24 - n6 == pytest.approx(18 * (4 * 1024 * 1024 + 8 * 1024 * 1024 + 4 * 1024),
                                     rel=0.01)


def test_all_languages_list():
    assert len(ALL_CONFIGS) == 12  # same set as the reference config dir
    assert {"english", "english_2026-01", "english_2026-04", "french_24l",
            "german", "german_24l", "italian", "italian_24l", "portuguese",
            "portuguese_24l", "spanish", "spanish_24l"} <= set(ALL_CONFIGS)
