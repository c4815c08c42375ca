"""Precompute voice-state safetensors for the whole voice catalog x configs.

Equivalent of the reference scripts/generate_default_voices.py:1-29 — produces
the per-language embedding files served from the hub for environments without
voice-cloning weights.
"""

from __future__ import annotations

import argparse
from pathlib import Path

from pocket_tts_tpu.config import CONFIGS_DIR
from pocket_tts_tpu.core.hub import PREDEFINED_VOICE_ORIGINS


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="voices")
    parser.add_argument("--languages", nargs="*", default=None)
    args = parser.parse_args()

    from pocket_tts_tpu.pipeline.tts import TTSModel

    languages = args.languages or [p.stem for p in sorted(CONFIGS_DIR.glob("*.yaml"))]
    out_root = Path(args.out)
    for language in languages:
        model = TTSModel.load_model(language=language)
        lang_dir = out_root / language / "embeddings"
        lang_dir.mkdir(parents=True, exist_ok=True)
        for name, origin in PREDEFINED_VOICE_ORIGINS.items():
            dest = lang_dir / f"{name}.safetensors"
            if dest.exists():
                continue
            try:
                state = model.get_state_for_audio_prompt(origin, truncate=True)
            except Exception as e:
                print(f"skip {language}/{name}: {e}")
                continue
            model.export_model_state(state, dest)
            print(f"wrote {dest}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
