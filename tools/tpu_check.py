"""On-device correctness check: run the small-model e2e generation on the real
TPU and compare against a CPU golden (tests cover CPU vs torch; this closes the
loop TPU vs CPU).

Usage: python tools/tpu_check.py            # runs on the default (TPU) backend
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent.parent / "tests"))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np


def run_generation():
    from small_model import build_small_tts_model

    from pocket_tts_tpu.pipeline.tts import NoiseSource

    model = build_small_tts_model()
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal((1, 1, 4000)) * 0.1).astype(np.float32)
    voice = model.state_for_audio_array(wav)
    noise = NoiseSource(model.gen, 42)
    chunks = list(
        model.generate_audio_stream_from_tokens(voice, [3, 9, 4, 7], 2, noise,
                                                max_gen_len=10)
    )
    return np.concatenate(chunks) if chunks else np.zeros(0, np.float32)


def main():
    device_audio = run_generation()
    print(f"device backend: {jax.default_backend()}, "
          f"samples: {device_audio.shape[0]}", flush=True)

    # golden on CPU within the same process
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        # force cpu backend for a fresh model (jit caches are per-device)
        cpu_audio = run_generation()

    assert device_audio.shape == cpu_audio.shape, (device_audio.shape, cpu_audio.shape)
    err = np.max(np.abs(device_audio - cpu_audio))
    denom = max(np.max(np.abs(cpu_audio)), 1e-6)
    print(f"max abs err: {err:.3e} (rel {err / denom:.3e})")
    assert err / denom < 5e-2, "TPU and CPU generations diverged"
    print("TPU e2e correctness: OK")


if __name__ == "__main__":
    main()
