"""CLI integration: `generate` and `export-voice` end-to-end, fully offline —
custom small YAML config, toy sentencepiece model built on the fly, local voice
wav, random-init weights (mirrors reference tests/test_cli_generate.py checks:
valid 24 kHz mono WAV, nonzero duration, custom sampling params)."""

import struct
import wave

import numpy as np
import pytest
import yaml

from test_tokenizer import _field, _piece, _varint

from pocket_tts_tpu.api.cli import main
from pocket_tts_tpu.config import CONFIGS_DIR, load_config
from pocket_tts_tpu.text.sentencepiece import BYTE, NORMAL


WORDS = ["hello", "world", "this", "is", "a", "test", "of", "the", "tts"]


def build_tokenizer_model(path):
    data = _piece("<unk>", 0.0, 2)
    for w in WORDS:
        data += _piece("▁" + w, -1.0, NORMAL)
    data += _piece(".", -1.5, NORMAL)
    data += _piece(",", -1.5, NORMAL)
    data += _piece("!", -1.5, NORMAL)
    data += _piece("?", -1.5, NORMAL)
    for b in range(256):
        data += _piece(f"<0x{b:02X}>", -20.0, BYTE)
    norm = _field(2, 0, _varint(1)) + _field(4, 0, _varint(1)) + _field(5, 0, _varint(1))
    data += _field(3, 2, _varint(len(norm)) + norm)
    path.write_bytes(data)
    return 1 + len(WORDS) + 4 + 256


def write_config(tmp_path, tokenizer_path, n_bins):
    cfg = load_config(CONFIGS_DIR / "english.yaml").model_dump()
    cfg["flow_lm"]["transformer"].update(d_model=64, num_heads=4, num_layers=2,
                                         hidden_scale=2)
    cfg["flow_lm"]["flow"].update(dim=48, depth=2)
    cfg["flow_lm"]["lookup_table"].update(n_bins=n_bins,
                                          tokenizer_path=str(tokenizer_path))
    cfg["mimi"]["seanet"].update(dimension=64, n_filters=8)
    cfg["mimi"]["transformer"].update(d_model=64, num_heads=4, dim_feedforward=128,
                                      input_dimension=64, output_dimensions=[64],
                                      context=30)
    cfg["mimi"]["quantizer"].update(dimension=8, output_dimension=64)
    cfg["mimi"]["inner_dim"] = 8
    cfg["mimi"]["outer_dim"] = 64
    cfg["weights_path"] = None
    cfg["weights_path_without_voice_cloning"] = None
    cfg["flow_lm"]["weights_path"] = None
    cfg["mimi"]["weights_path"] = None
    p = tmp_path / "small.yaml"
    p.write_text(yaml.safe_dump(cfg))
    return p


def write_voice_wav(path, seconds=0.4, rate=24000):
    rng = np.random.default_rng(0)
    samples = (rng.standard_normal(int(rate * seconds)) * 0.05 * 32767).astype(np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    tok = tmp / "tok.model"
    n_bins = build_tokenizer_model(tok)
    config = write_config(tmp, tok, n_bins)
    voice = tmp / "voice.wav"
    write_voice_wav(voice)
    return tmp, config, voice


def test_cli_generate_writes_valid_wav(env):
    tmp, config, voice = env
    out = tmp / "out.wav"
    rc = main(["-q", "generate", "hello world this is a test",
               "--config", str(config), "--voice", str(voice),
               "--out", str(out), "--seed", "0"])
    assert rc == 0
    with wave.open(str(out)) as w:
        assert w.getframerate() == 24000
        assert w.getnchannels() == 1
        n = w.getnframes()
    assert n > 24000 // 10


def test_cli_generate_custom_sampling(env):
    tmp, config, voice = env
    out = tmp / "out2.wav"
    rc = main(["-q", "generate", "hello world",
               "--config", str(config), "--voice", str(voice),
               "--out", str(out), "--temp", "0.2", "--lsd-decode-steps", "2",
               "--noise-clamp", "2.0", "--eos-threshold", "-2.0", "--seed", "1"])
    assert rc == 0
    assert out.exists()


def test_cli_export_voice_roundtrip(env):
    tmp, config, voice = env
    dest = tmp / "voice_state.safetensors"
    rc = main(["-q", "export-voice", str(voice), str(dest),
               "--config", str(config)])
    assert rc == 0

    out = tmp / "out3.wav"
    rc = main(["-q", "generate", "hello world",
               "--config", str(config), "--voice", str(dest),
               "--out", str(out), "--seed", "2"])
    assert rc == 0
    assert out.exists()
