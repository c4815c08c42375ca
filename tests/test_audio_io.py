"""Audio IO: wav read/write round-trips, streaming writer framing, resampling."""

import io
import wave

import numpy as np

from pocket_tts_tpu.io.audio import (
    StreamingWAVWriter,
    audio_read,
    convert_audio,
    stream_audio_chunks,
    write_wav,
)


def test_wav_write_read_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(2400) * 0.2).astype(np.float32)
    p = tmp_path / "x.wav"
    write_wav(p, audio, 24000)
    loaded, sr = audio_read(p)
    assert sr == 24000
    assert loaded.shape == (1, 2400)
    np.testing.assert_allclose(loaded[0], audio, atol=1e-3)


def test_audio_read_downmixes_stereo(tmp_path):
    rng = np.random.default_rng(1)
    left = (rng.standard_normal(1000) * 0.2 * 32767).astype(np.int16)
    right = (rng.standard_normal(1000) * 0.2 * 32767).astype(np.int16)
    inter = np.empty(2000, np.int16)
    inter[0::2], inter[1::2] = left, right
    p = tmp_path / "st.wav"
    with wave.open(str(p), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(inter.tobytes())
    loaded, sr = audio_read(p)
    assert sr == 16000 and loaded.shape == (1, 1000)
    expected = (left.astype(np.float32) + right) / 2 / 32768.0
    np.testing.assert_allclose(loaded[0], expected, atol=1e-4)


def test_streaming_writer_valid_wav_with_trailing_silence():
    buf = io.BytesIO()
    writer = StreamingWAVWriter(buf, 24000)
    writer.write_header(24000)
    chunks = [np.ones(1920, np.float32) * 0.1 for _ in range(3)]
    for c in chunks:
        writer.write_pcm_data(c)
    writer.finalize()
    buf.seek(0)
    with wave.open(buf) as w:
        assert w.getframerate() == 24000
        data = np.frombuffer(w.readframes(3 * 1920 + 4800), np.int16)
    assert len(data) == 3 * 1920 + 4800  # 200 ms silence appended
    assert np.all(data[-4800:] == 0)


def test_stream_audio_chunks_to_path(tmp_path):
    p = tmp_path / "s.wav"
    chunks = (np.full(1920, 0.05, np.float32) for _ in range(2))
    stream_audio_chunks(p, chunks, 24000)
    loaded, sr = audio_read(p)
    assert sr == 24000
    assert loaded.shape[-1] == 2 * 1920 + 4800


def test_convert_audio_resamples():
    t = np.arange(16000, dtype=np.float32) / 16000
    wav = np.sin(2 * np.pi * 440 * t)[None, :]
    out = convert_audio(wav, 16000, 24000, 1)
    assert out.shape == (1, 24000)
    # energy preserved approximately
    assert abs(np.std(out) - np.std(wav)) < 0.02
