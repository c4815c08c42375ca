"""Host-side audio IO: wav read, streaming wav write, sample-rate conversion.

Equivalent surface to the reference data layer (/root/reference/pocket_tts/data/
audio.py and audio_utils.py) with numpy arrays end to end: `audio_read`,
`StreamingWAVWriter` (unseekable-stream friendly, buffers an optional first
chunk, appends 200 ms of trailing silence), `stream_audio_chunks`, and polyphase
`convert_audio`.
"""

from __future__ import annotations

import os
import sys
import wave
from contextlib import nullcontext
from math import gcd
from pathlib import Path
from typing import Any, Iterator

import numpy as np

FIRST_CHUNK_LENGTH_SECONDS = float(os.environ.get("FIRST_CHUNK_LENGTH_SECONDS", "0"))


def audio_read(filepath: str | Path) -> tuple[np.ndarray, int]:
    """Read an audio file -> (float32 [1, T] mono-downmixed, sample_rate).

    WAV via the stdlib; other formats need the optional soundfile package.
    """
    filepath = Path(filepath)
    if filepath.suffix.lower() == ".wav":
        with wave.open(str(filepath), "rb") as f:
            sample_rate = f.getframerate()
            n_channels = f.getnchannels()
            width = f.getsampwidth()
            raw = f.readframes(-1)
        if width == 2:
            samples = np.frombuffer(raw, dtype=np.int16).astype(np.float32) / 32768.0
        elif width == 4:
            samples = np.frombuffer(raw, dtype=np.int32).astype(np.float32) / 2147483648.0
        elif width == 1:
            samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
        else:
            raise ValueError(f"Unsupported WAV sample width: {width}")
        if n_channels > 1:
            samples = samples.reshape(-1, n_channels).mean(axis=1)
        return samples[None, :], sample_rate

    try:
        import soundfile as sf
    except ImportError as e:
        raise ImportError(
            "soundfile is required to read non-WAV audio files."
        ) from e
    data, sample_rate = sf.read(str(filepath), dtype="float32")
    if data.ndim > 1:
        data = data.mean(axis=1)
    return data[None, :], sample_rate


def convert_audio(
    wav: np.ndarray, from_rate: int | float, to_rate: int | float, to_channels: int
) -> np.ndarray:
    """Polyphase resampling (scipy) + channel check. wav: [..., C, T]."""
    if from_rate != to_rate:
        from scipy.signal import resample_poly

        g = gcd(int(from_rate), int(to_rate))
        wav = resample_poly(wav, int(to_rate) // g, int(from_rate) // g, axis=-1).astype(
            wav.dtype, copy=False
        )
    assert wav.shape[-2] == to_channels, (wav.shape, to_channels)
    return wav


class StreamingWAVWriter:
    """Write 16-bit mono PCM wav to a possibly unseekable stream."""

    def __init__(self, output_stream, sample_rate: int):
        self.output_stream = output_stream
        self.sample_rate = sample_rate
        self.wave_writer: wave.Wave_write | None = None
        self.first_chunk_buffer: list[bytes] | None = []

    def write_header(self, sample_rate: int) -> None:
        self.wave_writer = wave.open(self.output_stream, "wb")
        self.wave_writer.setnchannels(1)
        self.wave_writer.setsampwidth(2)
        self.wave_writer.setframerate(sample_rate)
        # placeholder frame count; unseekable streams never patch the header
        self.wave_writer.setnframes(1_000_000_000)

    def write_pcm_data(self, audio_chunk: np.ndarray) -> None:
        chunk = np.clip(np.asarray(audio_chunk), -1.0, 1.0)
        chunk_bytes = (chunk * 32767.0).astype(np.int16).tobytes()
        if self.first_chunk_buffer is not None:
            self.first_chunk_buffer.append(chunk_bytes)
            total = sum(len(c) for c in self.first_chunk_buffer)
            if total < int(self.sample_rate * FIRST_CHUNK_LENGTH_SECONDS) * 2:
                return
            self._flush()
            return
        self.wave_writer.writeframesraw(chunk_bytes)

    def _flush(self) -> None:
        if self.first_chunk_buffer is not None:
            self.wave_writer.writeframesraw(b"".join(self.first_chunk_buffer))
            self.first_chunk_buffer = None

    def finalize(self) -> None:
        self._flush()
        # trailing 200 ms of silence for clean playback cut-off
        self.wave_writer.writeframesraw(bytes(int(self.sample_rate * 0.2) * 2))
        if self.wave_writer:
            self.wave_writer._patchheader = lambda: None  # never seek back
            self.wave_writer.close()


def is_file_like(obj: Any) -> bool:
    return all(hasattr(obj, attr) for attr in ("write", "close"))


def stream_audio_chunks(
    path: str | Path | None | Any, audio_chunks: Iterator[np.ndarray], sample_rate: int
) -> None:
    """Drain an iterator of [T] float chunks into a wav file / stdout / file-like."""
    if path == "-":
        f = sys.stdout.buffer
    elif path is None:
        f = nullcontext()
    elif is_file_like(path):
        f = path
    else:
        f = open(path, "wb")

    with f:
        writer = None
        if path is not None:
            writer = StreamingWAVWriter(f, sample_rate)
            writer.write_header(sample_rate)
        for chunk in audio_chunks:
            if writer is not None:
                writer.write_pcm_data(chunk)
        if writer is not None:
            writer.finalize()


def write_wav(path: str | Path, audio: np.ndarray, sample_rate: int) -> None:
    """One-shot wav write of a [T] or [C, T] float array."""
    audio = np.asarray(audio)
    if audio.ndim == 2:
        audio = audio.mean(axis=0)
    with open(path, "wb") as f:
        w = wave.open(f, "wb")
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes((np.clip(audio, -1, 1) * 32767.0).astype(np.int16).tobytes())
        w.close()
