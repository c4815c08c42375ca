"""ctypes binding for the native C++ tokenizer (native/sp_tokenizer.cpp).

Loads native/libsptok.so when present (built via `make -C native`); callers fall
back to the pure-Python implementation otherwise. Interface matches
text/sentencepiece.SentencePieceTokenizer.
"""

from __future__ import annotations

import ctypes
from pathlib import Path

_LIB_PATHS = [
    Path(__file__).parent.parent.parent / "native" / "libsptok.so",
    Path(__file__).parent / "libsptok.so",
]


def _load_lib():
    for p in _LIB_PATHS:
        if p.exists():
            lib = ctypes.CDLL(str(p))
            lib.sp_load.restype = ctypes.c_void_p
            lib.sp_load.argtypes = [ctypes.c_char_p]
            lib.sp_vocab_size.restype = ctypes.c_int
            lib.sp_vocab_size.argtypes = [ctypes.c_void_p]
            lib.sp_encode.restype = ctypes.c_int
            lib.sp_encode.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ]
            lib.sp_decode.restype = ctypes.c_int
            lib.sp_decode.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_int), ctypes.c_int,
                ctypes.c_char_p, ctypes.c_int,
            ]
            lib.sp_free.argtypes = [ctypes.c_void_p]
            return lib
    return None


_LIB = _load_lib()


def native_available() -> bool:
    return _LIB is not None


class NativeSentencePieceTokenizer:
    """Native-backed tokenizer; raises RuntimeError if the library is absent."""

    def __init__(self, n_bins: int, model_path: str | Path):
        if _LIB is None:
            raise RuntimeError("native tokenizer library not built (make -C native)")
        self._model = _LIB.sp_load(str(model_path).encode())
        if not self._model:
            raise ValueError(f"failed to load sentencepiece model: {model_path}")
        vocab = _LIB.sp_vocab_size(self._model)
        if vocab != n_bins:
            raise ValueError(f"tokenizer has vocab size={vocab} but n_bins={n_bins}")

    def encode(self, text: str) -> list[int]:
        buf_len = max(4 * len(text) + 16, 256)
        buf = (ctypes.c_int * buf_len)()
        n = _LIB.sp_encode(self._model, text.encode("utf-8"), buf, buf_len)
        if n > buf_len:  # extremely long input: retry with the exact size
            buf = (ctypes.c_int * n)()
            n = _LIB.sp_encode(self._model, text.encode("utf-8"), buf, n)
        return list(buf[:n])

    def decode(self, ids: list[int]) -> str:
        arr = (ctypes.c_int * len(ids))(*ids)
        buf_len = 16 * len(ids) + 16
        buf = ctypes.create_string_buffer(buf_len)
        n = _LIB.sp_decode(self._model, arr, len(ids), buf, buf_len)
        return buf.raw[: min(n, buf_len)].decode("utf-8", "replace")

    def __del__(self):
        if getattr(self, "_model", None) and _LIB is not None:
            _LIB.sp_free(self._model)
            self._model = None


def best_tokenizer(n_bins: int, model_path):
    """Native when built, pure-Python otherwise."""
    if native_available():
        try:
            return NativeSentencePieceTokenizer(n_bins, model_path)
        except (ValueError, RuntimeError):
            pass
    from pocket_tts_tpu.text.sentencepiece import SentencePieceTokenizer

    return SentencePieceTokenizer(n_bins, model_path)
