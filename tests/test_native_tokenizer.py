"""Native C++ tokenizer must agree with the pure-Python implementation."""

import pytest

from test_tokenizer import PIECES, build_model

from pocket_tts_tpu.text.native import (
    NativeSentencePieceTokenizer,
    native_available,
)
from pocket_tts_tpu.text.sentencepiece import SentencePieceTokenizer

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native tokenizer not built (make -C native)"
)

TEXTS = [
    "hello world",
    "hello.",
    "world   hello world",
    "",
    "hello zzz world",
]


def test_native_matches_python(tmp_path):
    path = build_model(tmp_path, PIECES, with_bytes=True)
    n_bins = 1 + len(PIECES) + 256
    py = SentencePieceTokenizer(n_bins, path)
    nat = NativeSentencePieceTokenizer(n_bins, path)
    for text in TEXTS:
        py_ids = py.encode(text)
        nat_ids = nat.encode(text)
        assert py_ids == nat_ids, (text, py_ids, nat_ids)
        assert py.decode(py_ids) == nat.decode(nat_ids), text


def test_native_vocab_check(tmp_path):
    path = build_model(tmp_path, PIECES)
    with pytest.raises(ValueError):
        NativeSentencePieceTokenizer(7, path)
