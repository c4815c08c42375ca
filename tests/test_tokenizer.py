"""Pure-Python SentencePiece: build a tiny unigram .model protobuf by hand and
check round-trip encode/decode + Viterbi segmentation."""

import struct
from pathlib import Path

from pocket_tts_tpu.text.sentencepiece import (
    BYTE,
    NORMAL,
    UNKNOWN,
    SentencePieceModel,
    SentencePieceTokenizer,
)


def _varint(n: int) -> bytes:
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _field(num: int, wtype: int, payload: bytes) -> bytes:
    return _varint((num << 3) | wtype) + payload


def _piece(text: str, score: float, ptype: int | None = None) -> bytes:
    body = _field(1, 2, _varint(len(text.encode())) + text.encode())
    body += _field(2, 5, struct.pack("<f", score))
    if ptype is not None:
        body += _field(3, 0, _varint(ptype))
    return _field(1, 2, _varint(len(body)) + body)


def build_model(tmp_path: Path, pieces, with_bytes=False) -> Path:
    data = b""
    data += _piece("<unk>", 0.0, UNKNOWN)
    for text, score in pieces:
        data += _piece(text, score, NORMAL)
    if with_bytes:
        for b in range(256):
            data += _piece(f"<0x{b:02X}>", -20.0, BYTE)
    # normalizer_spec: defaults (add_dummy_prefix=true etc. are proto defaults here,
    # so encode an explicit one)
    norm = _field(2, 0, _varint(1)) + _field(4, 0, _varint(1)) + _field(5, 0, _varint(1))
    data += _field(3, 2, _varint(len(norm)) + norm)
    p = tmp_path / "toy.model"
    p.write_bytes(data)
    return p


PIECES = [
    ("▁hello", -1.0),
    ("▁world", -1.1),
    ("▁hell", -3.0),
    ("o", -2.0),
    ("▁w", -4.0),
    ("orld", -4.1),
    ("▁", -5.0),
    ("h", -6.0),
    ("e", -6.0),
    ("l", -6.0),
    ("w", -6.0),
    ("d", -6.0),
    ("r", -6.0),
    (".", -2.5),
]


def test_load_and_encode_unigram(tmp_path):
    path = build_model(tmp_path, PIECES)
    m = SentencePieceModel.load(path)
    assert m.vocab_size() == 1 + len(PIECES)
    assert m.add_dummy_prefix

    ids = m.encode("hello world")
    texts = [m.pieces[i].text for i in ids]
    # Viterbi must pick the high-scoring full-word pieces
    assert texts == ["▁hello", "▁world"]
    assert m.decode(ids) == "hello world"


def test_encode_picks_best_segmentation(tmp_path):
    path = build_model(tmp_path, PIECES)
    m = SentencePieceModel.load(path)
    ids = m.encode("hello.")
    texts = [m.pieces[i].text for i in ids]
    assert texts == ["▁hello", "."]


def test_unknown_chars_fall_back(tmp_path):
    path = build_model(tmp_path, PIECES, with_bytes=True)
    m = SentencePieceModel.load(path)
    ids = m.encode("hello zzz")
    assert m.decode(ids) == "hello zzz"  # byte pieces round-trip


def test_tokenizer_vocab_check(tmp_path):
    path = build_model(tmp_path, PIECES)
    tok = SentencePieceTokenizer(1 + len(PIECES), path)
    assert tok.decode(tok.encode("hello world")) == "hello world"
    try:
        SentencePieceTokenizer(999, path)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
