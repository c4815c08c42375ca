"""Splitter behavior must match the reference token-for-token (it changes what is
spoken). Both implementations are driven with the same word-level fake tokenizer."""

import numpy as np
import torch

from refloader import import_reference

ref_pkg = import_reference()

import re  # noqa: E402

from pocket_tts.models.tts_model import (  # noqa: E402
    prepare_text_prompt as ref_prepare,
    split_into_best_sentences as ref_split,
)

from pocket_tts_tpu.text.splitter import (  # noqa: E402
    prepare_text_prompt,
    split_into_best_sentences,
)


class FakeTok:
    """Word/punct tokenizer with a stable vocab, exposing both the reference
    interface (__call__ -> .tokens, .sp.decode) and ours (encode/decode)."""

    def __init__(self):
        self.vocab: dict[str, int] = {"<prefix>": 0}
        self.rev: dict[int, str] = {0: "<prefix>"}

    def _pieces(self, text: str) -> list[str]:
        return ["<prefix>"] + re.findall(r"[\w']+|[^\w\s]", text)

    def encode(self, text: str) -> list[int]:
        ids = []
        for p in self._pieces(text):
            if p not in self.vocab:
                i = len(self.vocab)
                self.vocab[p] = i
                self.rev[i] = p
            ids.append(self.vocab[p])
        return ids

    def decode(self, ids) -> str:
        words = [self.rev[i] for i in ids if i != 0]
        out = ""
        for w in words:
            if re.match(r"[\w']", w) and out:
                out += " " + w
            else:
                out += w
        return out

    # reference interface
    def __call__(self, text):
        class R:
            pass

        r = R()
        r.tokens = [torch.tensor(self.encode(text))]
        return r

    @property
    def sp(self):
        tok = self

        class SP:
            def decode(self, ids):
                return tok.decode(ids)

        return SP()


TEXTS = [
    "Hello world. I am a TTS system. I hope you like me.",
    "one two three four five six seven eight nine ten, eleven twelve "
    "thirteen fourteen fifteen sixteen; seventeen eighteen nineteen twenty.",
    "It was the best of times, it was the worst of times, it was the age of wisdom, "
    "it was the age of foolishness, it was the epoch of belief, it was the epoch of "
    "incredulity, it was the season of Light, it was the season of Darkness.",
    "No split points here just many words " + "word " * 30,
    "Short.",
    "What?! Really... yes. Indeed!",
]


def test_prepare_text_prompt_matches_reference():
    cases = [
        ("hello world", False, False),
        ("  hi\nthere;  ok ", False, True),
        ("tiny", True, False),
        ("this is a five word one", True, True),
        ("Ends with digit 42", False, False),
        ("already Capitalized!", False, False),
    ]
    for text, pad, semi in cases:
        assert prepare_text_prompt(text, pad, semi) == ref_prepare(text, pad, semi), text


def test_split_matches_reference():
    for text in TEXTS:
        for max_tokens in (8, 15, 50):
            ours = split_into_best_sentences(FakeTok(), text, max_tokens, False, False)
            ref = ref_split(FakeTok(), text, max_tokens, False, False)
            assert ours == ref, (text, max_tokens, ours, ref)


def test_split_preserves_content():
    text = TEXTS[2]
    chunks = split_into_best_sentences(FakeTok(), text, 15, False, False)
    tok = FakeTok()
    orig = tok.encode(prepare_text_prompt(text, False, False)[0].strip())[1:]
    recombined = []
    for c in chunks:
        recombined.extend(tok.encode(c)[1:])
    assert recombined == orig


def test_empty_raises():
    import pytest

    with pytest.raises(ValueError):
        prepare_text_prompt("   ", False, False)
