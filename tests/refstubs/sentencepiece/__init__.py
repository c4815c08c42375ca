"""Import-time stand-in for the `sentencepiece` C++ package (absent offline).

Only constructed lazily by the reference; tests that need real tokenization use
pocket_tts_tpu.text.sentencepiece (pure Python) instead.
"""


class SentencePieceProcessor:
    def __init__(self, *args, **kwargs):
        raise RuntimeError("sentencepiece is not available in this environment")
