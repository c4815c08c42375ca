"""pocket-tts-tpu: a TPU-native (JAX/XLA/Pallas) streaming text-to-speech
framework with the capabilities of kyutai-labs/pocket-tts.

Public API mirrors the reference package surface (pocket_tts/__init__.py):
`TTSModel` and `export_model_state`.
"""

from pocket_tts_tpu.pipeline.states import export_model_state
from pocket_tts_tpu.pipeline.tts import TTSModel

__all__ = ["TTSModel", "export_model_state"]
