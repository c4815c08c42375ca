"""Import helper for the PyTorch reference implementation at /root/reference.

Used by parity tests only: the reference is imported (never copied) and driven
side-by-side with the TPU implementation on identical random weights.
"""

import sys
from pathlib import Path

STUBS = Path(__file__).parent / "refstubs"
REFERENCE = Path("/root/reference")


def import_reference():
    """Make `pocket_tts` (the torch reference) importable and return the package."""
    for p in (str(STUBS), str(REFERENCE)):
        if p not in sys.path:
            sys.path.insert(0, p)
    import pocket_tts  # noqa: F401

    return pocket_tts
