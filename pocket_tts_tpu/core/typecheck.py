"""Call-time type validation for the public API surface.

The reference runtime-typechecks its whole package with beartype
(/root/reference/pocket_tts/__init__.py:6-19 `beartype_this_package`).
beartype is not a dependency here; this module provides the same API contract
— a clear TypeError at the public boundary instead of a shape/dtype explosion
three layers deep — with an explicit per-parameter spec, applied only to the
entry points users actually call (TTSModel.load_model / generate_audio* /
get_state_for_audio_prompt, export_model_state).
"""

from __future__ import annotations

import functools
import inspect


def typechecked(**specs):
    """Validate named parameters against type specs at call time.

    Spec values are a type or a tuple of types; include ``None`` in a tuple to
    allow None. Validation happens when the function is *called* (also for
    generator functions — the check must not be deferred to the first
    ``next()``).
    """

    def deco(fn):
        sig = inspect.signature(fn)

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            bound = sig.bind(*args, **kwargs)
            for name, exp in specs.items():
                if name not in bound.arguments:
                    continue
                val = bound.arguments[name]
                types = exp if isinstance(exp, tuple) else (exp,)
                allow_none = None in types
                real = tuple(t for t in types if t is not None)
                if val is None:
                    if allow_none:
                        continue
                elif isinstance(val, real):
                    # bool passes isinstance(…, int); reject unless bool is
                    # explicitly allowed (mirrors beartype's strictness)
                    if not (isinstance(val, bool) and bool not in real and int in real):
                        continue
                names = " | ".join(
                    ("None" if t is None else t.__name__) for t in types
                )
                raise TypeError(
                    f"{fn.__qualname__}: parameter '{name}' must be {names}, "
                    f"got {type(val).__name__}"
                )
            return fn(*args, **kwargs)

        return wrapper

    return deco
