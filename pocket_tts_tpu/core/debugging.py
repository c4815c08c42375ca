"""Cross-implementation numeric debugging aids.

The reference ships a TorchDispatchMode that prints every ATen op + shapes
(utils/debugging.py:16-26) to diff implementations. The JAX equivalents here:

* `intermediate_dump` — a tagging context: code calls `tag("name", x)` at
  interesting points; under the context, values are fetched to numpy and
  recorded (uses jax.debug.callback, so it works inside jit too). Outside the
  context, tag() is free.
* `print_jaxpr` — show the traced ops of a function for shape/op auditing.
* `profile_trace` — wrap a block in a jax.profiler trace for TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import logging
from typing import Any, Callable

import jax
import numpy as np

logger = logging.getLogger(__name__)

_ACTIVE_SINK: dict[str, list[np.ndarray]] | None = None


def tag(name: str, value) -> None:
    """Record `value` under `name` when an intermediate_dump context is active."""
    if _ACTIVE_SINK is None:
        return

    def _record(v, name=name):
        sink = _ACTIVE_SINK
        if sink is not None:
            sink.setdefault(name, []).append(np.asarray(v))

    jax.debug.callback(_record, value)


@contextlib.contextmanager
def intermediate_dump():
    """Collect tagged intermediates: `with intermediate_dump() as d: ...; d["x"]`."""
    global _ACTIVE_SINK
    prev = _ACTIVE_SINK
    _ACTIVE_SINK = {}
    try:
        yield _ACTIVE_SINK
    finally:
        _ACTIVE_SINK = prev


def print_jaxpr(fn: Callable, *example_args: Any) -> str:
    jaxpr = jax.make_jaxpr(fn)(*example_args)
    text = str(jaxpr)
    logger.info("%s", text)
    return text


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/pocket_tts_tpu_trace"):
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
