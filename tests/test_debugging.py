"""Debug/observability utilities: jit-safe intermediate tagging, jaxpr dump,
scoped logging."""

import logging

import jax
import jax.numpy as jnp
import numpy as np

from pocket_tts_tpu.core.debugging import intermediate_dump, print_jaxpr, tag
from pocket_tts_tpu.core.logging_utils import display_execution_time, enable_logging


def test_tag_collects_inside_jit():
    @jax.jit
    def f(x):
        y = x * 2
        tag("doubled", y)
        return y + 1

    with intermediate_dump() as dump:
        out = f(jnp.arange(4.0))
        jax.block_until_ready(out)
    assert "doubled" in dump
    np.testing.assert_allclose(dump["doubled"][0], [0, 2, 4, 6])


def test_tag_is_noop_outside_context():
    @jax.jit
    def f(x):
        tag("unused", x)
        return x

    np.testing.assert_allclose(np.asarray(f(jnp.ones(2))), [1, 1])


def test_print_jaxpr():
    text = print_jaxpr(lambda x: x * 2 + 1, jnp.ones(3))
    assert "mul" in text and "add" in text


def test_enable_logging_scoped(caplog):
    logger = logging.getLogger("pocket_tts_tpu.test")
    with enable_logging(logging.INFO):
        logger.info("inside")
    # handler removed afterwards
    root_handlers = logging.getLogger("pocket_tts_tpu").handlers
    assert not root_handlers


def test_display_execution_time_records():
    with display_execution_time("task", print_output=False) as timer:
        pass
    assert timer.elapsed_time_ms is not None and timer.elapsed_time_ms >= 0
