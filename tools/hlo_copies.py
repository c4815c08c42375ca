"""Inspect the compiled multi-frame step for cache-sized copy ops.

Round-4 found b128 running at ~65% of the cache-bound floor and blamed
dispatch-boundary cache layout copies visible in the HLO. This tool compiles
the production 32-frame block step at a given batch/capacity on the real
backend and reports every `copy`/`transpose`/`bitcast-convert` whose operand
is cache-sized, so the fix (layout pinning, donation audit) can be targeted.

Usage: python tools/hlo_copies.py [batch] [capacity]
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    capacity = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    from measure_r4 import build_model, post_prompt_state
    from pocket_tts_tpu.models.mimi import init_decoder_state

    model = build_model(quantize=True)
    lm = post_prompt_state(model, batch, capacity - 64, jnp.bfloat16,
                           capacity=capacity)
    mimi = init_decoder_state(model.mimi_specs, batch, jnp.bfloat16)
    prev = jnp.zeros((batch, model.specs.ldim), jnp.float32)
    is_bos = jnp.zeros((batch,), bool)
    noise = jnp.zeros((32, batch, model.specs.ldim), jnp.float32)

    fn = model._multi_step_fn(32)
    lowered = fn.lower(model.params, model.mimi_params, lm, mimi, prev,
                       is_bos, noise)
    compiled = lowered.compile()
    hlo = compiled.as_text()

    L = model.specs.transformer.num_layers
    H = model.specs.transformer.num_heads
    dh = model.specs.transformer.d_model // H
    cache_elems = L * batch * capacity * H * dh
    big = cache_elems // 2  # anything >= half the cache counts

    def elems(shape_str):
        dims = re.findall(r"\d+", shape_str)
        n = 1
        for d in dims:
            n *= int(d)
        return n

    total_bytes = 0
    print(f"=== cache-sized data movement in the compiled b{batch} step "
          f"(cap {capacity}; cache = {cache_elems * 2 / 1e6:.0f} MB bf16) ===")
    for line in hlo.splitlines():
        m = re.search(r"= (\w+\[[0-9,]+\]\S*) (copy|transpose|bitcast)", line)
        if not m:
            continue
        shape = m.group(1)
        n = elems(shape)
        if n >= big:
            total_bytes += n * (2 if "bf16" in shape else 4)
            print(" ", line.strip()[:160])
    print(f"total cache-sized copy traffic per dispatch: "
          f"{total_bytes / 1e6:.1f} MB")


if __name__ == "__main__":
    main()
