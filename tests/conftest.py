"""Test configuration: run JAX on a virtual 8-device CPU mesh (no TPU needed),
mirroring how the multi-chip sharding paths are validated."""

import os
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

REPO = Path(__file__).parent.parent
for p in (str(REPO), str(REPO / "tests")):
    if p not in sys.path:
        sys.path.insert(0, p)

# The container's sitecustomize pre-imports jax with JAX_PLATFORMS=axon (the real
# TPU tunnel); tests must run on the virtual CPU mesh regardless.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
