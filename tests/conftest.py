"""Test env: force CPU with 8 virtual devices so mesh/sharding tests run
without TPU hardware (SURVEY.md §4 TPU translation: replaces the reference's
DistributedTestBase multi-process harness with a virtual CPU mesh).

Note: this image's sitecustomize pre-imports jax and initializes the TPU
backend at interpreter start, so we must clear backends before re-selecting
the CPU platform.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402
import jax.extend.backend  # noqa: E402

jax.extend.backend.clear_backends()
jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"
