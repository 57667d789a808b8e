"""Test configuration: run on CPU with 8 virtual devices.

This is the standard JAX idiom for testing pjit/shard_map multi-chip code
without TPU hardware; single-chip numerics are identical across backends at
the tolerances these tests use.

Note: this container's sitecustomize registers an `axon` TPU backend at
interpreter startup and force-overrides ``jax_platforms``; the config update
below (before any backend is initialized) reverts the selection to CPU for
the test processes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
