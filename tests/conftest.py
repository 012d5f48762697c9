"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware is unavailable in CI; sharding tests run on
``--xla_force_host_platform_device_count=8`` CPU devices.

Note: this image's sitecustomize registers the experimental 'axon' TPU
platform and force-updates ``jax_platforms`` to "axon,cpu" at import time,
so the env var alone is not enough — we must update jax.config back to cpu
after importing jax (before any device is touched).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
