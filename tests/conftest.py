"""Test harness config: force CPU with 8 virtual devices (multi-chip tests)
and float64 (parity tolerances need doubles).

The container's sitecustomize registers the axon TPU PJRT plugin and sets
JAX_PLATFORMS=axon before pytest starts, so env setdefault is not enough:
override the platform through jax.config before any backend is used.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"
