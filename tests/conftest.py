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

# persistent compilation cache: the BS5+CG step programs are expensive to
# compile and identical across tests/processes
jax.config.update("jax_compilation_cache_dir", "/tmp/pynama-jax-cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Skip @slow (subprocess CLI drives) unless PYNAMA_RUN_SLOW=1."""
    if os.environ.get("PYNAMA_RUN_SLOW") == "1":
        return
    skip = pytest.mark.skip(reason="slow end-to-end drive; PYNAMA_RUN_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
