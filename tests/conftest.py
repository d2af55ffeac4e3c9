"""Test configuration: force CPU backend with 8 virtual devices.

Tests never require real TPU hardware; multi-device sharding tests use the
virtual CPU mesh (SURVEY.md §4 test strategy).

Note: this environment's sitecustomize imports jax at interpreter startup
(before conftest), so setting JAX_PLATFORMS here is too late — but backends
initialize lazily, so jax.config.update still selects CPU as long as no
computation ran yet. XLA_FLAGS is read when the CPU client spins up, which
is also still in the future at conftest time.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# persistent compilation cache: most of the suite's wall time is XLA
# compiles (single-core box); repeat runs hit the cache instead
jax.config.update("jax_compilation_cache_dir", "/tmp/fusionsense_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU mesh, got: " + str(jax.devices())
)
