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

# FS_TPU_TESTS=1 opts OUT of the CPU forcing so the TPU-tier ledger tests
# (test_quality_ledger.py) can run on a real chip:
#   FS_TPU_TESTS=1 PYTHONPATH=/root/repo:/root/.axon_site \
#       python -m pytest tests/test_quality_ledger.py -k ledger
_tpu_tests = os.environ.get("FS_TPU_TESTS") == "1"

flags = os.environ.get("XLA_FLAGS", "")
if not _tpu_tests and "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if not _tpu_tests:
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# persistent compilation cache: most of the suite's wall time is XLA
# compiles (single-core box); repeat runs hit the cache instead
jax.config.update("jax_compilation_cache_dir", "/tmp/fusionsense_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

if not _tpu_tests:
    assert jax.devices()[0].platform == "cpu", (
        "tests must run on the virtual CPU mesh, got: " + str(jax.devices())
    )
