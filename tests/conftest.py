"""Test harness: force an 8-device virtual CPU mesh so TPU-style distributed
logic (pjit sharding, collectives) is exercised without contending for the
TPU — the multi-device test strategy promised in SURVEY.md §4.

Note: the environment's sitecustomize pre-imports jax and registers the
'axon' TPU backend (overriding JAX_PLATFORMS), so CPU must be selected via
jax.config AFTER import, before any backend is initialized."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

# Persistent compilation cache: on this single-core box XLA:CPU compilation
# dominates suite wall-clock (fast tier measured 22 min cold). Identical
# (HLO, flags) re-runs hit the disk cache instead, cutting repeat runs to
# the actual test compute. Safe across processes (orbax-style atomic
# writes); keyed on backend+HLO so TPU runs never collide with it.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavyweight test (multi-process, full-model compile, or "
        "end-to-end train); deselect with -m 'not slow' for the <5-min "
        "single-core tier (RUNBOOK: used between run-queue phases)")
