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


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavyweight test (multi-process, full-model compile, or "
        "end-to-end train); deselect with -m 'not slow' for the <5-min "
        "single-core tier (RUNBOOK: used between run-queue phases)")
