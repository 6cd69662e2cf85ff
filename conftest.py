"""Test environment: CPU backend with an 8-device virtual mesh and f64.

The container's sitecustomize registers the axon TPU backend and imports jax
at interpreter startup, so env vars are too late — use jax.config directly
(backends initialize lazily, so this is still safe at conftest import time).

The accuracy-matching test path is f64 on CPU (the reference's OSQP runs at
1e-9 tolerance); the TPU throughput path is exercised separately by bench.py.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# NOTE: the persistent compilation cache is deliberately NOT enabled for the
# suite. With 130+ tests' compiles in one process, this jaxlib's zstandard
# cache serializer reliably crashes (SIGSEGV/SIGABRT in
# compilation_cache.{get,put}_executable_and_time after ~125 tests,
# reproducible with both cold and warm caches as of 2026-08-19); the bench
# and tool entry points still opt in individually where one process only
# compiles a handful of programs.

assert jax.devices()[0].platform == "cpu", jax.devices()


def pytest_collection_modifyitems(config, items):
    """Best-effort compile-ordering fallback for single-process runs.

    The CONFIGURED runner is pytest-xdist (`addopts = -n 4 --dist loadfile`
    in pyproject.toml): this jaxlib's CPU compiler reliably aborts
    (SIGSEGV/SIGABRT inside backend_compile_and_load) when a large
    compilation lands after ~125 tests' accumulated compilations in ONE
    process, and the suite has outgrown every in-process mitigation —
    xdist's process-per-worker split is the real fix. This sort (big
    compiles first: tools/precompile, stage_profile, parity, large-horizon)
    only improves the odds for explicit `-n 0` single-process runs; it is
    NOT sufficient on its own (measured 2026-08-19/20: alphabetical order
    crashes at ~test 129; reordered single-process runs crash again once
    the suite grows past ~150 tests)."""

    def rank(it):
        nid = it.nodeid
        if "test_utils_io" in nid:
            return 0
        if "test_reference_parity" in nid or "test_columns" in nid:
            return 1
        return 2

    items.sort(key=rank)
