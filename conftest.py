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

# XLA compiles dominate the suite runtime on this CPU; persist them across
# runs (repo-local, gitignored)
jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.devices()[0].platform == "cpu", jax.devices()
