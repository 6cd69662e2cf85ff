"""Runtime platform selection for experiment CLIs.

The container registers the axon TPU backend at interpreter startup and
pins JAX_PLATFORMS=axon; experiment scripts call `setup()` before any other
jax usage to pick the platform explicitly:

  * "cpu" + x64 — the accuracy path used for reference-parity simulations
    (the reference runs OSQP/IPOPT at 1e-9 tolerances on CPU),
  * default/TPU + f32 — the throughput path used by bench.py.
"""

from __future__ import annotations

import os


def setup(platform: str | None = "cpu", x64: bool = True, host_devices: int | None = None):
    if host_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={host_devices}"
            ).strip()
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    if x64:
        jax.config.update("jax_enable_x64", True)
    return jax


def env_int(name: str, default: int) -> int:
    """Integer env knob with a safe fallback (bench/profiler RNM_* flags)."""
    try:
        return int(os.environ.get(name, default))
    except ValueError:
        return default


def enable_compile_cache(cache_dir: str = ".jax_cache") -> bool:
    """Opt into JAX's persistent compilation cache — except under pytest.

    The tool entry points (bench_sweep, stage_profile, kernel_bench,
    precompile, pallas benches) enable the cache to amortize the remote-TPU
    compile tunnel across processes. The test suite must NOT inherit it:
    this jaxlib's zstandard cache serializer segfaults under the suite's
    130+ accumulated compilations (see conftest.py), and tool modules are
    imported/called from tests — a process-wide `jax.config.update` here
    would silently re-enable the cache for every test that follows.
    Returns True when the cache was enabled.
    """
    import os
    import sys

    # PYTEST_CURRENT_TEST is only set while a test runs; PYTEST_VERSION is
    # set by the pytest entry point for the whole process (covers
    # collection-time module imports). A bare "pytest" in sys.modules is NOT
    # sufficient evidence on its own — a production process may import a
    # library that imports pytest — so it only counts when the process was
    # actually launched as pytest (argv[0]).
    if (
        "PYTEST_CURRENT_TEST" in os.environ
        or "PYTEST_VERSION" in os.environ
        or "PYTEST_XDIST_WORKER" in os.environ
    ):
        return False
    if "pytest" in sys.modules:
        argv0 = os.path.basename(sys.argv[0] if sys.argv else "")
        if argv0.startswith(("pytest", "py.test")):
            return False
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        return False
    return True
