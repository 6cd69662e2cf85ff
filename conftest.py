"""Test environment: CPU backend with an 8-device virtual mesh and f64.

Must run before jax is imported anywhere (pytest imports this conftest first).
The accuracy-matching test path is f64 on CPU (the reference's OSQP runs at
1e-9 tolerance); the TPU throughput path is exercised separately by bench.py.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_ENABLE_X64", "true")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
