"""AOT solver precompilation — the TPU-native replacement for the reference's
OSQP code-generation workflow.

The reference requires a per-system build step (`solver/generate_osqp_*.py`
emits a shape-locked C extension into build/osqp_fast that must be pip-
installed, README.md:35-46, and is silently wrong if reused across systems).
On TPU, XLA recompiles per shape automatically, so no codegen exists; what
remains useful is *ahead-of-time* compilation to hide the first-solve
latency. This tool lowers and compiles the jitted MPC iteration for a given
(system, N) and primes JAX's persistent compilation cache, so later runs
start hot.

Usage:
    python -m robust_nonlinear_mpc_tpu.tools.precompile --system rocket --N 15
"""

from __future__ import annotations

import argparse
import time


def precompile(system: str = "rocket", N: int = 15, cache_dir: str | None = None):
    import jax

    if cache_dir:
        from robust_nonlinear_mpc_tpu.utils.platform import enable_compile_cache

        enable_compile_cache(cache_dir)

    import jax.numpy as jnp
    import numpy as np

    from robust_nonlinear_mpc_tpu.solvers.fast_sls import FastSLSPersist

    if system == "rocket":
        from robust_nonlinear_mpc_tpu.expe.main_rocket_robust_closed_loop import (
            make_rocket_problem,
        )

        m, solver = make_rocket_problem(N)
    elif system == "pendulum":
        from robust_nonlinear_mpc_tpu.models import Pendulum
        from robust_nonlinear_mpc_tpu.solvers.scp_sls import SCPSLSSolver

        m = Pendulum()
        m.E = 0.003 * np.eye(4)
        solver = SCPSLSSolver(
            N, np.eye(4), np.eye(1), m, 10 * np.eye(4),
            Q_reg=1e3 * np.eye(4), R_reg=1e3 * np.eye(1), Q_reg_f=1e4 * np.eye(4),
            rti=3, fast_sls_rti_steps=2,
        )
    elif system == "quadrotor":
        from robust_nonlinear_mpc_tpu.models import Quadrotor
        from robust_nonlinear_mpc_tpu.solvers.scp_sls import SCPSLSSolver

        m = Quadrotor()
        Q = np.diag([10.0] * 3 + [1.0] * 3 + [1.0] * 4 + [2.0] * 3)
        solver = SCPSLSSolver(
            N, Q, np.eye(4), m, 10 * Q,
            Q_reg=1e4 * np.eye(13), R_reg=1e4 * np.eye(4), Q_reg_f=1e4 * np.eye(13),
            rti=3, fast_sls_rti_steps=2,
        )
    else:
        raise ValueError(f"unknown system {system!r}")

    solver.opts = solver.opts._replace(verbose=False)
    dt = solver.dtype
    X = jnp.zeros((N + 1, m.nx), dt)
    U = jnp.zeros((N, m.nu), dt)
    x0 = jnp.zeros(m.nx, dt)
    persist = FastSLSPersist.init(N, m.nx, m.nu, m.ni, m.ni_f, m.nw, dt)

    t0 = time.perf_counter()
    lowered = jax.jit(solver._iteration).lower(X, U, x0, persist)
    compiled = lowered.compile()
    t1 = time.perf_counter()
    flops = compiled.cost_analysis() or {}
    print(
        f"precompiled {system} N={N} in {t1 - t0:.1f}s "
        f"(flops/iter ~ {flops.get('flops', float('nan')):.3g})"
    )
    return compiled


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--system", default="rocket",
                   choices=["rocket", "pendulum", "quadrotor"])
    p.add_argument("--N", type=int, default=15)
    p.add_argument("--cache-dir", default=None)
    args = p.parse_args()
    precompile(args.system, args.N, args.cache_dir)


if __name__ == "__main__":
    main()
