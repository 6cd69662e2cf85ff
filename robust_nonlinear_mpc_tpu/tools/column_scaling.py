"""Horizon (N) scaling of the column-sharded SLS path.

The reference's only horizon-scaling axis is the `--N` flag on its codegen
scripts (`/root/reference/solver/generate_osqp_rockETH.py:22-24`); its
column parallelism is numba `prange` threads (`fast_SLS_jit.py:66,113`).
This framework's analogue is `parallel/columns.py`: the N+1 independent SLS
columns sharded over a device mesh, with only the (N, ni) backoff / scalar
cost psums crossing ICI. Correctness is pinned by `tests/test_columns.py`
(solver-level N=60 equivalence on the 8-device mesh); THIS tool produces the
perf datapoints:

  * wall time of the fused tube iteration (eta -> backward Riccati ->
    streaming response -> backoffs) at N in {30, 60, 120}, on a 1-device
    mesh vs the full virtual mesh;
  * the per-device column-slab share (the structural memory/FLOP division —
    each device holds ceil((N+1)/n_dev) columns and never materializes a
    cross-device eta or Phi).

Caveat printed with the results: on a virtual CPU mesh all "devices" share
the host's physical cores, so virtual-mesh wall time measures collective
OVERHEAD, not speedup — the speedup claim is per-device work division
(columns/device), which this tool reports exactly. Absolute single-chip TPU
numbers for N-scaling come from `RNM_BENCH_N=... python bench.py`.

Usage: python -m robust_nonlinear_mpc_tpu.tools.column_scaling [--reps 20]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

from robust_nonlinear_mpc_tpu.utils.platform import setup


def _bench_one(N, mesh, reps):
    import jax
    import jax.numpy as jnp

    from robust_nonlinear_mpc_tpu.ops.sls_kernels import SLSRegs
    from robust_nonlinear_mpc_tpu.parallel.columns import sharded_tube_iteration

    rng = np.random.default_rng(0)
    nx, nu, nw, ni, ni_f = 4, 1, 4, 10, 8   # pendulum dims (ref config)
    A = jnp.asarray(np.eye(nx) + 0.02 * rng.standard_normal((N, nx, nx)))
    B = jnp.asarray(0.05 * rng.standard_normal((N, nx, nu)))
    E = jnp.asarray(np.tile(0.003 * np.eye(nx)[None], (N, 1, 1)))
    Gmat = jnp.asarray(np.vstack([np.eye(nx + nu), -np.eye(nx + nu)])[:ni])
    Gf = jnp.asarray(np.vstack([np.eye(nx), -np.eye(nx)])[:ni_f])
    mu = jnp.asarray(np.abs(rng.standard_normal((N, ni))))
    mu_f = jnp.asarray(np.abs(rng.standard_normal(ni_f)))
    beta0 = jnp.zeros((N, N, ni))
    beta_f0 = jnp.zeros((N + 1, ni_f))
    regs = SLSRegs(
        Q_reg=jnp.asarray(1e3 * np.eye(nx)), R_reg=jnp.asarray(1e3 * np.eye(nu)),
        Q_reg_f=jnp.asarray(1e4 * np.eye(nx)),
    )

    @jax.jit
    def run_jit(mu_, beta0_, beta_f0_):
        # jit once: sharded_tube_iteration builds its shard_map per call,
        # so an unjitted loop would re-trace every rep and time tracing,
        # not the kernels
        return sharded_tube_iteration(
            mesh, A, B, E, Gmat, Gf, mu_, mu_f, beta0_, beta_f0_, regs, 1e-10
        )

    jax.block_until_ready(run_jit(mu, beta0, beta_f0)[3])  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run_jit(mu, beta0, beta_f0)
    jax.block_until_ready(out[3])
    dt = (time.perf_counter() - t0) / reps * 1e3
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=20)
    p.add_argument("--horizons", type=int, nargs="+", default=[30, 60, 120])
    args = p.parse_args()
    setup("cpu", x64=True, host_devices=8)

    from robust_nonlinear_mpc_tpu.parallel.columns import column_mesh

    rows = []
    for N in args.horizons:
        t1 = _bench_one(N, column_mesh(1), args.reps)
        t8 = _bench_one(N, column_mesh(8), args.reps)
        rows.append({
            "N": N,
            "tube_iter_ms_1dev": round(t1, 3),
            "tube_iter_ms_8dev_virtual": round(t8, 3),
            "columns_per_device_1dev": N + 1,
            "columns_per_device_8dev": -(-(N + 1) // 8),
        })
        print(json.dumps(rows[-1]))
    print(json.dumps({
        "note": "virtual CPU mesh: all devices share the host cores, so the "
                "8dev wall time includes collective overhead WITHOUT real "
                "parallel hardware; the structural division is "
                "columns_per_device. TPU absolute N-scaling: RNM_BENCH_N.",
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
