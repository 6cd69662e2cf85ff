"""Multi-system throughput sweep: warm MPC steps/s for every reference model.

bench.py pins the headline metric (rocket, the reference's true-RTI config);
this sweep measures the other systems at THEIR reference configurations
(pendulum/quadrotor run rti=3 outer SCP iterations with
fast_sls_rti_steps=2 — expe/main_*_robust_closed_loop.py), so one "step"
here is a full warm MPC step including all outer iterations.

Run: python -m robust_nonlinear_mpc_tpu.tools.bench_sweep [systems...]
Env: RNM_BENCH_BATCH (256), RNM_BENCH_REPS (10), RNM_BENCH_RECYCLE (1),
     RNM_BENCH_STREAMING (1).
Prints one JSON line per system.
"""

from __future__ import annotations

import json
import sys
import time


def bench_system(system: str, B: int, n_rep: int, recycle: bool, streaming: bool):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from robust_nonlinear_mpc_tpu.ops.qp_ipm import IPMOptions
    from robust_nonlinear_mpc_tpu.solvers.fast_sls import FastSLSPersist
    from robust_nonlinear_mpc_tpu.solvers.scp_sls import SCPSLSSolver
    from robust_nonlinear_mpc_tpu.utils.numerics import set_tube_precision

    dtype = jnp.zeros(0).dtype
    N = 15
    if system == "rocket":
        from robust_nonlinear_mpc_tpu.expe.main_rocket_robust_closed_loop import (
            X0,
            make_rocket_problem,
        )

        m, solver = make_rocket_problem(N=N)
        x_center = np.array(X0)
        hover = np.zeros(m.nx)
    elif system == "quadrotor":
        from robust_nonlinear_mpc_tpu.models import Quadrotor

        m = Quadrotor()
        Q = np.diag([10.0] * 3 + [1.0] * 3 + [1.0] * 4 + [2.0] * 3)
        m.E = m.dt * 5 * np.diag([0.1] * 3 + [0.15] * 3 + [0.02] * 4 + [0.2] * 3)
        solver = SCPSLSSolver(
            N, Q, np.eye(4), m, 10 * Q,
            Q_reg=1e4 * np.eye(13), R_reg=1e4 * np.eye(4), Q_reg_f=1e4 * np.eye(13),
            rti=3, fast_sls_rti_steps=2,
        )
        x_center = np.concatenate([np.full(3, 2.0), np.zeros(3), [1, 0, 0, 0], np.zeros(3)])
        hover = np.concatenate([np.zeros(6), [1, 0, 0, 0], np.zeros(3)])
    elif system == "pendulum":
        from robust_nonlinear_mpc_tpu.models import Pendulum

        m = Pendulum()
        m.E = 0.003 * np.eye(4)
        solver = SCPSLSSolver(
            N, np.eye(4), np.eye(1), m, 10 * np.eye(4),
            Q_reg=1e3 * np.eye(4), R_reg=1e3 * np.eye(1), Q_reg_f=1e4 * np.eye(4),
            rti=3, fast_sls_rti_steps=2,
        )
        x_center = np.array([0.5, 0.5, 0.0, 0.0])
        hover = np.zeros(4)
    else:
        raise ValueError(system)

    solver.opts = solver.opts._replace(verbose=False)
    import os

    on_cpu = jax.devices()[0].platform == "cpu"
    # same Newton-solver policy as bench.py: fused Pallas kernels on TPU
    # (ops/pallas_qp.py), XLA riccati scans on CPU; RNM_BENCH_KKT overrides
    kkt = os.environ.get("RNM_BENCH_KKT", "riccati" if on_cpu else "pallas")
    solver.opts = solver.opts._replace(
        ipm=solver.opts.ipm._replace(kkt=kkt)
    )
    if dtype == jnp.float32:
        solver.opts = solver.opts._replace(
            ipm=IPMOptions(max_iter=15, tol=3e-5, kkt=kkt),
            ipm_first=IPMOptions(max_iter=8, tol=1e-3, kkt=kkt),
        )
        set_tube_precision("default")
    solver.opts = solver.opts._replace(
        streaming_response=streaming, recycle_eta=recycle,
        # same kernel policy as bench.py: column-blocked on TPU, folded on
        # CPU (XLA:CPU compile blowup), RNM_SLS_BLOCK overriding
        sls_block=int(os.environ.get("RNM_SLS_BLOCK", "0" if on_cpu else "2")),
    )

    # same honest workload as bench.py: one "step" = one TRUE closed-loop
    # MPC step (sim.closed_loop.make_mpc_step: all outer SCP iterations +
    # plant propagation under w~U[-1,1] + warm shift), lanes SQP-seeded,
    # untimed warm-in so the timed window is the regulation steady state.
    from robust_nonlinear_mpc_tpu.sim.closed_loop import make_mpc_step
    from robust_nonlinear_mpc_tpu.solvers.sqp import sqp_solve

    rti = max(int(solver.opts.rti), 1)
    n_warm = int(os.environ.get("RNM_BENCH_WARMUP", "30"))
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(x_center[None] + 0.02 * rng.standard_normal((B, m.nx)), dtype)
    nominal = jax.jit(
        jax.vmap(
            lambda x: sqp_solve(
                m, N, solver.Q, solver.R, solver.Qf, x, opts=solver.opts.sqp
            )
        )
    )(x0s)
    Xs, Us = nominal.X, nominal.U
    persist = FastSLSPersist.init(
        N, m.nx, m.nu, m.ni, m.ni_f, m.nw, dtype, store_phi=not streaming
    )
    persists = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (B,) + a.shape), persist
    )

    step = jax.jit(jax.vmap(make_mpc_step(solver)))
    w_seq = jnp.asarray(
        rng.uniform(-1.0, 1.0, (max(1, n_warm) + n_rep, B, m.nw)), dtype
    )
    carry = (Xs, Us, persists, x0s)
    for i in range(max(1, n_warm)):
        carry, (_, _, _, _, _, _, ok, *_rest) = step(carry, w_seq[i])
    jax.block_until_ready(carry[0])

    t0 = time.perf_counter()
    for i in range(n_rep):
        carry, (_, _, _, _, _, _, ok, *_rest) = step(carry, w_seq[max(1, n_warm) + i])
    jax.block_until_ready(carry[0])
    dt_s = time.perf_counter() - t0

    return {
        "metric": f"{system}_sls_mpc_steps_per_s",
        "value": round(B * n_rep / dt_s, 2),
        "unit": "closed-loop MPC steps/s",
        "rti": rti,
        "fast_sls_rti_steps": int(solver.opts.fast_sls_rti_steps),
        "batch": B,
        "reps": n_rep,
        "warmup_reps": n_warm,
        "device": str(jax.devices()[0]),
        "dtype": str(dtype),
        "success_fraction": round(float(jnp.mean(ok.astype(jnp.float32))), 4),
        "finite": bool(
            jnp.all(jnp.isfinite(carry[0])) and jnp.all(jnp.isfinite(carry[3]))
        ),
    }


def main():
    import jax

    from robust_nonlinear_mpc_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()

    from robust_nonlinear_mpc_tpu.utils.platform import env_int

    systems = sys.argv[1:] or ["pendulum", "quadrotor", "rocket"]
    B = env_int("RNM_BENCH_BATCH", 256)
    n_rep = env_int("RNM_BENCH_REPS", 10)
    recycle = bool(env_int("RNM_BENCH_RECYCLE", 1))
    streaming = bool(env_int("RNM_BENCH_STREAMING", 1))
    for system in systems:
        print(json.dumps(bench_system(system, B, n_rep, recycle, streaming)))


if __name__ == "__main__":
    main()
