"""Single-instance latency decomposition: device compute vs dispatch.

The BASELINE.json north star is p99 per-step latency vs the 50 ms real-time
budget. Round-1 measured p50 ~31-35 ms at B=1 and attributed it to dispatch,
not FLOPs (kernel choice was irrelevant at B=1). This probe separates the two
contributions by timing ONE dispatch that runs K closed-loop MPC steps as a
`lax.scan` (K = 1, 2, 4, 8; each K is its own compiled program):

    wall(K) ~= dispatch_overhead + K * device_step_time

The slope is the true on-device per-step latency (what a locally-attached
controller would pay per step after the first); the intercept is the host ->
device dispatch cost, which through this container's remote-TPU tunnel
includes a network RTT that a production deployment would not have.

Also reports the rolling p50/p99/max over `--steps` single-step dispatches
(the deployed-controller distribution, same as bench.py RNM_BENCH_LATENCY=1).

Usage: python -m robust_nonlinear_mpc_tpu.tools.latency_probe [--steps 200]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

from robust_nonlinear_mpc_tpu.utils.platform import setup


def main(n_steps: int = 200, ks=(1, 2, 4, 8)):
    setup(None, x64=False)
    import jax
    import jax.numpy as jnp

    from robust_nonlinear_mpc_tpu.expe.main_rocket_robust_closed_loop import (
        X0,
        make_rocket_problem,
    )
    from robust_nonlinear_mpc_tpu.sim.closed_loop import make_mpc_step
    from robust_nonlinear_mpc_tpu.solvers.fast_sls import FastSLSPersist
    from robust_nonlinear_mpc_tpu.solvers.sqp import sqp_solve
    from robust_nonlinear_mpc_tpu.tools.dtype_deviation import (
        _configure_throughput,
    )

    m, solver = make_rocket_problem(15)
    solver.opts = solver.opts._replace(verbose=False)
    if solver.dtype == jnp.float32:
        _configure_throughput(solver)

    mpc_step = make_mpc_step(solver)
    nominal = sqp_solve(
        m, solver.N, solver.Q, solver.R, solver.Qf,
        jnp.asarray(np.asarray(X0), solver.dtype), opts=solver.opts.sqp,
    )
    persist0 = FastSLSPersist.init(
        solver.N, m.nx, m.nu, m.ni, m.ni_f, m.nw, solver.dtype,
        store_phi=not solver._fast_sls_opts().streaming_response,
    )
    carry0 = (nominal.X, nominal.U, persist0,
              jnp.asarray(np.asarray(X0), solver.dtype))
    rng = np.random.default_rng(7)

    # --- K-step fused programs: wall(K) = intercept + K * slope -----------
    def k_step(K):
        def body(carry, w):
            carry, out = mpc_step(carry, w)
            return carry, out[6]
        def run(carry, W):
            return jax.lax.scan(body, carry, W)
        return jax.jit(run)

    rows = []
    carry = carry0
    for K in ks:
        f = k_step(K)
        W = jnp.asarray(2 * rng.random((K, m.nw)) - 1, solver.dtype)
        c, _ = f(carry, W)  # compile + warm
        jax.block_until_ready(c[0])
        reps = 30
        samples = []
        for _ in range(reps):
            W = jnp.asarray(2 * rng.random((K, m.nw)) - 1, solver.dtype)
            t0 = time.perf_counter()
            c, ok = f(carry, W)
            jax.block_until_ready(c[0])
            samples.append(time.perf_counter() - t0)
            carry = c
        rows.append((K, 1e3 * float(np.median(samples))))
        print(f"[latency] K={K:2d}: wall p50 = {rows[-1][1]:.2f} ms "
              f"({rows[-1][1] / K:.2f} ms/step amortized)")

    Ks = np.array([r[0] for r in rows], float)
    walls = np.array([r[1] for r in rows], float)
    slope, intercept = np.polyfit(Ks, walls, 1)

    # --- single-step dispatch distribution (deployed-controller view) -----
    single = jax.jit(lambda c, w: mpc_step(c, w))
    c, _ = single(carry0, jnp.asarray(2 * rng.random(m.nw) - 1, solver.dtype))
    jax.block_until_ready(c[0])
    carry = c
    lats = []
    for _ in range(n_steps):
        w = jnp.asarray(2 * rng.random(m.nw) - 1, solver.dtype)
        t0 = time.perf_counter()
        c, _ = single(carry, w)
        jax.block_until_ready(c[0])
        lats.append(time.perf_counter() - t0)
        carry = c
    lats = 1e3 * np.asarray(lats)

    out = {
        "device_step_time_ms": round(float(slope), 3),
        "dispatch_overhead_ms": round(float(intercept), 3),
        "fit_points": {int(k): round(float(w), 3) for k, w in rows},
        "single_step_p50_ms": round(float(np.median(lats)), 3),
        "single_step_p99_ms": round(float(np.percentile(lats, 99)), 3),
        "single_step_max_ms": round(float(lats.max()), 3),
        "n_single_steps": n_steps,
        "realtime_budget_ms": 50.0,
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=200)
    args = p.parse_args()
    main(args.steps)
