"""Batched per-stage timing of the warm MPC step (the bench workload).

The reference instruments its three hot stages per solve (t_jac_ms /
t_qp_ms / t_backward_ms, SCP_SLS_jit.py:268,339-341, qp_jit.py:392-395,
fast_SLS_jit.py:504-507). This tool is the batched-TPU analogue: it splits
the fused rocket RTI(1/1) iteration into its five pipeline stages, jits each
stage separately at the bench batch size, feeds each stage the previous
stage's real outputs, and reports per-stage wall time. Use it to decide
where optimization effort goes (e.g. whether the QP IPM's sequential
Riccati scans dominate).

Caveat: the fused end-to-end program overlaps/fuses work across stage
boundaries, so the stage sum normally exceeds the fused step time; the
*ratios* are the signal.

Run: python -m robust_nonlinear_mpc_tpu.tools.stage_profile
Env: RNM_BENCH_BATCH (256), RNM_BENCH_REPS (10), RNM_PROFILE_STAGES
     (comma list to restrict, e.g. "qp1,qp2" — each stage is a separate
     2-6 min remote compile on this environment).
"""

from __future__ import annotations

import json
import os
import time


def main():
    import jax

    from robust_nonlinear_mpc_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    from robust_nonlinear_mpc_tpu.utils.platform import env_int as _env_int

    from robust_nonlinear_mpc_tpu.expe.main_rocket_robust_closed_loop import (
        X0,
        make_rocket_problem,
    )
    from robust_nonlinear_mpc_tpu.ops.qp_ipm import IPMOptions, QPData, solve_qp
    # profile exactly the kernels the bench runs: blocked (block=2) on TPU,
    # folded on CPU, RNM_SLS_BLOCK overriding — the same policy as bench.py
    from robust_nonlinear_mpc_tpu.ops.sls_kernels import evaluate_dual_eta
    from robust_nonlinear_mpc_tpu.solvers.fast_sls import select_sls_kernels
    from robust_nonlinear_mpc_tpu.utils.numerics import set_tube_precision

    on_cpu = jax.devices()[0].platform == "cpu"
    backward_solve, response_streaming = select_sls_kernels(
        int(os.environ.get("RNM_SLS_BLOCK", "0" if on_cpu else "2"))
    )

    dtype = jnp.zeros(0).dtype
    m, solver = make_rocket_problem(N=15)
    kkt = os.environ.get("RNM_BENCH_KKT", "riccati" if on_cpu else "pallas")
    if dtype == jnp.float32:
        set_tube_precision("default")
        ipm_first = IPMOptions(max_iter=8, tol=1e-3, kkt=kkt)
        ipm_main = IPMOptions(max_iter=_env_int("RNM_BENCH_QP_ITERS", 15), tol=3e-5, kkt=kkt)
    else:
        ipm_first = ipm_main = solver.opts.ipm._replace(kkt=kkt)

    N = solver.N
    B = _env_int("RNM_BENCH_BATCH", 256)
    n_rep = _env_int("RNM_BENCH_REPS", 10)
    only = os.environ.get("RNM_PROFILE_STAGES", "")
    only = {s.strip() for s in only.split(",") if s.strip()}

    prob = solver.prob
    stat = prob.stat
    regs = prob.regs
    Gmat = jnp.concatenate([stat.Gx, stat.Gu], axis=1)
    eps = solver.opts.epsilon_backoff

    rng = np.random.default_rng(0)
    x0 = np.array(X0)
    x0s = jnp.asarray(x0[None] + 0.02 * rng.standard_normal((B, m.nx)), dtype)
    Xs = jnp.asarray(
        np.linspace(x0, np.zeros(m.nx), N + 1)[None]
        + 0.01 * rng.standard_normal((B, N + 1, m.nx)),
        dtype,
    )
    Us = jnp.asarray(0.01 * rng.standard_normal((B, N, m.nu)), dtype)

    # ---- stage definitions (single-instance; vmapped below) ----
    # assembly shared with SCPSLSSolver._iteration / solve_profiled, so the
    # profiler measures exactly the program the solver runs
    def stage_jac(X, U, x0_i):
        return solver.assemble_deviation_problem(X, U, x0_i)

    def stage_qp1(A, Bm, c, qx, qu, g_res, gf_res, xdev):
        data = QPData(A=A, B=Bm, c=c, qx=qx, qu=qu, h=g_res, hf=gf_res, xinit=xdev)
        sol = solve_qp(stat, data, ipm_first)
        return sol.lam, sol.lam_f, sol.iters

    def stage_bwd(lam, lam_f, A, Bm):
        beta0 = jnp.full((N, N, m.ni), eps, dtype)
        beta_f0 = jnp.full((N + 1, m.ni_f), eps, dtype)
        eta, eta_f = evaluate_dual_eta(lam, lam_f, beta0, beta_f0, eps)
        _, K = backward_solve(A, Bm, Gmat, stat.Gf, eta, eta_f, regs)
        return K

    def stage_resp(A, Bm, K):
        beta, beta_f, backoff, backoff_f, ct = response_streaming(
            A, Bm, prob.E, K, stat.Gx, stat.Gu, stat.Gf, regs, eps
        )
        return backoff, backoff_f

    def stage_qp2(A, Bm, c, qx, qu, g_res, gf_res, xdev, backoff, backoff_f):
        data = QPData(
            A=A, B=Bm, c=c, qx=qx, qu=qu,
            h=g_res - backoff, hf=gf_res - backoff_f, xinit=xdev,
        )
        sol = solve_qp(stat, data, ipm_main)
        return sol.X, sol.U, sol.iters, sol.success

    stages = {
        "jac": (stage_jac, lambda _: (Xs, Us, x0s)),
        "qp1": (stage_qp1, lambda o: tuple(o["jac"][:8])),
        "bwd": (stage_bwd, lambda o: (o["qp1"][0], o["qp1"][1], o["jac"][0], o["jac"][1])),
        "resp": (stage_resp, lambda o: (o["jac"][0], o["jac"][1], o["bwd"])),
        "qp2": (
            stage_qp2,
            lambda o: tuple(o["jac"][:8]) + (o["resp"][0], o["resp"][1]),
        ),
    }

    outs = {}
    times = {}
    iters = {}
    cost = {}
    for name, (fn, get_args) in stages.items():
        jfn = jax.jit(jax.vmap(fn))
        args = get_args(outs)
        # AOT compile so XLA's cost model is queryable: per-stage HBM bytes
        # and flops attribution (VERDICT r4 item 4 — where the 18 MB/solve
        # goes). Same program, same cache.
        try:
            comp = jfn.lower(*args).compile()
            ca = comp.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0] if ca else {}
            fl = float(ca.get("flops", 0.0))
            by = float(ca.get("bytes accessed", 0.0))
            if by > 0:
                cost[name] = {
                    "mb_per_solve": round(by / B / 1e6, 3),
                    "mflops_per_solve": round(fl / B / 1e6, 3),
                    "ai": round(fl / by, 2),
                }
            jfn = comp
        except Exception:
            pass
        out = jfn(*args)  # compile + run
        jax.block_until_ready(out)
        if name in only or not only:
            t0 = time.perf_counter()
            for _ in range(n_rep):
                out = jfn(*args)
            jax.block_until_ready(out)
            times[name] = (time.perf_counter() - t0) / n_rep * 1e3
        outs[name] = out
        if name == "qp1":
            iters["qp1_iters_mean"] = round(float(jnp.mean(out[2])), 2)
        if name == "qp2":
            iters["qp2_iters_mean"] = round(float(jnp.mean(out[2])), 2)
            iters["qp2_success"] = round(float(jnp.mean(out[3].astype(jnp.float32))), 4)

    total = sum(times.values())
    result = {
        "metric": "rocket_mpc_stage_profile",
        "batch": B,
        "reps": n_rep,
        "device": str(jax.devices()[0]),
        "stage_ms": {k: round(v, 3) for k, v in times.items()},
        "stage_frac": {k: round(v / total, 3) for k, v in times.items()} if total else {},
        "stage_sum_ms": round(total, 3),
        # per-stage HBM-traffic attribution (XLA cost model; the bench's
        # recycle mode runs {jac, bwd, resp, qp2} — qp1 only exists in the
        # reference-shaped two-QP iteration)
        "stage_cost": cost,
        **iters,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
