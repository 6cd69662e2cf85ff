"""QP-level A/B: pallas vs riccati Newton path as the horizon grows.

The N=60 ablation (tools/n60_probe.py) attributes the bench's N=60
mid-flight failures to kkt="pallas": full throughput stack at N=60 runs at
per-step success 0.6337 with pallas and 0.9998 with riccati (everything
else identical). This probe isolates the effect at the single-QP level:
identical realistic QPData (rocket deviation problems from real SQP
nominals) solved by both Newton paths at N in {15, 30, 60}, comparing IPM
iterations, exit KKT residual, success, and the primal gap between paths.

Usage:
  python -m robust_nonlinear_mpc_tpu.tools.pallas_n60_qp_probe --run \
      [--lanes 8] [--Ns 15,30,60] [--qp-iters 15]
"""

from __future__ import annotations

import argparse
import json

from robust_nonlinear_mpc_tpu.utils.platform import setup


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--run", action="store_true")
    p.add_argument("--lanes", type=int, default=8)
    p.add_argument("--Ns", default="15,30,60")
    p.add_argument("--qp-iters", type=int, default=15)
    p.add_argument("--out", default="artifacts/pallas_n60_qp_probe.json")
    args = p.parse_args()
    if not args.run:
        p.print_help()
        return

    setup(None, x64=False)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from robust_nonlinear_mpc_tpu.expe.main_rocket_robust_closed_loop import (
        X0,
        make_rocket_problem,
    )
    from robust_nonlinear_mpc_tpu.ops.qp_ipm import IPMOptions, QPData, solve_qp
    from robust_nonlinear_mpc_tpu.solvers.sqp import SQPOptions, sqp_solve

    B = args.lanes
    results = {}
    for N in [int(s) for s in args.Ns.split(",")]:
        m, solver = make_rocket_problem(N)
        solver.opts = solver.opts._replace(
            verbose=False,
            sqp=SQPOptions(ipm=IPMOptions(max_iter=15, tol=3e-5),
                           tol_step=1e-4, tol_feas=1e-4, max_iter=25),
        )
        rng = np.random.default_rng(0)
        x0s = jnp.asarray(
            np.asarray(X0)[None] + 0.02 * rng.standard_normal((B, m.nx)),
            solver.dtype,
        )
        nom = jax.jit(jax.vmap(
            lambda x: sqp_solve(m, N, solver.Q, solver.R, solver.Qf, x,
                                opts=solver.opts.sqp)
        ))(x0s)
        asm = jax.jit(jax.vmap(solver.assemble_deviation_problem))
        A, Bm, c, qx, qu, g_res, gf_res, xi = asm(nom.X, nom.U, x0s)

        row = {}
        sols = {}
        for kkt in ("riccati", "pallas"):
            opts = IPMOptions(max_iter=args.qp_iters, tol=3e-5, kkt=kkt)

            def one(a, b, cc, qxx, quu, h, hf, xin):
                return solve_qp(
                    solver.prob.stat,
                    QPData(A=a, B=b, c=cc, qx=qxx, qu=quu, h=h, hf=hf,
                           xinit=xin),
                    opts,
                )

            sol = jax.jit(jax.vmap(one))(A, Bm, c, qx, qu, g_res, gf_res, xi)
            jax.block_until_ready(sol.X)
            sols[kkt] = sol
            row[kkt] = {
                "iters": np.asarray(sol.iters).tolist(),
                "kkt_res": [float(v) for v in np.asarray(sol.kkt_res)],
                "success": np.asarray(sol.success).astype(int).tolist(),
                "worst_kkt": float(np.max(np.asarray(sol.kkt_res))),
                "n_success": int(np.asarray(sol.success).sum()),
            }
        du = np.max(np.abs(np.asarray(sols["pallas"].U)
                           - np.asarray(sols["riccati"].U)))
        row["max_U_gap"] = float(du)
        results[f"N{N}"] = row
        print(f"[qp_probe] N={N}: riccati success "
              f"{row['riccati']['n_success']}/{B} worst_kkt "
              f"{row['riccati']['worst_kkt']:.2e} iters {row['riccati']['iters']}; "
              f"pallas success {row['pallas']['n_success']}/{B} worst_kkt "
              f"{row['pallas']['worst_kkt']:.2e} iters {row['pallas']['iters']}; "
              f"max|dU| {du:.2e}", flush=True)

    import os
    os.makedirs("artifacts", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
