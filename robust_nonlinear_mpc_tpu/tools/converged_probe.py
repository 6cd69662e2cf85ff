"""Per-lane failure attribution for the converged-mode TPU MC (VERDICT r3
item 2, framework side).

The 128x10 converged artifact reports the coarse taxonomy (63 inner-solve /
91 budget-exhausted failed steps at eps 1e-3, scp cap 20); this probe
produces the fine-grained attribution the verdict asked for — which stage,
which constraint, how-far-from-converged — by replaying chosen lanes
through a host loop that mirrors `sim.closed_loop.build_chunked_converged_loop`
iteration-for-iteration (same accept logic `ok = res.success & finite`, same
warm shift / persist reinit between steps, reference semantics
/root/reference/solver/SCP_SLS_jit.py:20-29):

  * per SCP iteration: delta = |primal update|_inf, sls success, qp_kkt,
    qp iterations — so a budget-exhausted step records its terminal delta
    (how far from eps it stalled) and its contraction rate,
  * on an inner-solve failure: the capacity analysis of the LAST ACCEPTED
    iterate (g - G z_nom_k - backoff_k per stage/row, named rows) — if
    min <= 0 the tightened QP had no feasible nominal left (structural
    tube-vs-bound exhaustion, the reference's infeasible-forward event,
    fast_SLS_jit.py:302-312), else the failure is numerical,
  * replay fidelity: the per-step success pattern is compared against the
    artifact's success_mask lane-by-lane.

Usage:
  python -m robust_nonlinear_mpc_tpu.tools.converged_probe --run \
      [--artifact artifacts/mc_validation_rocket_converged_tpu_f32_128_r4.npz] \
      [--lanes 0,19,37,50,70,83,95,104] [--out artifacts/converged_failure_probe.npz]
"""

from __future__ import annotations

import argparse
import json

from robust_nonlinear_mpc_tpu.utils.platform import setup


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--run", action="store_true")
    p.add_argument("--artifact",
                   default="artifacts/mc_validation_rocket_converged_tpu_f32_128_r4.npz")
    p.add_argument("--lanes", default=None,
                   help="comma-separated lane ids; default = auto pick "
                        "(inner-failure lanes + budget-exhausted lanes)")
    p.add_argument("--n-auto", type=int, default=10)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="artifacts/converged_failure_probe.npz")
    args = p.parse_args()
    if not args.run:
        p.print_help()
        return

    setup(None, x64=False)   # TPU f32 — same backend as the artifact
    import jax
    import jax.numpy as jnp
    import numpy as np

    from robust_nonlinear_mpc_tpu.expe.main_rocket_robust_closed_loop import (
        X0,
        make_rocket_problem,
    )
    from robust_nonlinear_mpc_tpu.solvers.fast_sls import FastSLSPersist
    from robust_nonlinear_mpc_tpu.solvers.sqp import sqp_solve

    d = np.load(args.artifact, allow_pickle=True)
    fw_succ = np.asarray(d["success_mask"], bool)
    fw_scpf = np.asarray(d["scp_failed_mask"], bool)
    B, T = fw_succ.shape
    steps = min(args.steps, T)

    m, solver = make_rocket_problem(15)
    solver.opts = solver.opts._replace(verbose=False)
    # converged-mode config identical to expe/main_monte_carlo_validation.py
    from robust_nonlinear_mpc_tpu.ops.qp_ipm import IPMOptions
    from robust_nonlinear_mpc_tpu.solvers.sqp import SQPOptions
    solver.opts = solver.opts._replace(
        rti=-1, fast_sls_rti_steps=0, epsilon_convergence=1e-3,
        max_iter_scp=20, sls_max_iter=60,
        ipm=IPMOptions(max_iter=15, tol=3e-5, kkt="riccati"),
        sqp=SQPOptions(ipm=IPMOptions(max_iter=15, tol=3e-5),
                       tol_step=1e-4, tol_feas=1e-4, max_iter=25),
    )
    eps = solver.opts.epsilon_convergence
    max_scp = int(solver.opts.max_iter_scp)

    # exact expe draw order (one default_rng(seed) stream)
    rng = np.random.default_rng(args.seed)
    x0s = np.asarray(X0)[None] + 0.05 * rng.standard_normal((B, m.nx))
    Ws = 2 * rng.random((B, T, m.nw)) - 1

    if args.lanes:
        lanes = [int(s) for s in args.lanes.split(",")]
    else:
        lane_failed = ~fw_succ.all(axis=1)
        inner_lanes = np.flatnonzero((fw_scpf & ~fw_succ).any(axis=1))
        budget_lanes = np.flatnonzero(
            lane_failed & ~np.isin(np.arange(B), inner_lanes)
        )
        k = args.n_auto // 2
        lanes = [*map(int, inner_lanes[:k]), *map(int, budget_lanes[:k])]
    print(f"[converged_probe] replaying lanes {lanes} "
          f"(eps {eps}, scp cap {max_scp})", flush=True)

    G = np.asarray(m.G, float)
    g = np.asarray(m.g, float).reshape(-1)
    names = list(getattr(m, "constraint_names", range(m.ni)))
    N = solver.N

    iter_j = jax.jit(solver._iteration)
    shift_j = jax.jit(solver._warm_shift)

    def fresh_persist(keep_prev=None, have_prev=None):
        pz = FastSLSPersist.init(
            N, m.nx, m.nu, m.ni, m.ni_f, m.nw, solver.dtype, store_phi=True,
        )
        if keep_prev is not None:
            pz = FastSLSPersist.init(
                N, m.nx, m.nu, m.ni, m.ni_f, m.nw, solver.dtype,
                keep_prev=keep_prev, store_phi=True,
            )._replace(have_prev=have_prev)
        return pz

    records = []
    for lane in lanes:
        x = jnp.asarray(x0s[lane], solver.dtype)
        nominal = sqp_solve(m, N, solver.Q, solver.R, solver.Qf, x,
                            opts=solver.opts.sqp)
        X, U = nominal.X, nominal.U
        persist = fresh_persist()
        rec = {"lane": int(lane), "steps": []}
        for t in range(steps):
            deltas, kkts, qpis = [], [], []
            last_ok = None            # last ACCEPTED iterate (X, U, backoff)
            failed = False
            done = False
            it = 0
            while (not done) and (not failed) and it < max_scp:
                res = iter_j(X, U, x, persist)
                finite = bool(jnp.all(jnp.isfinite(res.X))
                              & jnp.all(jnp.isfinite(res.U)))
                ok = bool(res.success) and finite
                delta = float(jnp.max(jnp.abs(res.delta_vec)))
                deltas.append(delta)
                kkts.append(float(res.sls.qp_kkt))
                qpis.append(int(res.sls.qp_iters))
                if ok:
                    X, U, persist = res.X, res.U, res.persist
                    last_ok = (np.asarray(res.X), np.asarray(res.U),
                               np.asarray(res.sls.backoff),
                               np.asarray(res.sls.backoff_f))
                    done = delta < eps
                else:
                    failed = True
                it += 1
            step_rec = {
                "t": t, "iters": it, "success": bool(done),
                "mode": ("inner_failure" if failed else
                         ("converged" if done else "budget_exhausted")),
                "deltas": [round(v, 6) for v in deltas],
                "final_delta": deltas[-1] if deltas else float("nan"),
                "qp_kkt_at_end": kkts[-1] if kkts else float("nan"),
                "artifact_success": bool(fw_succ[lane, t]),
                "artifact_scp_failed": bool(fw_scpf[lane, t]),
            }
            # contraction rate over the last 5 accepted iterations
            if len(deltas) >= 3:
                ds = np.asarray(deltas[-6:-1] if failed else deltas[-5:])
                ds = ds[ds > 0]
                if len(ds) >= 2:
                    step_rec["contraction"] = float(
                        np.exp(np.mean(np.diff(np.log(ds))))
                    )
            if (failed or not done) and last_ok is not None:
                Xa, Ua, bo, bo_f = last_ok
                cap = np.empty((N, m.ni))
                for k in range(N):
                    z = np.concatenate([Xa[k], Ua[k]])
                    cap[k] = g - G @ z - bo[k]
                kk, rr = np.unravel_index(np.argmin(cap), cap.shape)
                step_rec.update(
                    min_capacity=float(cap.min()),
                    min_capacity_stage=int(kk),
                    min_capacity_row=str(names[rr]),
                    n_rows_exhausted=int((cap <= 0).sum()),
                    min_capacity_untightened=float((cap + bo).min()),
                )
            rec["steps"].append(step_rec)
            marker = {"converged": ".", "budget_exhausted": "B",
                      "inner_failure": "F"}[step_rec["mode"]]
            agree = step_rec["success"] == step_rec["artifact_success"]
            print(f"  lane {lane} t={t}: {step_rec['mode']:>16} "
                  f"it={it:2d} delta={step_rec['final_delta']:.2e}"
                  + (f" cap={step_rec.get('min_capacity', float('nan')):+.4f}"
                     f"@{step_rec.get('min_capacity_row', '')}"
                     if "min_capacity" in step_rec else "")
                  + ("" if agree else "  [MASK MISMATCH vs artifact]"),
                  flush=True)
            # advance (mirrors build_chunked_converged_loop.advance)
            u0 = U[0]
            x = m.ddyn(x, u0) + jnp.asarray(m.E, solver.dtype) @ jnp.asarray(
                Ws[lane, t], solver.dtype)
            X, U = shift_j(X, U)
            persist = fresh_persist(keep_prev=persist.prev_primal,
                                    have_prev=persist.have_prev)
        records.append(rec)

    # summary
    modes = {}
    agree = total = 0
    for rec in records:
        for s in rec["steps"]:
            modes[s["mode"]] = modes.get(s["mode"], 0) + 1
            agree += s["success"] == s["artifact_success"]
            total += 1
    print(f"[converged_probe] step modes over replayed lanes: {modes}; "
          f"replay/artifact success agreement {agree}/{total}", flush=True)
    import os
    os.makedirs("artifacts", exist_ok=True)
    np.savez(args.out, records=json.dumps(records),
             lanes=np.asarray(lanes, np.int32),
             eps=eps, max_scp=max_scp, artifact=args.artifact)
    print(f"[converged_probe] saved {args.out}")


if __name__ == "__main__":
    main()
