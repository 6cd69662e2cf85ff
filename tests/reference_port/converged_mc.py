"""Oracle until-convergence Monte-Carlo over the framework's MC scenarios.

VERDICT r3 item 2: the converged-mode success-rate question. The framework's
f64 CPU converged MC (rocket 128x10, eps 1e-6 / scp 60 / sls 60) fails ~31%
of steps; the claim "same failure modes as the reference's own
until-convergence path" (/root/reference/solver/fast_SLS_jit.py:302-312)
needs a measured row: run the INDEPENDENT reference-port oracle — NumPy
transliteration with reference semantics (scp_sls.py/fast_sls.py here) —
over the SAME x0/W scenario set at matched budgets and compare per-step
success + failure taxonomy lane by lane.

The oracle is a plain-loop dense-IPM NumPy stack at ~100 s per converged
solve, so a full 128x10 sweep is ~36 h; this script runs a SUBSET of lanes
(framework-failed lanes + successful controls, chosen from the framework
artifact's per-lane masks) and records, per (lane, step):

  * success, SCP iterations, failure mode taxonomy —
    `qp_infeasible_forward` (the QP inside fast-SLS reported infeasible,
    reference fast_SLS_jit.py:302-312), `sls_maxiter` (inner tube loop
    exhausted, :298), `scp_unconverged` (outer delta criterion never met,
    SCP_SLS_jit.py:141-150),
  * the applied input, next-step nominal and tube column for containment.

Usage (from repo root):
  python -m tests.reference_port.converged_mc --artifact <framework npz> \
      --n-failed 8 --n-ok 4 [--steps 10] [--eps 1e-6] [--out artifacts/...]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

from .closed_loop import ROCKET_X0, make_rocket_oracle


def scenario_set(B=128, steps=10, seed=0, spread=0.05):
    """EXACTLY the expe/main_monte_carlo_validation.py draw order: one
    default_rng(seed) stream, (B, nx) standard normals for x0 then
    (B, steps, nw) uniforms for W."""
    rng = np.random.default_rng(seed)
    x0s = np.asarray(ROCKET_X0)[None] + spread * rng.standard_normal((B, 17))
    Ws = 2 * rng.random((B, steps, 17)) - 1
    return x0s, Ws


def run_lane(x0, W, steps, eps, max_scp, sls_max, verbose=True):
    m, solver = make_rocket_oracle(15)
    solver.rti = -1
    solver.epsilon_convergence = eps
    solver.MAX_ITER_SCP = max_scp
    fs = solver.fast_SLS_solver
    fs.set_rti_steps(None)
    fs.MAX_ITER = sls_max

    # instrument the two inner failure sites for the taxonomy
    events = []
    orig_forward = fs.forward_solve
    orig_step = fs._step

    def forward_wrap(xdev):
        ok = orig_forward(xdev)
        if not ok:
            events.append("qp_infeasible_forward")
        return ok

    def step_wrap(xdev):
        state = orig_step(xdev)
        if state is False and not events:
            events.append("qp_infeasible_forward")
        return state

    fs.forward_solve = forward_wrap
    fs._step = step_wrap

    x = np.asarray(x0, float).ravel()
    rec = {
        "success": np.zeros(steps, bool),
        "mode": ["" for _ in range(steps)],
        "scp_iters": np.zeros(steps, np.int32),
        "x": np.zeros((steps, 17)),
        "u0": np.zeros((steps, 4)),
        "nom_x1": np.full((steps, 17), np.nan),
        "bo_x1": np.full((steps, 17), np.nan),
        "t_solve_s": np.zeros(steps),
    }
    for t in range(steps):
        events.clear()
        if t > 0:
            solver.reset_warm_start()
        t0 = time.perf_counter()
        try:
            sol = solver.solve(x)
        except (ValueError, FloatingPointError, np.linalg.LinAlgError) as e:
            # the oracle's dense-IPM stack has no feasibility restoration:
            # on wrong-basin/diverged states the nominal NLP can go NaN and
            # scipy raises. Record it as a failure mode (the reference's
            # IPOPT would report restoration failure here) and abort the
            # lane — there is no input to apply.
            rec["mode"][t] = "numerical_blowup"
            rec["x"][t] = x
            print(f"    step {t}: numerical blowup in oracle solve "
                  f"({type(e).__name__}); lane aborted", flush=True)
            break
        rec["t_solve_s"][t] = time.perf_counter() - t0
        succ = bool(sol.get("success", False))
        rec["success"][t] = succ
        rec["scp_iters"][t] = int(sol.get("iterations", -1))
        if not succ:
            if "qp_infeasible_forward" in events:
                # distinguish QP-infeasible from inner-loop exhaustion: the
                # wrapped forward_solve saw an infeasible QP at the failing
                # fast-SLS call
                rec["mode"][t] = "qp_infeasible_forward"
            elif not bool(fs.current_iteration.get("success", True)):
                rec["mode"][t] = "sls_maxiter"
            else:
                rec["mode"][t] = "scp_unconverged"
        rec["x"][t] = x
        if "primal_u" not in sol:
            # nominal init failed hard — nothing to apply; mark and stop
            rec["mode"][t] = "nominal_init_failed"
            break
        u0 = np.asarray(sol["primal_u"][:, 0], float).ravel()
        rec["u0"][t] = u0
        if sol.get("primal_x") is not None:
            rec["nom_x1"][t] = np.asarray(sol["primal_x"])[:, 1]
        if succ and sol.get("backoff_x") is not None:
            rec["bo_x1"][t] = np.asarray(sol["backoff_x"])[1, :]
        x = np.asarray(m.ddyn(x, u0, m.dt), float).ravel() \
            + np.asarray(m.E, float) @ W[t]
        if verbose:
            print(
                f"    step {t}: success={succ} iters={rec['scp_iters'][t]} "
                f"mode={rec['mode'][t] or '-'} "
                f"({rec['t_solve_s'][t]:.0f}s)", flush=True,
            )
    return rec


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--artifact", required=True,
                   help="framework converged-MC npz with success_mask")
    p.add_argument("--n-failed", type=int, default=8)
    p.add_argument("--n-ok", type=int, default=4)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--eps", type=float, default=1e-6)
    p.add_argument("--max-iter-scp", type=int, default=60)
    p.add_argument("--sls-max-iter", type=int, default=60)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--lanes", type=str, default=None,
                   help="explicit comma-separated lane ids (overrides auto)")
    p.add_argument("--out", default="artifacts/oracle_converged_subset.npz")
    args = p.parse_args()

    d = np.load(args.artifact, allow_pickle=True)
    fw_succ = np.asarray(d["success_mask"], bool)       # (B, T)
    B = fw_succ.shape[0]
    x0s, Ws = scenario_set(B=B, steps=args.steps, seed=args.seed)

    if args.lanes:
        lanes = [int(s) for s in args.lanes.split(",")]
    else:
        lane_failed = ~fw_succ.all(axis=1)
        failed_ids = np.flatnonzero(lane_failed)
        ok_ids = np.flatnonzero(~lane_failed)
        # deterministic spread over the failed set
        pick_f = failed_ids[:: max(1, len(failed_ids) // max(args.n_failed, 1))][: args.n_failed]
        pick_o = ok_ids[:: max(1, len(ok_ids) // max(args.n_ok, 1))][: args.n_ok]
        lanes = [*map(int, pick_f), *map(int, pick_o)]
    print(f"oracle converged MC: lanes {lanes} (eps {args.eps}, "
          f"scp {args.max_iter_scp} x sls {args.sls_max_iter})", flush=True)

    out = {
        "lanes": np.asarray(lanes, np.int32),
        "eps": args.eps,
        "max_iter_scp": args.max_iter_scp,
        "sls_max_iter": args.sls_max_iter,
        "artifact": args.artifact,
    }
    for li, lane in enumerate(lanes):
        print(f"  lane {lane} (framework success "
              f"{fw_succ[lane].sum()}/{args.steps}):", flush=True)
        try:
            rec = run_lane(x0s[lane], Ws[lane], args.steps, args.eps,
                           args.max_iter_scp, args.sls_max_iter)
        except Exception as e:  # a lane must never kill the sweep
            print(f"  lane {lane}: ABORTED ({type(e).__name__}: {e})",
                  flush=True)
            continue
        for k, v in rec.items():
            out[f"lane{lane}_{k}"] = np.asarray(v) if k != "mode" else \
                np.asarray(v, dtype=object)
        agree = (rec["success"] == fw_succ[lane][: args.steps]).mean()
        print(f"  lane {lane}: oracle success {rec['success'].sum()}"
              f"/{args.steps}, framework {fw_succ[lane].sum()}"
              f"/{args.steps}, per-step agreement {agree:.2f}", flush=True)
        np.savez(args.out, **out)   # checkpoint after every lane
    print(f"saved {args.out}")
    summary = {
        "lanes": lanes,
        "oracle_success": [int(out[f"lane{l}_success"].sum()) for l in lanes],
        "framework_success": [int(fw_succ[l].sum()) for l in lanes],
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
