"""N=60 mid-flight failure fingerprint (VERDICT r3 item 6).

The bench's N=60 rocket row runs at success ~0.76-0.84 with deterministic
mid-flight hard lanes that are budget-independent (BASELINE.md N-scaling
A/Bs). This probe produces the per-lane diagnosis that row lacked:

Stage 1 (batched): the bench-protocol closed loop (B lanes, perturbed X0,
w ~ U[-1,1]) via build_batched_closed_loop with the new scp_failed/qp_iters
telemetry -> per-lane first-failure step, failure streak structure, and the
realized-state constraint margins at failure.

Stage 2 (replay): the worst lanes re-run teacher-forced through the host
driver (SCPSLSSolver.solve on the lane's own visited states) up to the
failure step, capturing the full solution at and before failure: row-wise
backoffs vs constraint slack (tube-vs-bound capacity per stage, named
constraint rows), QP KKT residual/iterations, SLS failure stage. The
capacity number answers "genuinely infeasible at N=60 tube widths?": if
min_k (g - G z_nom_k - backoff_k) <= 0, the tightened QP had no feasible
nominal left and the failure is structural, not numerical.

Usage:
  python -m robust_nonlinear_mpc_tpu.tools.n60_probe --run \
      [--N 60] [--lanes 128] [--steps 45] [--replay 4] [--device tpu]
"""

from __future__ import annotations

import argparse
import json

from robust_nonlinear_mpc_tpu.utils.platform import setup


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--run", action="store_true")
    p.add_argument("--N", type=int, default=60)
    p.add_argument("--lanes", type=int, default=128)
    p.add_argument("--steps", type=int, default=45)
    p.add_argument("--replay", type=int, default=4,
                   help="number of failing lanes to replay through the host driver")
    p.add_argument("--device", default="tpu", choices=["tpu", "cpu"])
    p.add_argument("--qp-iters", type=int, default=15)
    # bench-stack feature toggles (default OFF = the plain riccati config):
    # the plain config measures success 0.9995 at N=60 while the full bench
    # stack measures 0.844 — these flags attribute the gap feature by feature
    p.add_argument("--kkt", default="riccati",
                   choices=["riccati", "condensed", "pallas"])
    p.add_argument("--recycle", action="store_true")
    p.add_argument("--warm-qp", action="store_true", dest="warm_qp")
    p.add_argument("--streaming", action="store_true")
    p.add_argument("--adaptive", action="store_true",
                   help="steady-state-aware IPM budget (6 steady / 15 cold)")
    p.add_argument("--ipm-first", action="store_true", dest="ipm_first",
                   help="bench's cheap first-iteration IPM (8 iters, tol 1e-3)")
    p.add_argument("--soft-fallback", action="store_true", dest="soft_fallback")
    p.add_argument("--out", default="artifacts/n60_failure_fingerprint.npz")
    args = p.parse_args()
    if not args.run:
        p.print_help()
        return

    if args.device == "cpu":
        setup("cpu", x64=True)
    else:
        setup(None, x64=False)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from robust_nonlinear_mpc_tpu.expe.main_rocket_robust_closed_loop import (
        X0,
        make_rocket_problem,
    )
    from robust_nonlinear_mpc_tpu.ops.qp_ipm import IPMOptions
    from robust_nonlinear_mpc_tpu.sim.closed_loop import build_batched_closed_loop
    from robust_nonlinear_mpc_tpu.solvers.sqp import SQPOptions

    m, solver = make_rocket_problem(args.N)
    solver.opts = solver.opts._replace(verbose=False)
    if solver.dtype == jnp.float32:
        cold_cap = max(args.qp_iters, 15) if args.adaptive else args.qp_iters
        solver.opts = solver.opts._replace(
            ipm=IPMOptions(max_iter=cold_cap, tol=3e-5, kkt=args.kkt),
            adaptive_ipm_budget=(
                (min(args.qp_iters, 6), cold_cap) if args.adaptive else None
            ),
            sqp=SQPOptions(ipm=IPMOptions(max_iter=15, tol=3e-5),
                           tol_step=1e-4, tol_feas=1e-4, max_iter=25),
        )
        if args.ipm_first:
            solver.opts = solver.opts._replace(
                ipm_first=IPMOptions(max_iter=8, tol=1e-3, kkt=args.kkt)
            )
    solver.opts = solver.opts._replace(
        recycle_eta=args.recycle, streaming_response=args.streaming,
        recycle_warm_qp=args.recycle and args.warm_qp,
        nominal_soft_fallback=args.soft_fallback,
    )
    print(f"[n60] config: kkt={args.kkt} recycle={args.recycle} "
          f"warm_qp={args.warm_qp} streaming={args.streaming} "
          f"adaptive={args.adaptive} ipm_first={args.ipm_first} "
          f"qp_iters={args.qp_iters}", flush=True)

    B, T = args.lanes, args.steps
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(
        np.asarray(X0)[None] + 0.02 * rng.standard_normal((B, m.nx)),
        solver.dtype,
    )
    Ws_h = 2 * rng.random((B, T, m.nw)) - 1
    Ws = jnp.asarray(Ws_h, solver.dtype)

    rollout = jax.jit(jax.vmap(build_batched_closed_loop(solver, T)))
    # --soft-fallback runs the IN-VMAP soft solve, which kernel-faults on
    # this TPU backend above a lanes x horizon envelope (~960/N lanes,
    # bench.py fb_chunk); chunk the whole rollout inside that envelope —
    # lanes are independent, so chunking is exact (ADVICE r4)
    if args.soft_fallback and args.device != "cpu":
        from robust_nonlinear_mpc_tpu.solvers.soft_nlp import (
            soft_fallback_chunk,
        )

        fb_chunk = soft_fallback_chunk(args.N)
    else:
        fb_chunk = B
    if fb_chunk >= B:
        logs = rollout(x0s, Ws)
    else:
        print(f"[n60] soft-fallback on TPU: chunking {B} lanes into "
              f"{fb_chunk}-lane dispatches (kernel-fault envelope)")
        parts = []
        for c in range(0, B, fb_chunk):
            xs_c, ws_c = x0s[c : c + fb_chunk], Ws[c : c + fb_chunk]
            n_real = xs_c.shape[0]
            if n_real < fb_chunk:
                # pad the ragged last chunk to the fixed shape (repeat the
                # last lane, slice after) — a distinct shape would recompile
                # the whole rollout through the remote-compile tunnel
                reps = fb_chunk - n_real
                xs_c = jnp.concatenate(
                    [xs_c, jnp.repeat(xs_c[-1:], reps, axis=0)], axis=0)
                ws_c = jnp.concatenate(
                    [ws_c, jnp.repeat(ws_c[-1:], reps, axis=0)], axis=0)
            part = rollout(xs_c, ws_c)
            parts.append(jax.tree_util.tree_map(lambda a: a[:n_real], part))
        logs = jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *parts
        )
    jax.block_until_ready(logs.state_trajectory)

    succ = np.asarray(logs.success)            # (B, T)
    scpf = np.asarray(logs.scp_failed)         # (B, T)
    qpi = np.asarray(logs.qp_iters)
    xs = np.asarray(logs.state_trajectory)     # (B, T, nx)
    us = np.asarray(logs.input_trajectory)     # (B, T-1, nu)
    nom = np.asarray(logs.nominal_x)           # (B, T, N+1, nx)
    bx = np.asarray(logs.backoff_x)            # (B, T, N+1, nx)

    G = np.asarray(m.G, float)
    g = np.asarray(m.g, float).reshape(-1)
    names = list(getattr(m, "constraint_names", range(m.ni)))

    lane_fail = ~succ.all(axis=1)
    fail_ids = np.flatnonzero(lane_fail)
    first_fail = np.array(
        [int(np.argmax(~succ[i])) if lane_fail[i] else -1 for i in range(B)]
    )
    streaks = []
    for i in fail_ids:
        f = ~succ[i]
        # longest consecutive failed streak
        best = cur = 0
        for v in f:
            cur = cur + 1 if v else 0
            best = max(best, cur)
        streaks.append(best)

    print(f"[n60] N={args.N} B={B} T={T}: per-step success {succ.mean():.4f}, "
          f"failing lanes {len(fail_ids)}/{B}")
    if len(fail_ids):
        print(f"[n60] first-failure steps: "
              f"min {first_fail[fail_ids].min()} / median "
              f"{int(np.median(first_fail[fail_ids]))} / max {first_fail[fail_ids].max()}; "
              f"longest streaks median {int(np.median(streaks))} max {max(streaks)}")
        n_inner = int((scpf[fail_ids] & ~succ[fail_ids]).sum())
        n_steps_failed = int((~succ[fail_ids]).sum())
        print(f"[n60] failed steps: {n_steps_failed} total, {n_inner} inner-solve "
              f"failures, {n_steps_failed - n_inner} other")
        # realized-state constraint margins AT the first failed step
        rows_hit = {}
        for i in fail_ids:
            t = first_fail[i]
            if t >= us.shape[1]:
                continue
            z = np.concatenate([xs[i, t], us[i, t]])
            marg = G @ z - g
            for r in np.flatnonzero(marg > -1e-3):   # active/violated rows
                rows_hit[names[r]] = rows_hit.get(names[r], 0) + 1
        print("[n60] active/violated constraint rows at first failure "
              "(count over failing lanes):")
        for k, v in sorted(rows_hit.items(), key=lambda kv: -kv[1])[:10]:
            print(f"    {k}: {v}")

    # ------------------------------------------------------------------
    # Stage 2: teacher-forced host-driver replay of the worst lanes
    # ------------------------------------------------------------------
    replay_out = []
    # prefer MID-FLIGHT failures (the open question); cold-start failures
    # (first_fail < 3) are understood and separately mitigated
    mid = fail_ids[first_fail[fail_ids] >= 3]
    replay_ids = (mid if len(mid) else fail_ids)[: args.replay]
    for i in replay_ids:
        t_fail = int(first_fail[i])
        solver.reset()
        rec = {"lane": int(i), "t_fail": t_fail}
        sol_prev = None
        for t in range(t_fail + 1):
            if t > 0:
                solver.reset_warm_start()
            sol = solver.solve(xs[i, t])
            if t == t_fail - 1:
                sol_prev = sol
            if t == t_fail:
                rec["success_at_fail"] = bool(sol.get("success", False))
                rec["qp_kkt"] = float(sol.get("qp_kkt", np.nan))
                rec["qp_iters"] = int(sol.get("qp_iters", -1))
                # tube-vs-bound capacity of the LAST ACCEPTED iterate: the
                # tightened stage residual g - G z_nom_k - backoff_k
                src = sol if sol.get("success", False) else (sol_prev or sol)
                Xn = np.asarray(src["primal_x"], float)     # (nx, N+1)
                Un = np.asarray(src["primal_u"], float)     # (nu, N)
                bo = np.asarray(src["backoff"], float)      # (N, ni)
                cap = np.empty((args.N, m.ni))
                for k in range(args.N):
                    z = np.concatenate([Xn[:, k], Un[:, k]])
                    cap[k] = g - G @ z - bo[k]
                kk, rr = np.unravel_index(np.argmin(cap), cap.shape)
                rec["min_capacity"] = float(cap.min())
                rec["min_capacity_stage"] = int(kk)
                rec["min_capacity_row"] = names[rr]
                rec["n_rows_exhausted"] = int((cap <= 0).sum())
                cap_nobo = cap + bo
                rec["min_capacity_untightened"] = float(cap_nobo.min())
                print(f"[n60] lane {i} replay: fail step {t_fail}, "
                      f"success_at_fail={rec['success_at_fail']}, "
                      f"qp_kkt={rec['qp_kkt']:.2e}, "
                      f"min tightened capacity {rec['min_capacity']:.4f} at "
                      f"stage {kk} row '{names[rr]}' "
                      f"({rec['n_rows_exhausted']} stage-rows exhausted; "
                      f"untightened min {rec['min_capacity_untightened']:.4f})")
        replay_out.append(rec)

    np.savez(
        args.out,
        N=args.N, lanes=B, steps=T,
        success=succ, scp_failed=scpf, qp_iters=qpi,
        first_fail=first_fail,
        fail_ids=fail_ids,
        streaks=np.asarray(streaks, np.int32),
        replay=json.dumps(replay_out),
    )
    print(f"[n60] saved {args.out}")


if __name__ == "__main__":
    main()
