"""Monte-Carlo tube validation: batched disturbance-realization rollouts.

This is the new-design experiment from BASELINE.json's config list
("Monte-Carlo tube validation: 10k+ batched disturbance-realization rollouts
per system across pod slice") — the reference, being single-solve CPU code,
has no analogue. B closed-loop scenarios of the chosen system run as ONE
jitted lax.scan, vmapped and (if multiple devices are visible) sharded over
the scenario mesh; reported statistics:

  * closed-loop constraint violations across all scenarios/steps (psum'd),
  * one-step tube containment: the realized next state must lie within the
    predicted nominal +- backoff_x[1] box of the solve at the previous step
    (the tube's one-step-ahead guarantee under ||w||_inf <= 1),
  * mean closed-loop cost.

Usage:
  python -m robust_nonlinear_mpc_tpu.expe.main_monte_carlo_validation --run \
      [--system rocket] [--scenarios 256] [--steps 10] [--device tpu|cpu]
"""

from __future__ import annotations

import argparse

from robust_nonlinear_mpc_tpu.utils.platform import setup

FOLDER = "monte_carlo_validation"


def generate(system="rocket", scenarios=256, steps=10, device="cpu", seed=0,
             recycle=False, streaming=False, warm_qp=False, qp_iters=15,
             kkt="riccati", converged=False, adaptive=False, host_devices=8,
             scp_eps=None, max_iter_scp=None, chunks=1, scp_per_dispatch=2,
             soft_fallback=False, restoration=False, qp_tol=None,
             stall_damping=0.0):
    if device == "cpu":
        # host_devices: XLA:CPU collectives run one thread per virtual
        # device and its rendezvous aborts after 40 s if the threads are
        # starved — on small hosts (this box has 2 cores) use
        # --host-devices <= core count for long-running converged-mode runs
        setup("cpu", x64=True, host_devices=host_devices)
    else:
        setup(None, x64=False)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from robust_nonlinear_mpc_tpu.expe._common import save_results
    from robust_nonlinear_mpc_tpu.parallel.mesh import scenario_mesh
    from robust_nonlinear_mpc_tpu.ops.qp_ipm import IPMOptions
    from robust_nonlinear_mpc_tpu.solvers.sqp import SQPOptions

    if system == "rocket":
        from robust_nonlinear_mpc_tpu.expe.main_rocket_robust_closed_loop import (
            X0,
            make_rocket_problem,
        )

        m, solver = make_rocket_problem(15)
        x_center = np.array(X0)
        x_spread = 0.05
    elif system == "quadrotor":
        from robust_nonlinear_mpc_tpu.models import Quadrotor
        from robust_nonlinear_mpc_tpu.solvers.scp_sls import SCPSLSSolver

        m = Quadrotor()
        Q = np.diag([10.0] * 3 + [1.0] * 3 + [1.0] * 4 + [2.0] * 3)
        st = np.deg2rad(2.0); qv = 0.5 * st; qw = 0.1 * qv
        m.E = m.dt * 5 * np.diag(
            [0.10, 0.10, 0.10, 0.15, 0.15, 0.15, qw, qv, qv, qv, 0.2, 0.2, 0.2]
        )
        solver = SCPSLSSolver(
            15, Q, np.eye(4), m, 10 * Q,
            Q_reg=1e4 * np.eye(13), R_reg=1e4 * np.eye(4), Q_reg_f=1e4 * np.eye(13),
            rti=1, fast_sls_rti_steps=1,
        )
        x_center = np.concatenate([np.full(3, 2.0), np.zeros(3),
                                   [1.0, 0, 0, 0], np.zeros(3)])
        x_spread = 0.2
    elif system == "pendulum":
        from robust_nonlinear_mpc_tpu.models import Pendulum
        from robust_nonlinear_mpc_tpu.solvers.scp_sls import SCPSLSSolver

        m = Pendulum()
        m.E = 0.003 * np.eye(4)
        solver = SCPSLSSolver(
            15, np.eye(4), np.eye(1), m, 10 * np.eye(4),
            Q_reg=1e3 * np.eye(4), R_reg=1e3 * np.eye(1), Q_reg_f=1e4 * np.eye(4),
            rti=1, fast_sls_rti_steps=1,
        )
        x_center = np.array([0.5, 0.5, 0.0, 0.0])
        x_spread = 0.1
    else:
        raise ValueError(system)

    solver.opts = solver.opts._replace(verbose=False)
    if converged:
        # VERDICT r1 item 3: validate the robustness guarantee at CONVERGED
        # SLS instead of the RTI(1/1) approximation — the reference's default
        # mode (SCP_SLS_jit.py:20-22 rti=-1; fast_SLS until the 1e-3 primal
        # criterion, fast_SLS_jit.py:298-312,594). Uncapped IPM; the SCP
        # delta criterion is set to an f32/f64-achievable tolerance.
        # budgets: the tube (fast-SLS) iteration needs up to ~60 inner
        # iterations on cold/aggressive steps (measured f64 16x5 probe:
        # at sls_max_iter=30 ~10% of solves fail, and every containment
        # miss/violation sits on a failed step; successful converged solves
        # hold the tube with positive margin). Validation mode pays the
        # while_loop's slowest lane — correctness over throughput here.
        # f32 floor: the SCP delta is the max |primal update|; QP solutions
        # at tol 3e-5 on the rocket's u-scale ~7 / x-scale ~5 carry ~2e-4
        # of solver noise, so 1e-4 was UNREACHABLE in f32 (measured TPU
        # 16x3: success 0.0000, every lane burning the full 20x60 budget —
        # which is also what blew the 128/1024 runs up into device errors).
        # 1e-3 mirrors the reference's own fast-SLS primal criterion
        # (fast_SLS_jit.py:594); --scp-eps overrides.
        scp_eps_v = scp_eps if scp_eps is not None else (
            1e-3 if solver.dtype == jnp.float32 else 1e-8
        )
        # SCP converges LINEARLY on this problem (measured contraction
        # ~0.6-0.77/iteration, see ROUND3.md): 1e-8 from a 3.5e-1 cold
        # delta needs ~67 iterations, 1e-3 needs ~10. The reference's own
        # budget is MAX_ITER_SCP=100 (SCP_SLS_jit.py:50); default here
        # scales with the criterion.
        max_scp = max_iter_scp if max_iter_scp is not None else (
            20 if solver.dtype == jnp.float32 else 80
        )
        solver.opts = solver.opts._replace(
            rti=-1, fast_sls_rti_steps=0, epsilon_convergence=scp_eps_v,
            max_iter_scp=int(max_scp), sls_max_iter=60,
        )
    if solver.dtype == jnp.float32:
        # --qp-iters validates robustness at a bounded IPM budget (the bench
        # caps the vmapped while_loop at 6 so the batch never pays a 7-15
        # iteration outlier lane; capped lanes are accepted when finite).
        # --qp-tol: the converged mode's SCP delta criterion (eps 1e-3)
        # cannot be reached by lanes whose QP solution noise exceeds it —
        # at tol 3e-5 the primal noise on the rocket's u-scale ~7 is
        # ~1e-3, exactly where the boundary-riding lanes stall (delta
        # 1.0-3.3e-3, converged_probe). Tightening the QP tol lowers the
        # floor at the cost of more IPM iterations.
        tol = float(qp_tol) if qp_tol is not None else 3e-5
        if adaptive:
            # steady-state-aware budget: cold lanes at 15, steady at qp_iters
            solver.opts = solver.opts._replace(
                ipm=IPMOptions(max_iter=15, tol=tol, kkt=kkt),
                adaptive_ipm_budget=(int(qp_iters), 15),
            )
        else:
            solver.opts = solver.opts._replace(
                ipm=IPMOptions(max_iter=int(qp_iters), tol=tol, kkt=kkt)
            )
        solver.opts = solver.opts._replace(
            sqp=SQPOptions(ipm=IPMOptions(max_iter=15, tol=3e-5),
                           tol_step=1e-4, tol_feas=1e-4, max_iter=25)
        )
    elif qp_tol is not None:
        # f64 path: apply the override to the default IPM options instead of
        # silently ignoring it (the f32 branch consumes it above)
        solver.opts = solver.opts._replace(
            ipm=solver.opts.ipm._replace(tol=float(qp_tol))
        )

    # throughput modes: dual-recycling RTI (one QP per step) and/or the
    # streaming fused response (no Phi materialization — required for very
    # large scenario counts)
    solver.opts = solver.opts._replace(
        recycle_eta=recycle, streaming_response=streaming,
        recycle_warm_qp=recycle and warm_qp,
    )
    # nominal_soft_fallback: measured essential at N=30 (wrong-basin cold
    # starts, BASELINE.md). In RTI mode the MC keeps it off by default (N=15
    # lanes recover within 1-2 steps; the vmapped soft solve kernel-faults
    # on this TPU backend above ~64-512 lanes). In CONVERGED mode it is the
    # measured fix for permanently-stuck wrong-basin lanes (converged_probe:
    # 15/128 lanes fail from t=0 with first-delta 10-25 and never recover —
    # a failed converged step freezes the plan), and the chunked driver
    # applies it HOST-CHUNKED outside the vmap (closed_loop.py
    # _apply_soft_fallback), clear of the kernel-fault envelope.
    if soft_fallback:
        solver.opts = solver.opts._replace(nominal_soft_fallback=True)
    if restoration:
        # feasibility restoration on the inner infeasible-forward event
        # (solvers/restoration.py) — converged-mode mitigation for the
        # transient class the reference simply aborts on
        solver.opts = solver.opts._replace(feasibility_restoration=True)
    if stall_damping:
        # boundary-riding limit-cycle mitigation: damped step acceptance
        # after 15 SCP iterations (SCPSLSOptions.scp_stall_damping)
        solver.opts = solver.opts._replace(
            scp_stall_damping=float(stall_damping)
        )

    mesh = scenario_mesh()
    n_dev = mesh.devices.size
    # chunking: the single-program per-chip ceiling is HBM-bound (measured
    # v5e: 8192 rocket lanes fit, 10240 fault) — `chunks` splits the batch
    # into equal same-shape jitted invocations of ONE compiled program and
    # aggregates; scenarios are independent, so this is exact
    chunks = max(1, int(chunks))
    B = (scenarios // (n_dev * chunks)) * n_dev * chunks
    if B == 0:
        raise ValueError(
            f"scenarios={scenarios} < devices*chunks={n_dev * chunks}: "
            f"the per-chunk shard would be empty. Raise --scenarios, lower "
            f"--chunks, or (on CPU) lower --host-devices."
        )
    Bc = B // chunks
    rng = np.random.default_rng(seed)
    x0s_h = np.asarray(
        x_center[None] + x_spread * rng.standard_normal((B, m.nx))
    )
    # per-step disturbances w ~ U[-1, 1]^nw (the model applies E w)
    Ws_h = 2 * rng.random((B, steps, m.nw)) - 1

    from robust_nonlinear_mpc_tpu.parallel.mc import MCStats, lane_reductions, make_sharded_mc
    from jax.sharding import NamedSharding, PartitionSpec as P
    from robust_nonlinear_mpc_tpu.parallel.mesh import SCENARIO_AXIS

    if converged and scp_per_dispatch > 0:
        # bounded-dispatch until-convergence (VERDICT r3 item 1): the
        # single-dispatch while_loop bills one device program for the worst
        # lane's full scp x sls budget, which exceeds the device dispatch
        # envelope at >= 96 rocket lanes; the chunked driver advances lanes
        # <= scp_per_dispatch SCP iterations per dispatch with carried
        # state — identical per-lane iteration sequences, bounded dispatches
        from robust_nonlinear_mpc_tpu.sim.closed_loop import (
            build_chunked_converged_loop,
        )

        fn_run = build_chunked_converged_loop(
            solver, steps, scp_per_dispatch=scp_per_dispatch, mesh=mesh
        )

        def fn(x0j, Wj):
            logs = fn_run(x0j, Wj)
            lane_ok, worst, cost = lane_reductions(
                logs,
                jnp.asarray(m.G, solver.dtype), jnp.asarray(m.g, solver.dtype),
                jnp.asarray(solver.Q, solver.dtype),
                jnp.asarray(solver.R, solver.dtype),
            )
            lane_ok = np.asarray(lane_ok)
            worst = np.asarray(worst)
            cost = np.asarray(cost)
            n_ok = int(lane_ok.sum())
            stats = MCStats(
                n_scenarios=x0j.shape[0],
                n_violations=int((worst > 0).sum()),
                worst_margin=float(worst[lane_ok].max()) if n_ok else float("-inf"),
                mean_cost=float(cost[lane_ok].mean()) if n_ok else float("nan"),
                n_failed_lanes=int((~lane_ok).sum()),
            )
            return logs, stats
    else:
        fn = make_sharded_mc(solver, steps, mesh)
    sh = NamedSharding(mesh, P(SCENARIO_AXIS))
    logs_np, stats_list = [], []
    for c in range(chunks):
        sl = slice(c * Bc, (c + 1) * Bc)
        lc, sc = fn(
            jax.device_put(jnp.asarray(x0s_h[sl], solver.dtype), sh),
            jax.device_put(jnp.asarray(Ws_h[sl], solver.dtype), sh),
        )
        jax.block_until_ready(lc.state_trajectory)
        # pull each chunk to host so the next chunk reuses the HBM
        logs_np.append(jax.tree_util.tree_map(np.asarray, lc))
        stats_list.append(jax.tree_util.tree_map(float, sc))
    logs = jax.tree_util.tree_map(
        lambda *xs: np.concatenate(xs, axis=0), *logs_np
    )
    n_ok_total = sum(
        s.n_scenarios - s.n_failed_lanes for s in stats_list
    )
    stats = stats_list[0]._replace(
        n_scenarios=sum(s.n_scenarios for s in stats_list),
        n_violations=sum(s.n_violations for s in stats_list),
        worst_margin=max(s.worst_margin for s in stats_list),
        # mean over successful lanes, weighted by each chunk's success count;
        # a chunk with ZERO successful lanes reports mean_cost=NaN, and
        # NaN * 0 would poison the total — skip those chunks explicitly
        mean_cost=sum(
            s.mean_cost * (s.n_scenarios - s.n_failed_lanes)
            for s in stats_list
            if s.n_scenarios - s.n_failed_lanes > 0
        ) / max(n_ok_total, 1) if n_ok_total else float("nan"),
        n_failed_lanes=sum(s.n_failed_lanes for s in stats_list),
    )

    # ------------------------------------------------------------------
    # Statistics. Solver failure and tube/constraint violation are
    # SEPARATE events and are reported separately: a failed solve carries
    # no guarantee (its backoffs are NaN sentinels in until-convergence
    # mode), so containment/margin statistics mask by log.success and the
    # failure counts are reported alongside. The headline guarantee claim
    # is `n_violation_steps_on_success` — constraint violations at steps
    # whose own solve AND whose tube-predicting previous solve succeeded.
    # ------------------------------------------------------------------
    succ = np.asarray(logs.success).astype(bool)    # (B, T) per-step success
    xs = np.asarray(logs.state_trajectory)          # (B, T, nx)
    us = np.asarray(logs.input_trajectory)          # (B, T-1, nu)
    nom = np.asarray(logs.nominal_x)                # (B, T, N+1, nx)
    bo = np.asarray(logs.backoff_x)                 # (B, T, N+1, nx)

    # one-step tube containment: |x_{t+1} - nominal_x[t, 1]| <= backoff_x[t, 1]
    dev = np.abs(xs[:, 1:] - nom[:, :-1, 1])        # realized vs predicted
    margin = bo[:, :-1, 1] - dev                    # (B, T-1, nx); NaN = no tube
    ok_step = succ[:, :-1] & np.isfinite(margin).all(axis=-1)   # (B, T-1)
    contained = margin >= -1e-6
    # masked (successful solves only) and conservative (failure counts as
    # a miss) variants of the elementwise containment rate
    containment_rate = float(contained[ok_step].mean()) if ok_step.any() else float("nan")
    containment_rate_all = float(
        np.where(ok_step[..., None], contained, False).mean()
    )
    worst_tube_margin = float(margin[ok_step].min()) if ok_step.any() else float("nan")
    # cold (first 3 steps: SQP seed + transient) vs steady phase split
    cold = min(3, margin.shape[1])
    cont_cold = contained[:, :cold][ok_step[:, :cold]]
    cont_steady = contained[:, cold:][ok_step[:, cold:]]

    # closed-loop constraint margins G [x; u] - g, per scenario/step
    Gm = np.asarray(m.G, float)
    gv = np.asarray(m.g, float).reshape(-1)
    z = np.concatenate([xs[:, :-1], us], axis=-1)   # (B, T-1, nx+nu)
    cmarg = z @ Gm.T - gv                           # (B, T-1, ni)
    worst_per_step = cmarg.max(axis=-1)             # (B, T-1)
    viol_step = worst_per_step > 0
    # attribution: solve t produced u_t; solve t-1 predicted the tube
    # containing x_t (step 0's state is the sampled x0 — no prior tube)
    prev_ok = np.concatenate(
        [np.ones((B, 1), bool), succ[:, : max(steps - 2, 0)]], axis=1
    )
    viol_on_success = viol_step & succ[:, :-1] & prev_ok
    worst_per_scenario = worst_per_step.max(axis=1)  # (B,)
    viol_scen = np.flatnonzero(worst_per_scenario > 0)
    top = viol_scen[np.argsort(worst_per_scenario[viol_scen])[::-1]][:8]

    results = {
        "system": system,
        "recycle": bool(recycle),
        "adaptive": bool(adaptive),
        "converged": bool(converged),
        "restoration": bool(restoration),
        "soft_fallback": bool(soft_fallback),
        "qp_tol": float(qp_tol) if qp_tol is not None else -1.0,
        "stall_damping": float(stall_damping),
        "qp_iters": int(qp_iters),
        "max_iter_scp_override": int(max_iter_scp) if max_iter_scp is not None else -1,
        "streaming": bool(streaming),
        "warm_qp": bool(recycle and warm_qp),
        "scenarios": B,
        "steps": steps,
        "devices": int(n_dev),
        # constraint-violation accounting
        "n_violations": int(stats.n_violations),            # scenarios w/ any
        "n_violation_steps": int(viol_step.sum()),
        "n_violation_steps_on_success": int(viol_on_success.sum()),
        "worst_constraint_margin": float(stats.worst_margin),
        "worst_violation_per_scenario_top": worst_per_scenario[top],
        "violating_scenario_ids": top.astype(np.int32),
        "mean_cost": float(stats.mean_cost),          # over successful lanes
        "n_failed_lanes": int(stats.n_failed_lanes),
        # tube containment, masked by solver success (NaN-free)
        # tube_miss_mask: per-(lane, step) one-step tube-prediction misses
        # on successful solves — lets a reader attribute a containment dip
        # to specific lanes (e.g. the quadrotor mitigation-ladder A/B:
        # are the misses on the boundary lanes the ladder newly converts?)
        "tube_miss_mask": ok_step & ~contained.all(axis=-1),
        # per-(lane, step) constraint violations attributable to the solver
        # (both the producing and tube-predicting solves succeeded) — lets
        # a reader locate the rare on-success violation exactly
        "viol_on_success_mask": viol_on_success,
        "tube_miss_lane_ids": np.flatnonzero(
            (ok_step & ~contained.all(axis=-1)).any(axis=1)
        ).astype(np.int32),
        "tube_containment_rate": containment_rate,
        "tube_containment_rate_all": containment_rate_all,
        "tube_containment_cold": float(cont_cold.mean()) if cont_cold.size else float("nan"),
        "tube_containment_steady": float(cont_steady.mean()) if cont_steady.size else float("nan"),
        "worst_tube_margin": worst_tube_margin,
        # failure accounting
        "success_rate": float(succ.mean()),
        "n_failed_steps": int((~succ).sum()),
        "n_failed_scenarios": int((~succ).any(axis=1).sum()),
        # failure taxonomy (VERDICT r3 item 2): a failed step either had an
        # INNER solve fail (fast-SLS infeasible-forward / non-finite QP,
        # scp_failed=True) or exhausted the SCP budget unconverged
        "n_failed_inner": int(
            ((~succ) & np.asarray(logs.scp_failed)).sum()
        ) if logs.scp_failed is not None else -1,
        "n_failed_unconverged": int(
            ((~succ) & ~np.asarray(logs.scp_failed)).sum()
        ) if logs.scp_failed is not None else -1,
        "scp_iters": np.asarray(logs.scp_iters)
        if logs.scp_iters is not None else np.zeros(0),
        "scp_failed_mask": np.asarray(logs.scp_failed)
        if logs.scp_failed is not None else np.zeros(0),
        "success_mask": succ,
        "state_trajectories": xs[: min(B, 64)],  # sample for plotting
    }
    print(
        f"[mc] {system}: {B} scenarios x {steps} steps on {n_dev} device(s) — "
        f"violations={results['n_violations']} scen / {results['n_violation_steps']} steps "
        f"({results['n_violation_steps_on_success']} on successful solves), "
        f"tube containment={containment_rate:.4f} on successful solves "
        f"(cold {results['tube_containment_cold']:.4f} / steady {results['tube_containment_steady']:.4f}; "
        f"worst margin {worst_tube_margin:.4g}), "
        f"success={results['success_rate']:.4f} "
        f"({results['n_failed_steps']} failed steps in {results['n_failed_scenarios']} scenarios; "
        f"{results['n_failed_inner']} inner-solve failures / "
        f"{results['n_failed_unconverged']} budget-exhausted unconverged)"
    )
    tag = (
        f"mc_validation_{system}"
        + ("_recycle" if recycle else "")
        + ("_streaming" if streaming else "")
        + ("_warmqp" if (recycle and warm_qp) else "")
        + ("_converged" if converged else "")
        + ("_softfb" if soft_fallback else "")
        + ("_restoration" if restoration else "")
        + (f"_damp{stall_damping:g}" if stall_damping else "")
        + (f"_qptol{qp_tol:g}" if qp_tol is not None else "")
        + (f"_cap{max_iter_scp}" if max_iter_scp is not None else "")
        + ("_adaptive" if adaptive else "")
    )
    return save_results(FOLDER, tag, results)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--run", action="store_true")
    p.add_argument("--system", default="rocket", choices=["rocket", "pendulum", "quadrotor"])
    p.add_argument("--scenarios", type=int, default=256)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--device", default="cpu", choices=["cpu", "tpu"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--recycle", action="store_true")
    p.add_argument("--streaming", action="store_true")
    p.add_argument("--warm-qp", action="store_true", dest="warm_qp")
    p.add_argument("--qp-iters", type=int, default=15, dest="qp_iters")
    p.add_argument("--qp-tol", type=float, default=None, dest="qp_tol",
                   help="IPM KKT tolerance (f32 default 3e-5). Converged "
                        "mode: tighten (e.g. 1e-5) so the QP solution-noise "
                        "floor sits below the SCP delta criterion")
    p.add_argument("--adaptive", action="store_true",
                   help="steady-state-aware IPM budget (qp_iters steady / 15 cold)")
    p.add_argument("--converged", action="store_true",
                   help="until-convergence SCP/SLS (reference default mode) "
                        "instead of RTI(1/1)")
    p.add_argument("--kkt", default="riccati",
                   choices=["riccati", "condensed", "pallas"])
    p.add_argument("--chunks", type=int, default=1,
                   help="split the batch into this many equal same-shape "
                        "jitted invocations (one compiled program) and "
                        "aggregate -- for batches above the single-program "
                        "HBM ceiling (v5e: 8192 rocket lanes)")
    p.add_argument("--scp-per-dispatch", type=int, default=2,
                   dest="scp_per_dispatch",
                   help="converged mode: max SCP iterations per device "
                        "dispatch (bounded-dispatch driver; 0 = legacy "
                        "single-dispatch whole-loop program, which exceeds "
                        "the device envelope at >= 96 rocket lanes)")
    p.add_argument("--max-iter-scp", type=int, default=None,
                   dest="max_iter_scp",
                   help="override the converged-mode SCP iteration budget "
                        "(default: 20 f32 / 80 f64)")
    p.add_argument("--scp-eps", type=float, default=None, dest="scp_eps",
                   help="override the converged-mode SCP delta criterion "
                        "(default: 1e-3 f32 / 1e-8 f64)")
    p.add_argument("--stall-damping", type=float, default=0.0,
                   dest="stall_damping",
                   help="converged mode: damped step acceptance (alpha) "
                        "after 15 SCP iterations — collapses boundary-"
                        "riding limit cycles (0 = off)")
    p.add_argument("--restoration", action="store_true",
                   help="feasibility restoration: on an inner infeasible-"
                        "forward event, solve the tightened QP with soft "
                        "slacks and continue SCP instead of failing the "
                        "step (converged-mode mitigation; "
                        "solvers/restoration.py)")
    p.add_argument("--soft-fallback", action="store_true", dest="soft_fallback",
                   help="soft-slack cold-start fallback for failed hard-SQP "
                        "nominals (host-chunked in converged mode — the "
                        "measured fix for permanently-stuck wrong-basin "
                        "lanes; see closed_loop._apply_soft_fallback)")
    p.add_argument("--host-devices", type=int, default=8, dest="host_devices",
                   help="virtual CPU device count (--device cpu). Use 1 for "
                        "converged-mode runs: XLA:CPU collectives abort with "
                        "a 40 s rendezvous termination timeout when shards "
                        "reach the psum far apart in time, which worst-lane "
                        "while_loop shards (until-convergence SCP) routinely "
                        "do; a 1-device mesh has no collectives")
    args = p.parse_args()
    if args.run:
        generate(args.system, args.scenarios, args.steps, args.device, args.seed,
                 recycle=args.recycle, streaming=args.streaming,
                 warm_qp=args.warm_qp, qp_iters=args.qp_iters, kkt=args.kkt, converged=args.converged,
                 adaptive=args.adaptive, host_devices=args.host_devices,
                 scp_eps=args.scp_eps, max_iter_scp=args.max_iter_scp,
                 chunks=args.chunks, scp_per_dispatch=args.scp_per_dispatch,
                 soft_fallback=args.soft_fallback,
                 restoration=args.restoration, qp_tol=args.qp_tol,
                 stall_damping=args.stall_damping)
