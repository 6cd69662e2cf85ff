"""f32-TPU throughput path vs f64-CPU accuracy path: trajectory deviation.

SURVEY.md §7 prescribes "throughput path f32 with error bounds, reported
separately"; VERDICT r1 item 8 asks for the measured bound: run the IDENTICAL
seeded rocket closed loop (reference config N=15, rti=1/1, 30 steps, the
seeded disturbance realization) on both paths and report max |Δu| and the
containment delta.

Two deviation measures are reported, because PARITY.md establishes that the
rocket closed loop under RTI(1/1)+noise has measured local controller gains
|du0|/|dx| of 4–54: ANY per-step perturbation (dtype noise included) is
amplified along the loop, so raw closed-loop deviation is a property of the
loop's sensitivity, not of the solver's accuracy. The well-posed measure is
the matched-state controller map: feed the f32 solver the f64 trajectory's
states (teacher forcing, the f32 solver keeping its own warm-start state) and
compare the returned u0 at every step.

Phases (dtype/platform config is process-global in JAX, so each phase is its
own process; f64 runs on CPU, f32 on the TPU):

  python -m robust_nonlinear_mpc_tpu.tools.dtype_deviation --phase f64
  python -m robust_nonlinear_mpc_tpu.tools.dtype_deviation --phase f32
  python -m robust_nonlinear_mpc_tpu.tools.dtype_deviation --compare

Reference anchor for the workload: /root/reference/expe/
main_rocket_robust_closed_loop.py:63,80-85,128 (config), :30,178-182 (seeded
uniform noise).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from robust_nonlinear_mpc_tpu.utils.platform import setup

ART_DIR = os.path.join("artifacts", "dtype_deviation")
SIM_STEPS = 30
NOISE_SEED = 42


def _noise(nw: int) -> np.ndarray:
    rng = np.random.default_rng(NOISE_SEED)
    return 2.0 * rng.random((SIM_STEPS, nw)) - 1.0


def _problem():
    from robust_nonlinear_mpc_tpu.expe.main_rocket_robust_closed_loop import (
        X0,
        make_rocket_problem,
    )

    m, solver = make_rocket_problem(15)
    solver.opts = solver.opts._replace(verbose=False)
    return m, solver, np.asarray(X0, float)


def _configure_throughput(solver):
    """The bench.py TPU throughput configuration (pallas Newton kernels,
    blocked SLS, adaptive IPM budget, streaming response, dual recycling,
    cross-step QP warm start) — kept in sync with bench.py:69-152."""
    import jax.numpy as jnp

    from robust_nonlinear_mpc_tpu.ops.qp_ipm import IPMOptions
    from robust_nonlinear_mpc_tpu.utils.numerics import set_tube_precision

    kkt = "pallas"
    solver.opts = solver.opts._replace(
        ipm=IPMOptions(max_iter=15, tol=3e-5, kkt=kkt),
        ipm_first=IPMOptions(max_iter=8, tol=1e-3, kkt=kkt),
        adaptive_ipm_budget=(6, 15),
        sls_block=2,
        streaming_response=True,
        recycle_eta=True,
        recycle_warm_qp=True,
    )
    assert solver.dtype == jnp.float32
    set_tube_precision("default")


def _rollout(solver, x0, W):
    """One-scenario jitted closed loop; returns numpy log dict."""
    import jax
    import jax.numpy as jnp

    from robust_nonlinear_mpc_tpu.sim.closed_loop import build_batched_closed_loop

    rollout = jax.jit(build_batched_closed_loop(solver, SIM_STEPS))
    log = rollout(jnp.asarray(x0, solver.dtype), jnp.asarray(W, solver.dtype))
    jax.block_until_ready(log.state_trajectory)
    return {
        "xs": np.asarray(log.state_trajectory, np.float64),
        "us": np.asarray(
            np.concatenate(
                [np.asarray(log.input_trajectory), np.asarray(log.nominal_u[-1:, 0])]
            ),
            np.float64,
        ),
        "nominal_x": np.asarray(log.nominal_x, np.float64),
        "backoff_x": np.asarray(log.backoff_x, np.float64),
        "success": np.asarray(log.success, np.float64),
    }


def _matched_state(solver, xs_ref, W):
    """Teacher-forced controller map: at each step the solver sees the f64
    trajectory's state but keeps its OWN warm-start evolution (the
    controller's internal state). Returns u0 per step."""
    import jax
    import jax.numpy as jnp

    from robust_nonlinear_mpc_tpu.sim.closed_loop import make_mpc_step
    from robust_nonlinear_mpc_tpu.solvers.fast_sls import FastSLSPersist
    from robust_nonlinear_mpc_tpu.solvers.sqp import sqp_solve

    m = solver.m
    N = solver.N
    mpc_step = jax.jit(make_mpc_step(solver))
    nominal = sqp_solve(
        m, N, solver.Q, solver.R, solver.Qf,
        jnp.asarray(xs_ref[0], solver.dtype), opts=solver.opts.sqp,
    )
    persist0 = FastSLSPersist.init(
        N, m.nx, m.nu, m.ni, m.ni_f, m.nw, solver.dtype,
        store_phi=not solver._fast_sls_opts().streaming_response,
    )
    carry = (nominal.X, nominal.U, persist0,
             jnp.asarray(xs_ref[0], solver.dtype))
    u0s, succ = [], []
    for t in range(SIM_STEPS):
        carry, out = mpc_step(carry, jnp.asarray(W[t], solver.dtype))
        u0s.append(np.asarray(out[1], np.float64))
        succ.append(float(out[6]))
        if t + 1 < SIM_STEPS:
            # teacher forcing: override the plant state with the f64 path's
            carry = (carry[0], carry[1], carry[2],
                     jnp.asarray(xs_ref[t + 1], solver.dtype))
    return np.stack(u0s), np.asarray(succ)


def _containment(xs, nominal_x, backoff_x):
    dev = np.abs(xs[1:] - nominal_x[:-1, 1])
    margin = backoff_x[:-1, 1] - dev
    return float((margin >= -1e-6).mean()), float(margin.min())


def phase_f64():
    setup("cpu", x64=True)
    m, solver, x0 = _problem()
    log = _rollout(solver, x0, _noise(m.nw))
    os.makedirs(ART_DIR, exist_ok=True)
    np.savez(os.path.join(ART_DIR, "f64.npz"), **log)
    print(f"[dtype_deviation] f64 CPU: success={log['success'].mean():.4f}")


def phase_f32(full_budget: bool = False):
    setup(None, x64=False)
    m, solver, x0 = _problem()
    _configure_throughput(solver)
    if full_budget:
        # "f32_full": same f32 pallas kernels, but the VALIDATION IPM budget
        # (flat 15 iterations, no adaptive steady-state cap, no cross-step
        # recycling shortcuts). Comparing f32 vs f32_full separates "f32
        # numerics" from "throughput-mode iteration budget" in the
        # matched-state failures: teacher forcing perturbs the state by the
        # f64-f32 drift each step, which invalidates the warm start more
        # than the true closed loop does and can choke the steady-state
        # 6-iteration budget.
        from robust_nonlinear_mpc_tpu.ops.qp_ipm import IPMOptions

        solver.opts = solver.opts._replace(
            ipm=IPMOptions(max_iter=15, tol=3e-5, kkt="pallas"),
            adaptive_ipm_budget=None,
            recycle_eta=False,
            recycle_warm_qp=False,
        )
    W = _noise(m.nw)
    log = _rollout(solver, x0, W)
    ref = np.load(os.path.join(ART_DIR, "f64.npz"))
    u_ms, succ_ms = _matched_state(solver, ref["xs"], W)
    os.makedirs(ART_DIR, exist_ok=True)
    tag = "f32_full" if full_budget else "f32"
    np.savez(os.path.join(ART_DIR, f"{tag}.npz"), **log,
             us_matched=u_ms, success_matched=succ_ms)
    print(f"[dtype_deviation] {tag} TPU: success={log['success'].mean():.4f} "
          f"matched-state success={succ_ms.mean():.4f}")


def compare(tag: str = "f32"):
    """Failure-aware deviation report.

    A deviation |dU| is a dtype-error measurement ONLY at steps where BOTH
    sides' solves succeeded:

      * a FAILED teacher-forced f32 step produces no new input — the
        finite-accept gate keeps the previous iterate's u0
        (sim/closed_loop.py:150-166), so its |dU| measures input staleness
        under a *flagged* failure, not arithmetic error;
      * a FAILED f64 step means the reference side itself kept a
        failed-but-finite iterate — at such a state the two solvers may
        legitimately select different (both feasible) local solutions.
        Measured on the round-2 artifacts: the notorious |dU| = 45.9 sits
        exactly on a step where the f64 solve failed (f64 success=0 at
        steps 8-9); the f32 "wild" input is feasible (max constraint
        margin -0.018 < 0) — an alternate local optimum at a
        failed-regime state, not an f32 numerics blow-up.

    A deployed system observes the success flag, so the honest error bound
    is max |dU| over both-successful steps; either-side-failed steps are
    counted and their deviations listed separately.
    """
    a = np.load(os.path.join(ART_DIR, "f64.npz"))
    b = np.load(os.path.join(ART_DIR, f"{tag}.npz"))
    du_cl = np.abs(a["us"] - b["us"]).max(axis=1)       # per-step closed loop
    du_ms = np.abs(a["us"] - b["us_matched"]).max(axis=1)
    ok_a = a["success"] > 0.5
    ok_ms = (b["success_matched"] > 0.5) & ok_a         # both sides succeeded
    ok_cl = (b["success"] > 0.5) & ok_a
    u_scale = float(np.abs(a["us"]).max())
    cont_a = _containment(a["xs"], a["nominal_x"], a["backoff_x"])
    cont_b = _containment(b["xs"], b["nominal_x"], b["backoff_x"])
    failed_idx = np.flatnonzero(~ok_ms)
    out = {
        "variant": tag,
        # headline bound: steps where both solves succeeded
        "matched_state_max_dU_success": float(du_ms[ok_ms].max()) if ok_ms.any() else None,
        "matched_state_median_dU_success": float(np.median(du_ms[ok_ms])) if ok_ms.any() else None,
        "n_both_success_steps": int(ok_ms.sum()),
        # unmasked (includes stale/failed-regime steps)
        "matched_state_max_dU_all": float(du_ms.max()),
        "matched_state_failed_steps": failed_idx.tolist(),
        "matched_state_failed_dU": du_ms[~ok_ms].tolist(),
        "f64_failed_steps": np.flatnonzero(~ok_a).tolist(),
        "closed_loop_max_dU_success": float(du_cl[ok_cl].max()) if ok_cl.any() else None,
        "closed_loop_max_dU_all": float(du_cl.max()),
        "closed_loop_dU_step0": float(du_cl[0]),
        "u_scale": u_scale,
        "f64_containment": cont_a[0],
        "f32_containment": cont_b[0],
        "f64_worst_margin": cont_a[1],
        "f32_worst_margin": cont_b[1],
        "f64_success": float(a["success"].mean()),
        "f32_success": float(b["success"].mean()),
        "f32_matched_success": float(b["success_matched"].mean()),
        "steps": SIM_STEPS,
    }
    print(json.dumps(out, indent=2))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--phase", choices=["f64", "f32", "f32_full"])
    p.add_argument("--compare", action="store_true")
    p.add_argument("--variant", default="f32", choices=["f32", "f32_full"],
                   help="which f32 artifact --compare reads")
    args = p.parse_args()
    if args.phase == "f64":
        phase_f64()
    elif args.phase == "f32":
        phase_f32()
    elif args.phase == "f32_full":
        phase_f32(full_budget=True)
    if args.compare:
        compare(args.variant)


if __name__ == "__main__":
    main()
