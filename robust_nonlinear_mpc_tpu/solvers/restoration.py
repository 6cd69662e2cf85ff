"""Feasibility restoration for the tightened deviation QP.

The reference's until-convergence mode simply ABORTS when a tightened
forward QP comes back infeasible (the "infeasible-forward" event,
`/root/reference/solver/fast_SLS_jit.py:302-312` — fast_SLS resets and
returns failure; `SCP_SLS_jit.py:141-150` then reports non-convergence).
The measured converged-mode failure taxonomy (tools/converged_probe.py,
BASELINE.md r4) shows this event is usually TRANSIENT: the tube momentarily
fills the whole feasible corridor (tightened capacity pinned at 0 on a few
velocity rows) while the untightened nominal keeps positive margin, and the
lane recovers a step later. Freezing the plan for a whole MPC step is the
only reason the event costs closed-loop success.

This module adds the capability the reference lacks: on the event, solve
the SAME tightened deviation QP with soft slacks on the (tightened) stage
and terminal inequalities,

    min   dy' P dy + q' dy + rho ||gamma||^2 + rho_l1 1' gamma
    s.t.  dx_{k+1} = A_k dx_k + B_k du_k + c_k,  dx_0 = xinit
          Gx dx_k + Gu du_k - gamma_k <= h_k,    gamma_k >= 0
          Gf dx_N - gamma_f <= hf,               gamma_f >= 0

which is ALWAYS feasible, and continue SCP from the restored iterate
instead of failing the step. The restored iterate is never counted as a
converged success by itself — the SCP convergence criterion and the
per-step success flag are unchanged, so the robustness guarantee ("zero
violations on successful converged solves") is untouched; restoration only
gives a stuck lane a usable direction to keep iterating with.

TPU-first formulation: identical to solvers/soft_nlp.py's slack-augmented
stages — the slacks become extra inputs gamma~ = sqrt(rho) * gamma (keeps
the subproblem Hessian O(1)-conditioned), the terminal inequality moves to
one extra stage with a free successor state, rows are padded to one static
(2 ni) shape — so the whole thing runs on the SAME Riccati-KKT IPM kernel
(ops/qp_ipm.py) with per-stage statics, jits once, and vmaps over lanes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from robust_nonlinear_mpc_tpu.ops.qp_ipm import (
    IPMOptions,
    QPData,
    QPStatics,
    solve_qp,
)


class RestorationSolution(NamedTuple):
    X: jax.Array          # (N+1, nx) deviation states
    U: jax.Array          # (N, nu)   deviation inputs
    gamma: jax.Array      # (N, ni)   stage slacks (physical units)
    gamma_f: jax.Array    # (ni_f,)   terminal slacks
    max_slack: jax.Array  # scalar
    iters: jax.Array
    success: jax.Array    # finite + IPM-accepted


def restoration_solve(
    stat: QPStatics,
    A, B, c, qx, qu,
    h,            # (N, ni)  TIGHTENED stage rhs (g_res - backoff)
    hf,           # (ni_f,)  TIGHTENED terminal rhs
    xinit,        # (nx,)    pinned deviation initial state
    rho: float = 1e5,
    rho_l1: float | None = None,
    ipm: IPMOptions = IPMOptions(max_iter=30, tol=1e-6),
) -> RestorationSolution:
    """One soft-slacked tightened deviation QP. Pure; jit/vmap over lanes.

    `stat` must be the ORIGINAL (time-invariant) deviation-QP statics — the
    augmentation to per-stage slack statics happens here (XLA constants,
    free at runtime).
    """
    N, nx = c.shape
    nu = B.shape[2]
    ni = stat.Gx.shape[0]
    ni_f = stat.Gf.shape[0]
    dtype = A.dtype
    assert ni_f <= ni, "terminal rows are padded into the stage row budget"

    rho2 = float(rho)
    rho1 = float(rho if rho_l1 is None else rho_l1)
    sg = jnp.sqrt(jnp.asarray(rho2, dtype))

    nua = nu + ni          # augmented input [u, gamma~]
    ni_aug = 2 * ni        # [constraint rows (padded); -gamma~ <= 0]
    Naug = N + 1           # + the terminal-slack stage

    # ---- augmented statics (constants under jit) -------------------------
    stp = stat.per_stage(N)
    eyeni = jnp.eye(ni, dtype=dtype)
    Hx_aug = jnp.concatenate([stp.Hx, stat.HxN[None]], axis=0)
    Hu_one = jnp.zeros((nua, nua), dtype)
    Hu_one = Hu_one.at[:nu, :nu].set(
        stp.Hu[0] if stp.Hu.ndim == 3 else stp.Hu
    )
    # rho2 * gamma^2 = gamma~^2 in scaled coordinates -> Hessian block 2 I
    Hu_one = Hu_one.at[nu:, nu:].set(2 * eyeni)
    Hu_aug = jnp.broadcast_to(Hu_one[None], (Naug, nua, nua))
    # the stage-N u-slot is an unconstrained dummy with the same 2R cost
    # (decoupled: B_N = 0, qu_N u-part = 0 -> its optimum is exactly 0)

    # stage k < N rows: [Gx x + Gu u - gamma <= h_k ; -gamma~ <= 0]
    Gx_stage = jnp.concatenate([stp.Gx, jnp.zeros((N, ni, nx), dtype)], axis=1)
    Gu_stage = jnp.concatenate(
        [
            jnp.concatenate([stp.Gu, -eyeni[None].repeat(N, 0) / sg], axis=2),
            jnp.concatenate(
                [jnp.zeros((N, ni, nu), dtype), -eyeni[None].repeat(N, 0)],
                axis=2,
            ),
        ],
        axis=1,
    )
    # stage N rows: [Gf x - gamma_f <= hf (pad ni - ni_f trivial); -gamma~ <= 0]
    Gx_term = jnp.zeros((ni_aug, nx), dtype).at[:ni_f].set(stat.Gf)
    Gu_term = jnp.zeros((ni_aug, nua), dtype)
    Gu_term = Gu_term.at[:ni_f, nu : nu + ni_f].set(-jnp.eye(ni_f, dtype=dtype) / sg)
    Gu_term = Gu_term.at[ni:, nu:].set(-eyeni)

    Gx_all = jnp.concatenate([Gx_stage, Gx_term[None]], axis=0)
    Gu_all = jnp.concatenate([Gu_stage, Gu_term[None]], axis=0)

    # free successor state of the terminal-slack stage: one trivial row
    Gf_dummy = jnp.zeros((1, nx), dtype)

    stat_aug = QPStatics(
        Hx=Hx_aug, Hu=Hu_aug, HxN=jnp.zeros((nx, nx), dtype),
        Gx=Gx_all, Gu=Gu_all, Gf=Gf_dummy,
    )

    # ---- per-solve data --------------------------------------------------
    A_aug = jnp.concatenate([A, jnp.eye(nx, dtype=dtype)[None]], axis=0)
    B_aug = jnp.concatenate(
        [
            jnp.concatenate([B, jnp.zeros((N, nx, ni), dtype)], axis=2),
            jnp.zeros((1, nx, nua), dtype),
        ],
        axis=0,
    )
    c_aug = jnp.concatenate([c, jnp.zeros((1, nx), dtype)], axis=0)

    h_stage = jnp.concatenate([h, jnp.zeros((N, ni), dtype)], axis=1)
    h_term = jnp.concatenate(
        [hf, jnp.ones((ni - ni_f,), dtype), jnp.zeros((ni,), dtype)]
    )
    h_aug = jnp.concatenate([h_stage, h_term[None]], axis=0)

    qx_aug = jnp.concatenate([qx, jnp.zeros((1, nx), dtype)], axis=0)
    # L1 exact-penalty term on all slacks: rho1 * gamma = (rho1 / sg) gamma~
    qu_aug = jnp.zeros((Naug, nua), dtype)
    qu_aug = qu_aug.at[:N, :nu].set(qu)
    qu_aug = qu_aug.at[:, nu:].set(rho1 / sg)

    data = QPData(
        A=A_aug, B=B_aug, c=c_aug, qx=qx_aug, qu=qu_aug,
        h=h_aug, hf=jnp.ones((1,), dtype), xinit=jnp.asarray(xinit, dtype),
    )
    sol = solve_qp(stat_aug, data, ipm)

    U_dev = sol.U[:N, :nu]
    gamma = sol.U[:N, nu:] / sg
    gamma_f = sol.U[N, nu : nu + ni_f] / sg
    finite = jnp.all(jnp.isfinite(sol.X)) & jnp.all(jnp.isfinite(sol.U))
    max_slack = jnp.maximum(jnp.max(gamma), jnp.max(gamma_f))
    return RestorationSolution(
        X=sol.X[: N + 1],
        U=U_dev,
        gamma=gamma,
        gamma_f=gamma_f,
        max_slack=max_slack,
        iters=sol.iters,
        # the slacked QP is always strictly feasible; accept any finite
        # iterate the IPM produced (a capped/inaccurate restoration step is
        # still a usable direction — the SCP criterion vets it downstream)
        success=finite,
    )
