"""Soft-constrained multiple-shooting NLP solver (the non-robust baseline).

TPU-native replacement for the reference's IPOPT-backed
`solver/nlp_soft_constraints.py:8-276` (class NLPSoftConstraints):

    min  sum_k x'Qx + u'Ru + xN'Qf xN
         + rho_soft (||Gamma||^2 + ||gamma_f||^2) + rho_soft_l1 sum(Gamma)
    s.t. x_{k+1} = f(x_k, u_k), x_0 = x0,
         G [x_k; u_k] - g <= gamma_k,   gamma_k >= 0
         Gf x_N - gf <= gamma_f,        gamma_f >= 0

(the L1 term applies to stage slacks only, matching the reference's objective
nlp_soft_constraints.py:226-235).

Formulation: the slacks are ordinary decision variables, so this is a
standard SQP whose subproblems run on the same Riccati-KKT IPM kernel using
its per-stage statics:

  * augmented input  u~ = [u, gamma~, gamma_f~]  at every stage, where
    gamma~ = sqrt(rho_soft) gamma — scaling the slacks by sqrt(rho) keeps the
    subproblem Hessian O(1)-conditioned despite rho ~ 1e6 penalties,
  * one extra "terminal-slack stage" k = N carrying Qf as its state cost and
    the terminal inequality  Gf x_N - gamma_f <= gf; its input/u-part is a
    costless virtual variable and its successor state x_{N+1} is free,
  * rows are padded with trivial 0 <= 1 constraints so all stages share one
    (ni_aug) shape — XLA-friendly static shapes, zero overhead at runtime.

Since cost and inequalities are exactly quadratic/linear in (z, Gamma), the
QP model is exact up to dynamics defects — same Gauss-Newton + l1-merit
line-search globalization as solvers/sqp.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from robust_nonlinear_mpc_tpu.ops.qp_ipm import (
    IPMOptions,
    QPData,
    QPStatics,
    solve_qp,
)
from robust_nonlinear_mpc_tpu.solvers.sqp import SQPOptions

# rho ~ 1e6 penalties put the achievable relative KKT accuracy near 1e-6 in
# f64 (dual magnitudes ~ rho); run the subproblem IPM at that scale. Step
# tolerances are in PHYSICAL units (see body: the sqrt(rho)-scaled slack
# components are rescaled before the norm), sized to the QP's achievable
# accuracy — ample for a baseline controller.
SOFT_SQP_OPTS = SQPOptions(
    ipm=IPMOptions(max_iter=120, tol=3e-8), tol_step=1e-5, tol_feas=1e-8
)


def soft_fallback_chunk(N: int) -> int:
    """Max lanes per vmapped soft-solve dispatch on this TPU backend.

    The backend kernel-faults above a lanes x horizon envelope (~960
    measured: 128 lanes ok at N <= 30, 34 faults at N = 60, 16 ok at
    N = 60). Single source of truth for every host-chunked fallback caller
    (bench.py, sim.closed_loop, tools.n60_probe)."""
    return max(16, min(128, 960 // max(int(N), 1)))


class SoftNLPSolution(NamedTuple):
    X: jax.Array          # (N+1, nx)
    U: jax.Array          # (N, nu)
    gamma: jax.Array      # (N, ni) stage slacks
    gamma_f: jax.Array    # (ni_f,)
    cost: jax.Array       # full objective incl. penalties
    cost_nominal: jax.Array  # quadratic trajectory cost only
    feas: jax.Array
    step_norm: jax.Array
    iters: jax.Array
    success: jax.Array


def soft_nlp_solve(
    model,
    N: int,
    Q, R, Qf,
    x0,
    rho_soft: float = 1e6,
    rho_soft_l1: float | None = None,
    X_init=None,
    U_init=None,
    opts: SQPOptions = SOFT_SQP_OPTS,
    prox: float = 0.0,
) -> SoftNLPSolution:
    """prox: proximal damping added to the subproblem Hessian (on the x/u
    blocks). The subproblem variable is the SQP deviation, so the damping
    vanishes at the fixpoint (delta -> 0) and does not bias the solution;
    it suppresses the active-set chattering that otherwise appears when the
    slack penalties are strongly active at degenerate boundaries."""
    nx, nu, ni, ni_f = model.nx, model.nu, model.ni, model.ni_f
    rho2 = float(rho_soft)
    rho1 = float(rho_soft if rho_soft_l1 is None else rho_soft_l1)

    x0 = jnp.asarray(x0)
    dtype = x0.dtype
    # numpy copies FIRST (Q/R/Qf may arrive as jnp values; the static
    # problem blocks below must be built with concrete numpy)
    Q_np = np.asarray(Q, float)
    R_np = np.asarray(R, float)
    Qf_np = np.asarray(Qf, float)
    Q = jnp.asarray(Q_np, dtype)
    R = jnp.asarray(R_np, dtype)
    Qf = jnp.asarray(Qf_np, dtype)
    G = np.asarray(model.G, float)
    g = np.asarray(model.g, float)
    Gf = np.asarray(model.Gf, float)
    gf = np.asarray(model.gf, float)

    sg = float(np.sqrt(rho2))     # slack scaling: gamma~ = sg * gamma
    nua = nu + ni + ni_f          # augmented input [u, gamma~, gamma_f~]
    ni_aug = 2 * ni + ni_f        # stage rows (see module docstring)
    Naug = N + 1                  # stages incl. the terminal-slack stage
    assert ni_f <= ni, "terminal rows are padded into the stage row budget"

    # ---- per-stage statics ----------------------------------------------
    Hx = np.stack([2 * Q_np] * N + [2 * Qf_np]) + 2 * prox * np.eye(nx)
    Hu_one = np.zeros((nua, nua))
    Hu_one[:nu, :nu] = 2 * R_np + 2 * prox * np.eye(nu)
    # rho2 * gamma^2 = gamma~^2  ->  Hessian block 2 I in scaled coordinates
    Hu_one[nu : nu + ni, nu : nu + ni] = 2 * np.eye(ni)
    Hu_one[nu + ni :, nu + ni :] = 2 * np.eye(ni_f)
    Hu = np.broadcast_to(Hu_one, (Naug, nua, nua))

    # stage k < N rows: [G z - gamma <= g; -gamma <= 0; -gamma_f <= 0]
    Gx_stage = np.zeros((ni_aug, nx))
    Gx_stage[:ni] = G[:, :nx]
    Gu_stage = np.zeros((ni_aug, nua))
    Gu_stage[:ni, :nu] = G[:, nx:]
    Gu_stage[:ni, nu : nu + ni] = -np.eye(ni) / sg   # gamma = gamma~ / sg
    Gu_stage[ni : 2 * ni, nu : nu + ni] = -np.eye(ni)
    Gu_stage[2 * ni :, nu + ni :] = -np.eye(ni_f)

    # stage N rows: [Gf x - gamma_f <= gf (pad to ni); -gamma <= 0; -gamma_f <= 0]
    Gx_term = np.zeros((ni_aug, nx))
    Gx_term[:ni_f] = Gf
    Gu_term = np.zeros((ni_aug, nua))
    Gu_term[:ni_f, nu + ni :] = -np.eye(ni_f) / sg
    Gu_term[ni : 2 * ni, nu : nu + ni] = -np.eye(ni)
    Gu_term[2 * ni :, nu + ni :] = -np.eye(ni_f)

    Gx_all = jnp.asarray(np.stack([Gx_stage] * N + [Gx_term]), dtype)
    Gu_all = jnp.asarray(np.stack([Gu_stage] * N + [Gu_term]), dtype)

    # free successor state of the terminal-slack stage: one trivial row
    Gf_dummy = jnp.zeros((1, nx), dtype)
    hf_dummy = jnp.ones((1,), dtype)

    stat = QPStatics(
        Hx=jnp.asarray(Hx, dtype), Hu=jnp.asarray(Hu, dtype),
        HxN=jnp.zeros((nx, nx), dtype),
        Gx=Gx_all, Gu=Gu_all, Gf=Gf_dummy,
    )

    # constant rhs per stage (absolute coordinates)
    h_stage = np.concatenate([g, np.zeros(ni), np.zeros(ni_f)])
    h_term = np.concatenate([gf, np.ones(ni - ni_f), np.zeros(ni), np.zeros(ni_f)])
    h_abs = jnp.asarray(np.stack([h_stage] * N + [h_term]), dtype)

    # constant linear cost (the slack L1 term), stage slacks only:
    # rho1 * gamma = (rho1 / sg) * gamma~
    q0_u = np.zeros((Naug, nua))
    q0_u[:N, nu : nu + ni] = rho1 / sg
    q0_u = jnp.asarray(q0_u, dtype)

    # ---- helpers ---------------------------------------------------------
    def split(Ut):
        """Return (u, gamma, gamma_f) in *physical* units."""
        return Ut[:, :nu], Ut[:, nu : nu + ni] / sg, Ut[N, nu + ni :] / sg

    def nominal_cost(X, Ut):
        u, gam, gam_f = split(Ut)
        return (
            jnp.sum((X[:N] @ Q.T) * X[:N])
            + jnp.sum((u[:N] @ R.T) * u[:N])
            + X[N] @ Qf @ X[N]
        )

    def full_cost(X, Ut):
        u, gam, gam_f = split(Ut)
        pen = rho2 * (jnp.sum(gam[:N] ** 2) + jnp.sum(gam_f**2)) + rho1 * jnp.sum(
            gam[:N]
        )
        return nominal_cost(X, Ut) + pen

    def defects(X, Ut):
        f = jax.vmap(lambda xk, uk: model.ddyn(xk, uk))(X[:Naug], Ut[:, :nu])
        return f - X[1 : Naug + 1]

    def merit(X, Ut, rho):
        return (
            full_cost(X, Ut)
            + rho * (jnp.sum(jnp.abs(defects(X, Ut))) + jnp.sum(jnp.abs(X[0] - x0)))
        )

    alphas = 0.5 ** jnp.arange(opts.n_alphas, dtype=dtype)

    def linearize(X, Ut):
        def one(xk, uk):
            f = lambda xx, uu: model.ddyn(xx, uu[:nu])
            A = jax.jacfwd(f, argnums=0)(xk, uk)
            B = jax.jacfwd(f, argnums=1)(xk, uk)
            return A, B, f(xk, uk)

        A, B, fx = jax.vmap(one)(X[:Naug], Ut)
        c = fx - X[1 : Naug + 1]
        return A, B, c

    def body(carry):
        X, Ut, rho, it, done, success, step_norm, feas, best_cost, stall = carry

        A, B, c = linearize(X, Ut)
        h = h_abs - (
            jnp.einsum("kri,ki->kr", Gx_all, X[:Naug]) + jnp.einsum("kru,ku->kr", Gu_all, Ut)
        )
        hf = hf_dummy - Gf_dummy @ X[Naug]
        qx = jnp.concatenate(
            [
                jnp.einsum("kij,kj->ki", stat.Hx, X[:Naug]),
                jnp.zeros((1, nx), dtype),
            ],
            axis=0,
        )
        qu = jnp.einsum("kij,kj->ki", stat.Hu, Ut) + q0_u

        data = QPData(A=A, B=B, c=c, qx=qx, qu=qu, h=h, hf=hf, xinit=x0 - X[0])
        sol = solve_qp(stat, data, opts.ipm)

        rho_n = jnp.maximum(
            jnp.maximum(rho, opts.merit_rho_min),
            2.0 * jnp.maximum(jnp.max(jnp.abs(sol.nu_dyn)), jnp.max(jnp.abs(sol.nu_init))),
        )
        m0 = merit(X, Ut, rho_n)
        mvals = jax.vmap(lambda a: merit(X + a * sol.X, Ut + a * sol.U, rho_n))(alphas)
        dec = mvals < m0 - 1e-4 * alphas * jnp.maximum(m0 - jnp.min(mvals), 0.0)
        a = alphas[jnp.where(jnp.any(dec), jnp.argmax(dec), jnp.argmin(mvals))]

        X_n = X + a * sol.X
        U_n = Ut + a * sol.U
        # step norm in PHYSICAL units: slack components carry a 1/sg factor
        du_phys = jnp.maximum(
            jnp.max(jnp.abs(sol.U[:, :nu])), jnp.max(jnp.abs(sol.U[:, nu:])) / sg
        )
        step_n = jnp.maximum(jnp.max(jnp.abs(sol.X)), du_phys)
        feas_n = jnp.max(jnp.abs(defects(X_n, U_n)))
        # convergence is judged on the iterate, not the QP's accuracy flag:
        # a marginally-unconverged subproblem whose step is already below
        # tolerance has done its job
        conv = (step_n < opts.tol_step) & (feas_n < opts.tol_feas)
        # merit stagnation: with strongly active slacks at degenerate
        # boundaries the SQP can limit-cycle between near-equivalent
        # iterates; stop once the penalized objective stops improving while
        # feasible (standard practical termination)
        cost_cmp = full_cost(X_n, U_n) + 1e6 * jnp.sum(jnp.abs(defects(X_n, U_n)))
        improved = cost_cmp < best_cost - 1e-9 * (1.0 + jnp.abs(best_cost))
        stall_n = jnp.where(improved, 0, stall + 1)
        best_n = jnp.minimum(best_cost, cost_cmp)
        # feasibility gate for the stagnation/fallback accepts: on strongly
        # active degenerate slack sets the QP accuracy floor leaves defects
        # ~1e-5 on states O(10) — physically negligible for the baseline
        conv_stag = (stall_n >= 3) & (feas_n < 1e-4)
        # only a non-finite step is fatal: a low-accuracy QP direction is
        # still useful (the l1-merit line search rejects bad directions and
        # the stagnation stop bounds the consequences); the IPM itself
        # already reverts non-finite iterates, this is belt-and-braces
        fail = ~(
            jnp.all(jnp.isfinite(sol.X)) & jnp.all(jnp.isfinite(sol.U))
        )
        done_n = done | conv | conv_stag | fail
        success_n = jnp.where(done, success, conv | conv_stag)

        sel = lambda new, old: jnp.where(done, old, new)
        return (
            sel(X_n, X), sel(U_n, Ut), sel(rho_n, rho), it + 1,
            done_n, success_n, sel(step_n, step_norm), sel(feas_n, feas),
            sel(best_n, best_cost), sel(stall_n, stall),
        )

    def cond(carry):
        return (~carry[4]) & (carry[3] < opts.max_iter)

    X0 = (
        jnp.zeros((Naug + 1, nx), dtype)
        if X_init is None
        else jnp.concatenate(
            [jnp.asarray(X_init, dtype), jnp.zeros((1, nx), dtype)], axis=0
        )
    )
    U0 = jnp.zeros((Naug, nua), dtype)
    if U_init is not None:
        U0 = U0.at[:N, :nu].set(jnp.asarray(U_init, dtype))

    init = (
        X0, U0, jnp.asarray(opts.merit_rho_min, dtype), jnp.array(0, jnp.int32),
        jnp.array(False), jnp.array(False),
        jnp.asarray(jnp.inf, dtype), jnp.asarray(jnp.inf, dtype),
        jnp.asarray(jnp.inf, dtype), jnp.array(0, jnp.int32),
    )
    X, Ut, rho, iters, done, success, step_norm, feas, _, _ = lax.while_loop(
        cond, body, init
    )
    success = success | ((feas < 1e-4) & (step_norm < 1e-1))

    u, gam, gam_f = split(Ut)
    return SoftNLPSolution(
        X=X[: N + 1],
        U=u[:N],
        gamma=gam[:N],
        gamma_f=gam_f,
        cost=full_cost(X, Ut),
        cost_nominal=nominal_cost(X, Ut),
        feas=feas,
        step_norm=step_norm,
        iters=iters,
        success=success,
    )


class NLPSoftSolver:
    """Stateful API mirroring the reference NLPSoftConstraints
    (nlp_soft_constraints.py:16: `NLPSoftConstraints(N, Q, R, m, Qf,
    rho_soft=1e6, rho_soft_l1=None)` and `.solve(x0, x_guess, u_guess)`)."""

    def __init__(self, N, Q, R, m, Qf, rho_soft=1e6, rho_soft_l1=None,
                 opts: SQPOptions = SOFT_SQP_OPTS,
                 prox_ladder=(0.0, 1.0, 10.0)):
        self.N = int(N)
        self.m = m
        self.Q, self.R, self.Qf = Q, R, Qf
        self.rho_soft = float(rho_soft)
        self.rho_soft_l1 = float(rho_soft if rho_soft_l1 is None else rho_soft_l1)
        self.opts = opts
        # escalation ladder: the undamped SQP is exact and fast on feasible
        # problems; when slacks are strongly active at degenerate boundaries
        # it can chatter, and a proximally-damped retry converges (the
        # damping vanishes at the fixpoint, see soft_nlp_solve)
        self._fns = [
            jax.jit(
                lambda x0, X_init, U_init, _p=p: soft_nlp_solve(
                    m, self.N, Q, R, Qf, x0,
                    rho_soft=self.rho_soft, rho_soft_l1=self.rho_soft_l1,
                    X_init=X_init, U_init=U_init, opts=opts, prox=_p,
                )
            )
            for p in prox_ladder
        ]
        dt = jnp.zeros(0).dtype
        self._zeroX = jnp.zeros((self.N + 1, m.nx), dt)
        self._zeroU = jnp.zeros((self.N, m.nu), dt)

    def solve(self, x0, x_guess=None, u_guess=None):
        X_init = self._zeroX if x_guess is None else jnp.asarray(np.asarray(x_guess).T)
        U_init = self._zeroU if u_guess is None else jnp.asarray(np.asarray(u_guess).T)
        x0v = jnp.asarray(x0).reshape(-1)
        sol = None
        for fn in self._fns:
            sol = fn(x0v, X_init, U_init)
            if bool(sol.success):
                break
        ok = bool(sol.success)
        return {
            "success": ok,
            "primal_x": np.asarray(sol.X).T,
            "primal_u": np.asarray(sol.U).T,
            "primal_gamma": np.concatenate(
                [np.asarray(sol.gamma).T.reshape(-1, order="F"), np.asarray(sol.gamma_f)]
            ),
            "cost": float(sol.cost),
            "cost_nominal": float(sol.cost_nominal),
            "iters": int(sol.iters),
        }
