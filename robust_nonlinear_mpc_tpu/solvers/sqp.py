"""Multiple-shooting SQP solver for the nominal trajectory NLP.

TPU-native replacement for the reference's IPOPT-backed nominal solver
(`solver/nlp.py:8-217`): the same multiple-shooting problem

    min  sum_k x_k' Q x_k + u_k' R u_k + x_N' Qf x_N
    s.t. x_{k+1} = f(x_k, u_k),  x_0 = x0,
         G [x_k; u_k] <= g,  Gf x_N <= gf

is solved by sequential quadratic programming where each subproblem is the
horizon-structured Riccati-KKT QP (`ops/qp_ipm.py`). Because the cost is
quadratic and the inequality constraints are linear, the QP model is *exact*
except for the dynamics defects — classic Gauss-Newton multiple shooting.
Globalization: an l1 merit function on the dynamics defects with a
backtracking line search evaluated in parallel over the step-size grid
(vmap), penalty weight adapted from the QP's dynamics multipliers.

The whole solve is one jitted `lax.while_loop`; it vmaps over batches of
initial conditions.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from robust_nonlinear_mpc_tpu.ops.qp_ipm import (
    IPMOptions,
    QPData,
    QPStatics,
    solve_qp,
)
from robust_nonlinear_mpc_tpu.utils.numerics import mm, mv


class SQPOptions(NamedTuple):
    max_iter: int = 60
    tol_step: float = 1e-9     # full-step infinity norm
    tol_feas: float = 1e-9     # dynamics defect infinity norm
    merit_rho_min: float = 1e2
    n_alphas: int = 14         # line-search grid 1, 1/2, ..., 2^-(n-1)
    ipm: IPMOptions = IPMOptions(max_iter=40, tol=1e-10)


class SQPSolution(NamedTuple):
    X: jax.Array        # (N+1, nx)
    U: jax.Array        # (N, nu)
    cost: jax.Array
    feas: jax.Array     # final max dynamics defect
    step_norm: jax.Array
    iters: jax.Array
    success: jax.Array
    lam: jax.Array      # (N, ni) stage ineq duals at the final QP
    lam_f: jax.Array
    dual_vec: jax.Array  # packed multipliers (diagnostic)


def _traj_cost(X, U, Q, R, Qf):
    N = U.shape[0]
    return (
        jnp.sum(mm(X[:N], Q.T) * X[:N])
        + jnp.sum(mm(U, R.T) * U)
        + jnp.sum(X[N] * mv(Qf, X[N]))
    )


def sqp_solve(
    model,
    N: int,
    Q, R, Qf,
    x0: jax.Array,
    X_init: jax.Array | None = None,
    U_init: jax.Array | None = None,
    opts: SQPOptions = SQPOptions(),
) -> SQPSolution:
    """Solve the nominal NLP. `model` provides ddyn/linearize_traj and the
    constraint polytope (G, g, Gf, gf) — see models/base.py.

    With no guess, starts from the zero trajectory like the reference's IPOPT
    setup (nlp.py:215 `y0 = zeros`).
    """
    nx, nu, ni = model.nx, model.nu, model.ni

    x0 = jnp.asarray(x0)
    dtype = x0.dtype

    # dtype-aware tolerance floors: the f64-grade defaults (1e-9 step/feas,
    # 1e-10 relative IPM KKT) are unreachable in f32 — without the floors the
    # very first QP reports failure and the SQP aborts after ONE Gauss-Newton
    # step with defects ~0.4 (measured; every f32 caller then either flew on
    # a one-step seed or fell through to the soft+polish path). Floors are
    # no-ops in f64.
    import numpy as _np

    _eps = float(_np.finfo(_np.dtype(dtype.name)).eps)
    tol_step = max(float(opts.tol_step), 1e3 * _eps)
    tol_feas = max(float(opts.tol_feas), 1e3 * _eps)
    ipm_opts = opts.ipm
    if ipm_opts.tol < 30 * _eps:
        ipm_opts = ipm_opts._replace(tol=30 * _eps)
    Q = jnp.asarray(Q, dtype)
    R = jnp.asarray(R, dtype)
    Qf = jnp.asarray(Qf, dtype)
    G = jnp.asarray(model.G, dtype)
    g = jnp.asarray(model.g, dtype)
    Gf = jnp.asarray(model.Gf, dtype)
    gf = jnp.asarray(model.gf, dtype)
    Gx, Gu = G[:, :nx], G[:, nx:]

    stat = QPStatics(Hx=2 * Q, Hu=2 * R, HxN=2 * Qf, Gx=Gx, Gu=Gu, Gf=Gf)

    X0 = jnp.zeros((N + 1, nx), dtype) if X_init is None else jnp.asarray(X_init, dtype)
    U0 = jnp.zeros((N, nu), dtype) if U_init is None else jnp.asarray(U_init, dtype)

    alphas = 0.5 ** jnp.arange(opts.n_alphas, dtype=dtype)

    def defects(X, U):
        f = jax.vmap(model.ddyn)(X[:N], U)
        return f - X[1 : N + 1]

    def merit(X, U, rho):
        d = defects(X, U)
        init_gap = jnp.sum(jnp.abs(X[0] - x0))
        return _traj_cost(X, U, Q, R, Qf) + rho * (jnp.sum(jnp.abs(d)) + init_gap)

    def body(carry):
        X, U, rho, it, done, success, step_norm, feas, lam, lam_f, nu_dyn = carry

        A, B, c = model.linearize_traj(X, U)
        h = g[None] - mm(X[:N], Gx.T) - mm(U, Gu.T)
        hf = gf - mv(Gf, X[N])
        qx = jnp.concatenate([2 * mm(X[:N], Q.T), (2 * mv(Qf, X[N]))[None]], axis=0)
        qu = 2 * mm(U, R.T)

        data = QPData(A=A, B=B, c=c, qx=qx, qu=qu, h=h, hf=hf, xinit=x0 - X[0])
        sol = solve_qp(stat, data, ipm_opts)

        # merit penalty: dominate the dynamics multipliers
        rho_n = jnp.maximum(
            jnp.maximum(rho, opts.merit_rho_min),
            2.0 * jnp.maximum(jnp.max(jnp.abs(sol.nu_dyn)), jnp.max(jnp.abs(sol.nu_init))),
        )

        m0 = merit(X, U, rho_n)

        def eval_alpha(a):
            return merit(X + a * sol.X, U + a * sol.U, rho_n)

        mvals = jax.vmap(eval_alpha)(alphas)
        # largest alpha achieving sufficient decrease; fall back to best merit
        dec = mvals < m0 - 1e-4 * alphas * jnp.maximum(m0 - jnp.min(mvals), 0.0)
        first_ok = jnp.argmax(dec)  # first True (alphas sorted descending)
        any_ok = jnp.any(dec)
        a_idx = jnp.where(any_ok, first_ok, jnp.argmin(mvals))
        a = alphas[a_idx]

        X_n = X + a * sol.X
        U_n = U + a * sol.U

        step_n = jnp.maximum(jnp.max(jnp.abs(sol.X)), jnp.max(jnp.abs(sol.U)))
        feas_n = jnp.max(jnp.abs(defects(X_n, U_n)))
        conv = (step_n < tol_step) & (feas_n < tol_feas) & sol.success
        fail = ~sol.success

        done_n = done | conv | fail
        success_n = jnp.where(done, success, conv)

        sel = lambda new, old: jnp.where(done, old, new)
        return (
            sel(X_n, X), sel(U_n, U), sel(rho_n, rho), it + 1,
            done_n, success_n,
            sel(step_n, step_norm), sel(feas_n, feas),
            sel(sol.lam, lam), sel(sol.lam_f, lam_f), sel(sol.nu_dyn, nu_dyn),
        )

    def cond(carry):
        it = carry[3]
        done = carry[4]
        return (~done) & (it < opts.max_iter)

    init = (
        X0, U0, jnp.asarray(opts.merit_rho_min, dtype), jnp.array(0, jnp.int32),
        jnp.array(False), jnp.array(False),
        jnp.asarray(jnp.inf, dtype), jnp.asarray(jnp.inf, dtype),
        jnp.zeros((N, ni), dtype), jnp.zeros((model.ni_f,), dtype),
        jnp.zeros((N, nx), dtype),
    )
    X, U, rho, iters, done, success, step_norm, feas, lam, lam_f, nu_dyn = (
        lax.while_loop(cond, body, init)
    )

    # exhausted iterations without explicit failure: accept if feasible
    # enough. The step bound is 10x looser than the in-loop criterion: in
    # f32 the line search chatters at step norms ~5e-4 near the optimum
    # (merit differences below rounding noise) while defects sit at 1e-5 —
    # those iterates are converged for every practical purpose.
    success = success | (
        (feas < max(1e-6, tol_feas)) & (step_norm < max(1e-6, 10 * tol_step))
    )

    dual_vec = jnp.concatenate([nu_dyn.reshape(-1), lam.reshape(-1), lam_f])
    return SQPSolution(
        X=X, U=U,
        cost=_traj_cost(X, U, Q, R, Qf),
        feas=feas, step_norm=step_norm, iters=iters, success=success,
        lam=lam, lam_f=lam_f, dual_vec=dual_vec,
    )
