"""Soft-constrained NLP solver: agreement with the hard SQP when constraints
are inactive, correct slack behavior when the problem is infeasible, and a
scipy cross-check on the full soft objective."""

import jax.numpy as jnp
import numpy as np
from scipy.optimize import minimize

from robust_nonlinear_mpc_tpu.models import Pendulum
from robust_nonlinear_mpc_tpu.solvers.soft_nlp import NLPSoftSolver, soft_nlp_solve
from robust_nonlinear_mpc_tpu.solvers.sqp import sqp_solve


def test_soft_matches_hard_when_feasible():
    """With inactive constraints the slacks vanish and the soft solution
    equals the hard-constrained one."""
    m = Pendulum()
    N = 6
    Q, R, Qf = np.eye(4), np.eye(1), 10 * np.eye(4)
    x0 = jnp.asarray([0.5, 0.5, 0.0, 0.0])

    hard = sqp_solve(m, N, Q, R, Qf, x0)
    soft = soft_nlp_solve(m, N, Q, R, Qf, x0, rho_soft=1e6, rho_soft_l1=1e6)
    assert bool(soft.success)
    assert float(jnp.max(soft.gamma)) < 1e-7
    assert float(jnp.max(soft.gamma_f)) < 1e-7
    np.testing.assert_allclose(np.asarray(soft.U), np.asarray(hard.U), atol=1e-5)
    np.testing.assert_allclose(
        float(soft.cost_nominal), float(hard.cost), rtol=1e-6
    )


def test_soft_slacks_absorb_infeasibility():
    """Squeeze the velocity bound below what the initial state needs: the
    hard problem is infeasible, the soft one must still solve with active
    slacks on the violated rows."""
    m = Pendulum()
    # make |x2 (cart velocity)| <= 0.2 while starting at 0.5
    x_max = np.array([10.0, 0.2, 10.0, 10.0])
    m.replace_constraints(x_max, -x_max, np.array([5.0]), np.array([-5.0]),
                          x_max, -x_max)
    N = 6
    Q, R, Qf = np.eye(4), np.eye(1), 10 * np.eye(4)
    x0 = jnp.asarray([0.0, 0.5, 0.0, 0.0])

    soft = soft_nlp_solve(m, N, Q, R, Qf, x0, rho_soft=1e4, rho_soft_l1=1e4)
    assert bool(soft.success)
    assert float(soft.feas) < 1e-7
    # x_0 violates the bound by 0.3 -> stage-0 slack must be ~0.3
    gam = np.asarray(soft.gamma)
    assert gam.max() > 0.29
    # the solution respects the softened constraints: Gz - g <= gamma
    G, g = np.asarray(m.G), np.asarray(m.g)
    z = np.concatenate([np.asarray(soft.X[:N]), np.asarray(soft.U)], axis=1)
    viol = z @ G.T - g[None]
    assert np.max(viol - gam) < 1e-6


def test_soft_vs_scipy_oracle():
    m = Pendulum()
    x_max = np.array([10.0, 0.35, 10.0, 10.0])
    m.replace_constraints(x_max, -x_max, np.array([5.0]), np.array([-5.0]),
                          x_max, -x_max)
    N = 4
    Q, R, Qf = np.eye(4), np.eye(1), 10 * np.eye(4)
    x0 = np.array([0.0, 0.5, 0.0, 0.0])
    rho = 1e3

    soft = soft_nlp_solve(m, N, Q, R, Qf, jnp.asarray(x0), rho_soft=rho, rho_soft_l1=rho)
    assert bool(soft.success)

    # scipy oracle on y = [vec X; vec U; vec Gamma; gamma_f]
    nx, nu, ni, nif = 4, 1, 10, 8
    nX, nU, nG = nx * (N + 1), nu * N, ni * N
    G, g = np.asarray(m.G), np.asarray(m.g)
    Gf, gf = np.asarray(m.Gf), np.asarray(m.gf)

    def unpack(y):
        X = y[:nX].reshape(N + 1, nx)
        U = y[nX : nX + nU].reshape(N, nu)
        Gam = y[nX + nU : nX + nU + nG].reshape(N, ni)
        gf_ = y[nX + nU + nG :]
        return X, U, Gam, gf_

    def cost(y):
        X, U, Gam, gamf = unpack(y)
        return float(
            np.sum(X[:N] @ Q * X[:N]) + np.sum(U @ R * U) + X[N] @ Qf @ X[N]
            + rho * (np.sum(Gam**2) + np.sum(gamf**2)) + rho * np.sum(Gam)
        )

    def eq(y):
        X, U, Gam, gamf = unpack(y)
        f = np.stack([np.asarray(m.ddyn(jnp.asarray(X[k]), jnp.asarray(U[k]))) for k in range(N)])
        return np.concatenate([(X[1:] - f).ravel(), X[0] - x0])

    def ineq(y):
        X, U, Gam, gamf = unpack(y)
        z = np.concatenate([X[:N], U], axis=1)
        return np.concatenate(
            [
                (g[None] + Gam - z @ G.T).ravel(),
                Gam.ravel(),
                gf + gamf - Gf @ X[N],
                gamf,
            ]
        )

    # seed SLSQP from our solution: it must confirm optimality (no meaningful
    # improvement) — SLSQP cannot reliably solve this from scratch
    y_ours = np.concatenate(
        [
            np.asarray(soft.X).ravel(),
            np.asarray(soft.U).ravel(),
            np.asarray(soft.gamma).ravel(),
            np.asarray(soft.gamma_f).ravel(),
        ]
    )
    res = minimize(cost, y_ours, constraints=[{"type": "eq", "fun": eq},
                                              {"type": "ineq", "fun": ineq}],
                   method="SLSQP", options={"maxiter": 800, "ftol": 1e-12})
    ours = cost(y_ours)
    assert np.max(np.abs(eq(y_ours))) < 1e-7
    assert np.min(ineq(y_ours)) > -1e-7
    if res.status == 0:
        # scipy may not improve on our optimum by more than solver noise
        assert res.fun > ours - 1e-4 * (1 + abs(ours))
