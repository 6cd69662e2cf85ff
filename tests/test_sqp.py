"""SQP nominal solver vs scipy SLSQP on the full nonlinear NLP."""

import jax.numpy as jnp
import numpy as np
from scipy.optimize import minimize

from robust_nonlinear_mpc_tpu.models import Pendulum
from robust_nonlinear_mpc_tpu.solvers.sqp import SQPOptions, sqp_solve


def _scipy_nlp(m, N, Q, R, Qf, x0):
    """Trusted oracle: multiple-shooting NLP via SLSQP over y = [vec X; vec U]."""
    nx, nu = m.nx, m.nu

    def unpack(y):
        X = y[: nx * (N + 1)].reshape(N + 1, nx)
        U = y[nx * (N + 1) :].reshape(N, nu)
        return X, U

    def cost(y):
        X, U = unpack(y)
        return float(
            np.sum(X[:N] @ Q * X[:N]) + np.sum(U @ R * U) + X[N] @ Qf @ X[N]
        )

    def dyn_con(y):
        X, U = unpack(y)
        f = np.stack(
            [np.asarray(m.ddyn(jnp.asarray(X[k]), jnp.asarray(U[k]))) for k in range(N)]
        )
        return np.concatenate([(X[1:] - f).ravel(), X[0] - x0])

    G, g = np.asarray(m.G), np.asarray(m.g)
    Gf_, gf = np.asarray(m.Gf), np.asarray(m.gf)

    def ineq_con(y):
        X, U = unpack(y)
        z = np.concatenate([X[:N], U], axis=1)
        vals = g[None] - z @ G.T
        return np.concatenate([vals.ravel(), gf - Gf_ @ X[N]])

    y0 = np.zeros(nx * (N + 1) + nu * N)
    res = minimize(
        cost, y0,
        constraints=[{"type": "eq", "fun": dyn_con}, {"type": "ineq", "fun": ineq_con}],
        method="SLSQP", options={"maxiter": 500, "ftol": 1e-12},
    )
    X, U = unpack(res.x)
    return X, U, res.fun, res.status


def test_sqp_matches_scipy_pendulum():
    m = Pendulum()
    N = 6
    Q, R, Qf = np.eye(4), np.eye(1), 10 * np.eye(4)
    x0 = np.array([0.5, 0.5, 0.2, 0.0])

    sol = sqp_solve(m, N, Q, R, Qf, jnp.asarray(x0))
    assert bool(sol.success)
    assert float(sol.feas) < 1e-8

    X_ref, U_ref, f_ref, status = _scipy_nlp(m, N, Q, R, Qf, x0)
    assert status == 0
    assert abs(float(sol.cost) - f_ref) < 1e-5 * (1 + abs(f_ref))
    np.testing.assert_allclose(np.asarray(sol.U), U_ref, atol=2e-4)


def test_sqp_respects_constraints_tight():
    """Aggressive initial state: active input bound |u| <= 5."""
    m = Pendulum()
    N = 10
    Q, R, Qf = np.eye(4), 0.01 * np.eye(1), 10 * np.eye(4)
    x0 = np.array([2.0, 3.0, 0.6, 0.0])
    sol = sqp_solve(m, N, Q, R, Qf, jnp.asarray(x0))
    assert bool(sol.success)
    U = np.asarray(sol.U)
    assert np.max(np.abs(U)) <= 5.0 + 1e-7
    X = np.asarray(sol.X)
    np.testing.assert_allclose(X[0], x0, atol=1e-10)
    assert float(sol.feas) < 1e-8


def test_sqp_warm_start_guess():
    m = Pendulum()
    N = 6
    Q, R, Qf = np.eye(4), np.eye(1), 10 * np.eye(4)
    x0 = np.array([0.3, -0.2, 0.1, 0.0])
    cold = sqp_solve(m, N, Q, R, Qf, jnp.asarray(x0))
    warm = sqp_solve(
        m, N, Q, R, Qf, jnp.asarray(x0), X_init=cold.X, U_init=cold.U,
        opts=SQPOptions(max_iter=5),
    )
    assert bool(warm.success)
    assert int(warm.iters) <= 2
    np.testing.assert_allclose(np.asarray(warm.U), np.asarray(cold.U), atol=1e-8)


def test_sqp_f32_cold_start_converges():
    """f32 (the TPU throughput dtype) must not trip the f64-grade default
    tolerances: without the dtype-aware floors the very first QP reports
    failure and the SQP aborts after ONE Gauss-Newton step with defects
    ~0.4 — this pins the floors (sqp_solve) end-to-end on the rocket."""
    from robust_nonlinear_mpc_tpu.models import Rocket

    m = Rocket()
    N = 10
    Q, R, Qf = np.eye(m.nx), np.eye(m.nu), 10 * np.eye(m.nx)
    rng = np.random.default_rng(3)
    x0 = jnp.asarray(
        0.05 * rng.standard_normal(m.nx), jnp.float32
    )
    sol = sqp_solve(m, N, Q, R, Qf, x0)
    assert sol.X.dtype == jnp.float32
    assert bool(sol.success)
    assert int(sol.iters) >= 2          # actually iterated, not aborted
    assert float(sol.feas) < 1e-4       # f32-grade multiple-shooting defect
