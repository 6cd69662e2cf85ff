"""QP kernel validation: KKT optimality, scipy cross-check, batching."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robust_nonlinear_mpc_tpu.ops.packing import pack_primal
from robust_nonlinear_mpc_tpu.ops.qp_ipm import IPMOptions, solve_qp

from tests.helpers import random_qp
from tests.oracles import dense_qp_reference, densify_qp

OPTS = IPMOptions(max_iter=50, tol=1e-10)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_qp_kkt_and_feasibility(seed):
    stat, data = random_qp(seed=seed)
    sol = jax.jit(solve_qp, static_argnums=2)(stat, data, OPTS)
    assert bool(sol.success), f"kkt={float(sol.kkt_res):.2e}"
    assert float(sol.kkt_res) < 1e-8

    X, U = np.asarray(sol.X), np.asarray(sol.U)
    A, B, c = np.asarray(data.A), np.asarray(data.B), np.asarray(data.c)
    # dynamics + initial condition
    np.testing.assert_allclose(X[0], np.asarray(data.xinit), atol=1e-9)
    for k in range(U.shape[0]):
        np.testing.assert_allclose(X[k + 1], A[k] @ X[k] + B[k] @ U[k] + c[k], atol=1e-7)
    # inequality feasibility
    Gx, Gu = np.asarray(stat.Gx), np.asarray(stat.Gu)
    slack = np.asarray(data.h) - X[:-1] @ Gx.T - U @ Gu.T
    assert slack.min() > -1e-7
    slack_f = np.asarray(data.hf) - np.asarray(stat.Gf) @ X[-1]
    assert slack_f.min() > -1e-7
    # dual feasibility + complementary slackness
    lam = np.asarray(sol.lam)
    assert lam.min() > -1e-9
    assert np.max(np.abs(lam * slack)) < 1e-7


@pytest.mark.parametrize("seed", [0, 5])
def test_qp_matches_scipy(seed):
    stat, data = random_qp(seed=seed, N=5, nx=3, nu=2)
    sol = solve_qp(stat, data, OPTS)
    assert bool(sol.success)

    P, q, Aeq, beq, Ain, bin_ = densify_qp(stat, data)
    y = np.asarray(pack_primal(sol.X, sol.U))
    x_ref, f_ref, status = dense_qp_reference(P, q, Aeq, beq, Ain, bin_, x0=y)
    assert status == 0
    # objective agreement is the robust check (SLSQP primal accuracy ~1e-8)
    f_ours = float(y @ P @ y + q @ y)
    assert abs(f_ours - f_ref) < 1e-6 * (1 + abs(f_ref))
    np.testing.assert_allclose(y, x_ref, atol=5e-5)
    np.testing.assert_allclose(float(sol.cost), f_ours, rtol=1e-10, atol=1e-10)


def test_qp_tight_constraints_active():
    """Constraints forced active: solution must ride the boundary."""
    stat, data = random_qp(seed=7, feasible_margin=-0.05)
    # shrink bounds so the unconstrained optimum is cut off but keep feasible
    data = data._replace(
        h=jnp.maximum(data.h, 0.05), hf=jnp.maximum(data.hf, 0.05)
    )
    sol = solve_qp(stat, data, OPTS)
    assert bool(sol.success)
    Gx, Gu = np.asarray(stat.Gx), np.asarray(stat.Gu)
    X, U = np.asarray(sol.X), np.asarray(sol.U)
    slack = np.asarray(data.h) - X[:-1] @ Gx.T - U @ Gu.T
    assert slack.min() > -1e-7

    P, q, Aeq, beq, Ain, bin_ = densify_qp(stat, data)
    y = np.asarray(pack_primal(sol.X, sol.U))
    x_ref, f_ref, status = dense_qp_reference(P, q, Aeq, beq, Ain, bin_, x0=y)
    if status == 0:
        f_ours = float(y @ P @ y + q @ y)
        assert f_ours <= f_ref + 1e-6 * (1 + abs(f_ref))


def test_qp_vmap_batches():
    """vmapped solves must equal individual solves."""
    stats, datas = zip(*[random_qp(seed=s) for s in range(4)])
    stat = stats[0]  # same statics across batch
    batch = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *datas)
    f = jax.jit(jax.vmap(lambda d: solve_qp(stat, d, OPTS)))
    bsol = f(batch)
    for i, d in enumerate(datas):
        s = solve_qp(stat, d, OPTS)
        np.testing.assert_allclose(np.asarray(bsol.X[i]), np.asarray(s.X), atol=1e-6)
        np.testing.assert_allclose(np.asarray(bsol.U[i]), np.asarray(s.U), atol=1e-6)


@pytest.mark.parametrize("seed", [0, 1, 7])
def test_qp_condensed_matches_riccati(seed):
    """kkt="condensed" (scan-free Newton: state elimination + recursive
    block-Schur inverse) must reproduce the Riccati path: same solutions,
    duals, and — because the Newton steps are mathematically identical —
    the same iteration count."""
    opts_c = OPTS._replace(kkt="condensed")
    stat, data = random_qp(seed=seed)
    if seed == 7:  # force active constraints
        data = data._replace(
            h=jnp.maximum(data.h, 0.05), hf=jnp.maximum(data.hf, 0.05)
        )
    s1 = solve_qp(stat, data, OPTS)
    s2 = jax.jit(solve_qp, static_argnums=2)(stat, data, opts_c)
    assert bool(s1.success) and bool(s2.success)
    assert int(s1.iters) == int(s2.iters)
    np.testing.assert_allclose(np.asarray(s2.X), np.asarray(s1.X), atol=1e-9)
    np.testing.assert_allclose(np.asarray(s2.U), np.asarray(s1.U), atol=1e-9)
    np.testing.assert_allclose(np.asarray(s2.lam), np.asarray(s1.lam), atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(s2.nu_dyn), np.asarray(s1.nu_dyn), atol=1e-8
    )


def test_qp_condensed_vmap_and_shared_pre():
    """Condensed path under vmap, with the per-QP precompute passed in
    explicitly (shared across solves, as fast-SLS does)."""
    from robust_nonlinear_mpc_tpu.ops.qp_ipm import condense

    opts_c = OPTS._replace(kkt="condensed")
    stats, datas = zip(*[random_qp(seed=s) for s in range(3)])
    stat = stats[0]
    batch = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *datas)
    N = datas[0].A.shape[0]

    def solve_with_pre(d):
        pre = condense(stat.per_stage(N), d.A, d.B)
        return solve_qp(stat, d, opts_c, pre=pre)

    bsol = jax.jit(jax.vmap(solve_with_pre))(batch)
    for i, d in enumerate(datas):
        s = solve_qp(stat, d, OPTS)
        np.testing.assert_allclose(np.asarray(bsol.X[i]), np.asarray(s.X), atol=1e-6)
        np.testing.assert_allclose(np.asarray(bsol.U[i]), np.asarray(s.U), atol=1e-6)


def test_spd_inverse():
    from robust_nonlinear_mpc_tpu.utils.numerics import spd_inverse

    rng = np.random.default_rng(0)
    for n in (1, 2, 3, 5, 17, 60):
        M = rng.standard_normal((n, n + 3))
        H = jnp.asarray(M @ M.T + 0.1 * np.eye(n))
        Hi = np.asarray(spd_inverse(H))
        np.testing.assert_allclose(Hi @ np.asarray(H), np.eye(n), atol=1e-8)
    # batched
    Ms = rng.standard_normal((4, 8, 11))
    Hs = jnp.asarray(np.einsum("bij,bkj->bik", Ms, Ms) + 0.1 * np.eye(8))
    His = np.asarray(jax.vmap(spd_inverse)(Hs))
    for b in range(4):
        np.testing.assert_allclose(His[b] @ np.asarray(Hs[b]), np.eye(8), atol=1e-8)
