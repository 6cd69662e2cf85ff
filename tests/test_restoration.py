"""Feasibility restoration (solvers/restoration.py).

The capability the reference lacks at its own abort event
(`/root/reference/solver/fast_SLS_jit.py:302-312`): a soft-slacked solve of
the tightened deviation QP that is always feasible, so converged-mode SCP
can continue from a restored iterate instead of freezing the lane's plan.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import random_qp
from robust_nonlinear_mpc_tpu.ops.qp_ipm import IPMOptions, solve_qp
from robust_nonlinear_mpc_tpu.solvers.restoration import restoration_solve

IPM = IPMOptions(max_iter=60, tol=1e-9)


def _stage_margins(stat, data, X, U):
    """g-residual margins h - (Gx x + Gu u) per stage, and terminal."""
    m = data.h - (X[:-1] @ stat.Gx.T + U @ stat.Gu.T)
    mf = data.hf - stat.Gf @ X[-1]
    return m, mf


@pytest.mark.parametrize("seed", [0, 3])
def test_restoration_matches_hard_qp_when_feasible(seed):
    """On a feasible tightened QP the exact penalty drives all slacks to ~0
    and the restored solution matches the hard QP solution."""
    stat, data = random_qp(seed=seed)
    hard = solve_qp(stat, data, IPM)
    assert bool(hard.success)

    r = restoration_solve(
        stat, data.A, data.B, data.c, data.qx, data.qu,
        data.h, data.hf, data.xinit,
        rho=1e6, ipm=IPMOptions(max_iter=60, tol=1e-9),
    )
    assert bool(r.success)
    assert float(r.max_slack) < 1e-5, float(r.max_slack)
    assert float(jnp.max(jnp.abs(r.X - hard.X))) < 1e-4
    assert float(jnp.max(jnp.abs(r.U - hard.U))) < 1e-4


def test_restoration_recovers_infeasible_tightening():
    """Over-tighten some rows past capacity (the infeasible-forward
    fingerprint: tightened capacity < 0 while the untightened problem has
    margin): the hard QP fails, restoration returns a finite iterate whose
    slacks cover exactly the violated rows."""
    stat, data = random_qp(seed=1)
    hard0 = solve_qp(stat, data, IPM)
    assert bool(hard0.success)
    m, _ = _stage_margins(stat, data, hard0.X, hard0.U)

    # tighten EVERY stage's rows well past the optimal margins so no
    # feasible point remains (mirror rows of G make z-shifts unable to
    # restore all rows at once)
    h_bad = data.h - (np.asarray(m) + 1.0)
    data_bad = data._replace(h=jnp.asarray(h_bad))
    hard = solve_qp(stat, data_bad, IPM)
    assert not bool(hard.success), "over-tightened QP unexpectedly solvable"

    r = restoration_solve(
        stat, data.A, data.B, data.c, data.qx, data.qu,
        data_bad.h, data.hf, data.xinit,
        rho=1e6, ipm=IPMOptions(max_iter=60, tol=1e-9),
    )
    assert bool(r.success)
    assert bool(jnp.all(jnp.isfinite(r.X))) and bool(jnp.all(jnp.isfinite(r.U)))
    # slacks cover the violated rows: slacked margins are feasible
    mr, mrf = _stage_margins(stat, data_bad._replace(hf=data.hf), r.X, r.U)
    assert float(jnp.min(mr + r.gamma)) > -1e-5
    assert float(jnp.min(mrf + r.gamma_f)) > -1e-5
    # and the restoration used real slack (the problem WAS infeasible)
    assert float(r.max_slack) > 0.1


def test_restoration_vmaps():
    stat, data = random_qp(seed=2)
    B = 4
    hs = jnp.stack([data.h - 0.1 * i for i in range(B)])

    def one(h):
        return restoration_solve(
            stat, data.A, data.B, data.c, data.qx, data.qu,
            h, data.hf, data.xinit, rho=1e5,
            ipm=IPMOptions(max_iter=40, tol=1e-8),
        )

    out = jax.jit(jax.vmap(one))(hs)
    assert out.X.shape[0] == B
    assert bool(jnp.all(out.success))


def test_converged_loop_with_restoration_smoke():
    """The chunked converged driver compiles and runs with
    feasibility_restoration on (pendulum, tiny shapes); restored steps never
    fake success."""
    from robust_nonlinear_mpc_tpu.models import Pendulum
    from robust_nonlinear_mpc_tpu.sim.closed_loop import (
        build_chunked_converged_loop,
    )
    from robust_nonlinear_mpc_tpu.solvers.scp_sls import SCPSLSSolver

    m = Pendulum()
    m.E = 0.003 * np.eye(4)
    solver = SCPSLSSolver(
        8, np.eye(4), np.eye(1), m, 10 * np.eye(4),
        Q_reg=1e3 * np.eye(4), R_reg=1e3 * np.eye(1), Q_reg_f=1e4 * np.eye(4),
        rti=-1,
    )
    solver.opts = solver.opts._replace(
        verbose=False, epsilon_convergence=1e-6, max_iter_scp=10,
        sls_max_iter=20, feasibility_restoration=True,
        # stall damping compiles/vmaps with restoration; on cleanly-
        # converging lanes (these) it must not disturb convergence
        scp_stall_damping=0.5, stall_damping_after=6,
    )
    run = build_chunked_converged_loop(solver, 2, scp_per_dispatch=2)
    rng = np.random.default_rng(0)
    x0s = jnp.asarray([[0.3, 0.3, 0.0, 0.0], [0.5, 0.5, 0.0, 0.0]])
    Ws = jnp.asarray(2 * rng.random((2, 2, 4)) - 1)
    logs = run(x0s, Ws)
    assert logs.success.shape == (2, 2)
    # pendulum at these x0s converges; restoration must not disturb that
    assert bool(np.asarray(logs.success).all())
    assert np.isfinite(np.asarray(logs.input_trajectory)).all()
