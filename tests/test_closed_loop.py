"""Closed-loop integration: parity driver vs the fully-jitted batched scan,
plus the reference pendulum configuration end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np

from robust_nonlinear_mpc_tpu.models import Pendulum
from robust_nonlinear_mpc_tpu.sim.closed_loop import (
    build_batched_closed_loop,
    run_closed_loop,
)
from robust_nonlinear_mpc_tpu.solvers.scp_sls import SCPSLSSolver


def _pendulum_solver(rti=3, inner=2, N=10):
    """The reference pendulum experiment config
    (expe/main_pendulum_robust_closed_loop.py:25-48), shortened horizon."""
    m = Pendulum()
    m.E = 0.003 * np.eye(4)
    Q, R, Qf = np.eye(4), np.eye(1), 10 * np.eye(4)
    solver = SCPSLSSolver(
        N, Q, R, m, Qf,
        Q_reg=1e3 * np.eye(4), R_reg=1e3 * np.eye(1), Q_reg_f=1e4 * np.eye(4),
        rti=rti, fast_sls_rti_steps=inner,
    )
    return m, solver


def test_parity_driver_runs_and_logs():
    m, solver = _pendulum_solver()
    x0 = np.array([0.5, 0.5, 0.0, 0.0])
    out = run_closed_loop(m, solver, x0, sim_steps=6, noise="none")
    assert out["state_trajectory"].shape == (4, 6)
    assert out["input_trajectory"].shape == (1, 5)
    assert out["nominal_trajectory_x"].shape == (4, 11, 6)
    assert np.all(np.isfinite(out["state_trajectory"]))
    # constraints respected in closed loop
    assert np.max(np.abs(out["state_trajectory"])) <= 10.0
    assert np.max(np.abs(out["input_trajectory"])) <= 5.0
    # no blow-up: the controller keeps the cart-pole well inside its bounds
    assert np.max(np.abs(out["state_trajectory"])) < 2.0


def test_batched_scan_matches_host_driver():
    """The lax.scan closed loop must produce the same u-sequence as the
    stateful host-loop driver (same math, different orchestration)."""
    steps = 5
    m, solver_a = _pendulum_solver()
    x0 = np.array([0.5, 0.5, 0.0, 0.0])
    out = run_closed_loop(m, solver_a, x0, sim_steps=steps, noise="none")

    m2, solver_b = _pendulum_solver()
    rollout = build_batched_closed_loop(solver_b, steps)
    W = jnp.zeros((steps, m2.nw))
    log = jax.jit(rollout)(jnp.asarray(x0), W)

    np.testing.assert_allclose(
        np.asarray(log.input_trajectory).T, out["input_trajectory"], atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(log.state_trajectory).T, out["state_trajectory"], atol=1e-8
    )


def test_batched_vmap_scenarios():
    steps = 4
    m, solver = _pendulum_solver()
    rollout = build_batched_closed_loop(solver, steps)
    rng = np.random.default_rng(0)
    B = 3
    x0s = jnp.asarray(
        np.array([0.4, 0.4, 0.0, 0.0])[None] + 0.05 * rng.standard_normal((B, 4))
    )
    Ws = jnp.asarray(2 * rng.random((B, steps, m.nw)) - 1)
    logs = jax.jit(jax.vmap(rollout))(x0s, Ws)
    assert logs.state_trajectory.shape == (B, steps, 4)
    assert np.all(np.isfinite(np.asarray(logs.state_trajectory)))
    # each scenario must match its individual rollout
    one = jax.jit(rollout)(x0s[1], Ws[1])
    np.testing.assert_allclose(
        np.asarray(logs.input_trajectory[1]), np.asarray(one.input_trajectory),
        atol=1e-8,
    )


def test_monte_carlo_validation_experiment(tmp_path, monkeypatch):
    """The MC tube-validation experiment: zero violations and full one-step
    tube containment on the pendulum under ||w||_inf <= 1."""
    import robust_nonlinear_mpc_tpu.expe.main_monte_carlo_validation as mc

    monkeypatch.setattr(mc, "FOLDER", str(tmp_path))
    path = mc.generate("pendulum", scenarios=16, steps=3, device="cpu")
    d = np.load(path, allow_pickle=True)
    assert int(d["n_violations"]) == 0
    assert float(d["tube_containment_rate"]) == 1.0
    assert float(d["success_rate"]) == 1.0


def test_batched_until_convergence_matches_host_driver():
    """rti = -1 (the reference's until-convergence default) in the batched
    scan: the lax.while_loop SCP loop must reproduce the host driver's
    u-sequence and report success on every converged step."""
    steps = 3
    m, solver_a = _pendulum_solver(rti=-1, inner=0, N=8)
    solver_a.opts = solver_a.opts._replace(
        epsilon_convergence=1e-7, max_iter_scp=12, verbose=False
    )
    x0 = np.array([0.5, 0.5, 0.0, 0.0])
    out = run_closed_loop(m, solver_a, x0, sim_steps=steps, noise="none")

    m2, solver_b = _pendulum_solver(rti=-1, inner=0, N=8)
    solver_b.opts = solver_b.opts._replace(
        epsilon_convergence=1e-7, max_iter_scp=12, verbose=False
    )
    rollout = build_batched_closed_loop(solver_b, steps)
    log = jax.jit(rollout)(jnp.asarray(x0), jnp.zeros((steps, m2.nw)))

    assert bool(np.all(np.asarray(log.success)))
    np.testing.assert_allclose(
        np.asarray(log.input_trajectory).T, out["input_trajectory"], atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(log.state_trajectory).T, out["state_trajectory"], atol=1e-7
    )
