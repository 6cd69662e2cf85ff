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


def test_failure_path_host_returns_last_accepted_iterate():
    """Reference semantics on a failed SCP iteration: the solver never
    accepts the failed iterate (SCP_SLS_jit.py:96-99 breaks without
    updating current_iteration_scp), so solve() must return the last
    ACCEPTED primal — here the nominal init, since the crippled IPM budget
    makes the very first SCP iteration fail. The batched while_loop path
    rejects failed iterates the same way; both must agree (ADVICE r2)."""
    from robust_nonlinear_mpc_tpu.ops.qp_ipm import IPMOptions

    m, solver = _pendulum_solver(rti=-1, inner=0, N=8)
    # 1 Mehrotra iteration at 1e-12 tolerance cannot converge -> QP reports
    # failure -> the SCP iteration is rejected on both paths
    crippled = solver.opts._replace(
        ipm=IPMOptions(max_iter=1, tol=1e-12), verbose=False,
        epsilon_convergence=1e-9, max_iter_scp=6,
    )
    solver.opts = crippled
    x0 = np.array([0.5, 0.5, 0.0, 0.0])
    assert solver.solve_nominal_trajectory(x0)
    X_nom = np.asarray(solver._X).copy()
    U_nom = np.asarray(solver._U).copy()
    sol = solver.solve(x0)
    assert not sol["success"]
    # host driver: primal is the last accepted iterate (the nominal init),
    # NOT the failed iterate
    np.testing.assert_allclose(sol["primal_x"], X_nom.T, atol=0)
    np.testing.assert_allclose(sol["primal_u"], U_nom.T, atol=0)

    # batched path: same rejection semantics -> U stays at the SQP nominal
    m2, solver_b = _pendulum_solver(rti=-1, inner=0, N=8)
    solver_b.opts = crippled
    rollout = build_batched_closed_loop(solver_b, 2)
    log = jax.jit(rollout)(jnp.asarray(x0), jnp.zeros((2, m2.nw)))
    assert not bool(np.asarray(log.success)[0])
    np.testing.assert_allclose(
        np.asarray(log.nominal_u)[0], U_nom, atol=1e-9
    )
    # failed-step backoffs are NaN sentinels, not fake zero tubes
    assert np.isnan(np.asarray(log.backoff_x)[0]).all()


def test_nominal_soft_fallback_noop_on_success():
    """nominal_soft_fallback must not change trajectories when the hard
    SQP succeeds (use_fb never triggers); the fallback's value case
    (wrong-basin/failed cold start at N=30 rocket) is measured in
    BASELINE.md — here we pin the no-op contract on a benign problem."""
    steps = 3
    m, solver_a = _pendulum_solver(rti=1, inner=1, N=8)
    x0 = np.array([0.5, 0.5, 0.0, 0.0])
    base = jax.jit(build_batched_closed_loop(solver_a, steps))(
        jnp.asarray(x0), jnp.zeros((steps, m.nw))
    )

    m2, solver_b = _pendulum_solver(rti=1, inner=1, N=8)
    solver_b.opts = solver_b.opts._replace(nominal_soft_fallback=True)
    fb = jax.jit(build_batched_closed_loop(solver_b, steps))(
        jnp.asarray(x0), jnp.zeros((steps, m2.nw))
    )
    assert bool(np.asarray(fb.success).all())
    np.testing.assert_allclose(
        np.asarray(fb.input_trajectory), np.asarray(base.input_trajectory),
        atol=0,
    )


def test_chunked_converged_matches_single_dispatch():
    """Bounded-dispatch until-convergence (VERDICT r3 item 1): the chunked
    driver must reproduce the single-dispatch converged closed loop exactly
    — per-lane SCP iteration sequences are identical, only the dispatch
    boundaries differ. Asserted across a batch with a lane mix (converging
    lanes + lanes that need multiple dispatches)."""
    from robust_nonlinear_mpc_tpu.sim.closed_loop import (
        build_chunked_converged_loop,
    )

    steps, B = 3, 4
    m, solver = _pendulum_solver(rti=-1, inner=0, N=8)
    solver.opts = solver.opts._replace(
        epsilon_convergence=1e-7, max_iter_scp=12, verbose=False
    )
    rng = np.random.default_rng(7)
    x0s = jnp.asarray(
        np.array([0.5, 0.5, 0.0, 0.0])[None] + 0.1 * rng.standard_normal((B, 4))
    )
    Ws = jnp.asarray(2 * rng.random((B, steps, m.nw)) - 1)

    rollout = build_batched_closed_loop(solver, steps)
    ref = jax.jit(jax.vmap(rollout))(x0s, Ws)

    for kpd in (1, 5):
        run = build_chunked_converged_loop(solver, steps, scp_per_dispatch=kpd)
        log = run(x0s, Ws)
        np.testing.assert_allclose(
            np.asarray(log.input_trajectory),
            np.asarray(ref.input_trajectory), atol=1e-10,
            err_msg=f"kpd={kpd} input mismatch",
        )
        np.testing.assert_allclose(
            np.asarray(log.state_trajectory),
            np.asarray(ref.state_trajectory), atol=1e-10,
        )
        np.testing.assert_array_equal(
            np.asarray(log.success), np.asarray(ref.success)
        )
        np.testing.assert_array_equal(
            np.asarray(log.qp_iters), np.asarray(ref.qp_iters)
        )
        # backoffs (the tube) must carry over dispatch boundaries identically
        np.testing.assert_allclose(
            np.asarray(log.backoff_x), np.asarray(ref.backoff_x), atol=1e-10
        )


def test_chunked_converged_soft_fallback_noop_on_success():
    """The chunked converged driver's HOST-CHUNKED soft fallback
    (closed_loop._apply_soft_fallback — applied outside the vmap, clear of
    the TPU kernel-fault envelope) must be a no-op when every lane's hard
    cold-start SQP succeeds; its value case (wrong-basin converged-mode
    lanes, converged_probe) is measured in BASELINE.md."""
    from robust_nonlinear_mpc_tpu.sim.closed_loop import (
        build_chunked_converged_loop,
    )

    steps, B = 2, 3
    m, solver = _pendulum_solver(rti=-1, inner=0, N=8)
    solver.opts = solver.opts._replace(
        epsilon_convergence=1e-7, max_iter_scp=12, verbose=False
    )
    rng = np.random.default_rng(3)
    x0s = jnp.asarray(
        np.array([0.5, 0.5, 0.0, 0.0])[None] + 0.1 * rng.standard_normal((B, 4))
    )
    Ws = jnp.asarray(2 * rng.random((B, steps, m.nw)) - 1)

    base = build_chunked_converged_loop(solver, steps)(x0s, Ws)

    m2, solver_fb = _pendulum_solver(rti=-1, inner=0, N=8)
    solver_fb.opts = solver_fb.opts._replace(
        epsilon_convergence=1e-7, max_iter_scp=12, verbose=False,
        nominal_soft_fallback=True,
    )
    fb = build_chunked_converged_loop(solver_fb, steps)(x0s, Ws)

    assert bool(np.asarray(fb.success).all())
    np.testing.assert_allclose(
        np.asarray(fb.input_trajectory), np.asarray(base.input_trajectory),
        atol=0,
    )
    np.testing.assert_allclose(
        np.asarray(fb.state_trajectory), np.asarray(base.state_trajectory),
        atol=0,
    )


def test_chunked_converged_multidevice_matches_single_device():
    """The converged-mode chunked driver under the 8-device virtual mesh
    must reproduce the single-device run exactly (VERDICT r4 item 5: the
    guarantee mode's multi-device correctness evidence — scenarios are
    independent, the scenario sharding must be a pure layout choice)."""
    from robust_nonlinear_mpc_tpu.parallel.mesh import scenario_mesh
    from robust_nonlinear_mpc_tpu.sim.closed_loop import (
        build_chunked_converged_loop,
    )

    steps, B = 2, 8
    m, solver = _pendulum_solver(rti=-1, inner=0, N=8)
    solver.opts = solver.opts._replace(
        epsilon_convergence=1e-7, max_iter_scp=12, verbose=False
    )
    rng = np.random.default_rng(11)
    x0s = jnp.asarray(
        np.array([0.5, 0.5, 0.0, 0.0])[None] + 0.1 * rng.standard_normal((B, 4))
    )
    Ws = jnp.asarray(2 * rng.random((B, steps, m.nw)) - 1)

    ref = build_chunked_converged_loop(solver, steps)(x0s, Ws)

    mesh = scenario_mesh()
    assert mesh.devices.size == 8, "conftest sets an 8-device virtual CPU mesh"
    sharded = build_chunked_converged_loop(solver, steps, mesh=mesh)(x0s, Ws)

    np.testing.assert_allclose(
        np.asarray(sharded.input_trajectory),
        np.asarray(ref.input_trajectory), atol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(sharded.state_trajectory),
        np.asarray(ref.state_trajectory), atol=1e-10,
    )
    np.testing.assert_array_equal(
        np.asarray(sharded.success), np.asarray(ref.success)
    )
    np.testing.assert_allclose(
        np.asarray(sharded.backoff_x), np.asarray(ref.backoff_x), atol=1e-10
    )


def test_chunked_converged_soft_fallback_rescues_failed_init():
    """The host-chunked soft fallback's GATHER/SCATTER path (only failed
    lanes solved, results scattered back — ADVICE r4): cripple the hard SQP
    so cold-start init fails on every lane, and check the fallback re-seeds
    them with the soft solution (finite trajectories, not frozen zeros)."""
    from robust_nonlinear_mpc_tpu.sim.closed_loop import (
        build_chunked_converged_loop,
    )
    from robust_nonlinear_mpc_tpu.ops.qp_ipm import IPMOptions
    from robust_nonlinear_mpc_tpu.solvers.sqp import SQPOptions

    steps, B = 1, 3
    m, solver = _pendulum_solver(rti=-1, inner=0, N=8)
    # 1 SQP iteration at an unreachable tolerance -> hard init reports
    # failure on every lane; the soft fallback (own default opts) succeeds
    solver.opts = solver.opts._replace(
        epsilon_convergence=1e-6, max_iter_scp=8, verbose=False,
        nominal_soft_fallback=True,
        sqp=SQPOptions(ipm=IPMOptions(max_iter=1, tol=1e-14),
                       tol_step=1e-14, tol_feas=1e-14, max_iter=1),
    )
    rng = np.random.default_rng(5)
    x0s = jnp.asarray(
        np.array([0.5, 0.5, 0.0, 0.0])[None] + 0.1 * rng.standard_normal((B, 4))
    )
    Ws = jnp.asarray(2 * rng.random((B, steps, m.nw)) - 1)
    logs = build_chunked_converged_loop(solver, steps)(x0s, Ws)
    assert np.isfinite(np.asarray(logs.state_trajectory)).all()
    # the re-seeded nominal must actually start at each lane's x0 (a frozen
    # zero plan would not)
    np.testing.assert_allclose(
        np.asarray(logs.nominal_x)[:, 0, 0], np.asarray(x0s), atol=2e-1
    )
