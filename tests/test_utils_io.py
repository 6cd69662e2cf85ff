"""Coverage for utility subsystems: trajectory IO, plotting (Agg), timing,
precompile tool."""

import matplotlib

matplotlib.use("Agg")

import numpy as np


def test_trajectory_save_load_roundtrip(tmp_path):
    from robust_nonlinear_mpc_tpu.sim.io import load_trajectory, save_trajectory

    X = np.random.default_rng(0).standard_normal((4, 11))
    U = np.random.default_rng(1).standard_normal((1, 10))
    path = save_trajectory(str(tmp_path), X, U, dt=0.05, extra_field=np.arange(3))
    back = load_trajectory(path)
    np.testing.assert_allclose(back["X"], X)
    np.testing.assert_allclose(back["U"], U)
    assert float(back["dt"]) == 0.05
    np.testing.assert_allclose(back["extra_field"], np.arange(3))
    # folder-based newest-file load
    back2 = load_trajectory(str(tmp_path))
    np.testing.assert_allclose(back2["X"], X)


def test_rocket_plot_and_io(tmp_path):
    from robust_nonlinear_mpc_tpu.models import Rocket

    m = Rocket()
    X = 0.1 * np.random.default_rng(0).standard_normal((17, 8))
    U = 0.1 * np.random.default_rng(1).standard_normal((4, 7))
    axes = m.plot_state_trajectory(X, U)
    assert len(axes) == 6
    path = m.save_trajectory(str(tmp_path), X, U)
    back = m.load_trajectory(path)
    np.testing.assert_allclose(back["X"], X)


def test_pendulum_plot_methods():
    from robust_nonlinear_mpc_tpu.models import Pendulum

    m = Pendulum()
    X = 0.1 * np.random.default_rng(0).standard_normal((4, 8))
    ax = m.plot_nominal_trajectory(X)
    ax = m.plot_tube(0.1 * np.ones((4, 8)), X, ax=ax)
    ax2 = m.plot_input_nominal_trajectory(np.ones(7))
    m.plot_input_tube(0.1 * np.ones(7), np.zeros(7), ax=ax2)


def test_generic_plot_helpers(tmp_path):
    import matplotlib.pyplot as plt

    from robust_nonlinear_mpc_tpu.utils.plotting import (
        add_footnote_time,
        plot_nominal_trajectory,
        plot_tube,
        rectangle_coordinates,
    )

    X = np.random.default_rng(0).standard_normal((3, 10))
    ax = plot_nominal_trajectory(X, labels=["a", "b", "c"])
    plot_tube(0.1 * np.ones((3, 10)), X, ax=ax)
    add_footnote_time(ax.figure)
    plt.close("all")

    rect = rectangle_coordinates((1.0, 2.0), 2.0, 4.0)
    np.testing.assert_allclose(rect[0], [0.0, 0.0])
    np.testing.assert_allclose(rect[2], [2.0, 4.0])


def test_timed_helper():
    import jax.numpy as jnp

    from robust_nonlinear_mpc_tpu.utils.timing import timed

    out, secs = timed(lambda x: jnp.sum(x * x), jnp.arange(100.0), reps=3)
    assert float(out) > 0
    assert secs >= 0.0


def test_precompile_tool():
    from robust_nonlinear_mpc_tpu.tools.precompile import precompile

    compiled = precompile("pendulum", N=4)
    assert compiled is not None


def test_stage_profile_tool(monkeypatch, capsys):
    """The batched stage profiler composes its five pipeline stages correctly
    (tiny batch; stage outputs feed forward and the JSON line is well-formed)."""
    import json

    from robust_nonlinear_mpc_tpu.tools import stage_profile

    monkeypatch.setenv("RNM_BENCH_BATCH", "2")
    monkeypatch.setenv("RNM_BENCH_REPS", "1")
    stage_profile.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["metric"] == "rocket_mpc_stage_profile"
    assert set(rec["stage_ms"]) == {"jac", "qp1", "bwd", "resp", "qp2"}
    assert rec["qp2_success"] == 1.0


def test_bench_sweep_tool(monkeypatch):
    """Multi-system sweep composes the full warm step (rti outer iterations)
    and reports a well-formed record (tiny batch, pendulum only)."""
    monkeypatch.setenv("RNM_BENCH_BATCH", "2")
    monkeypatch.setenv("RNM_BENCH_REPS", "1")
    from robust_nonlinear_mpc_tpu.tools.bench_sweep import bench_system

    rec = bench_system("pendulum", B=2, n_rep=1, recycle=True, streaming=True)
    assert rec["metric"] == "pendulum_sls_mpc_steps_per_s"
    assert rec["rti"] == 3 and rec["success_fraction"] == 1.0 and rec["finite"]
