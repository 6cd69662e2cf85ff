"""Smoke tests for the rich plotting surface (VERDICT r1 item 7): the rocket
grouped/tube/normalized plots (reference dyn/rocket.py:256-454), the
alpha-gradient horizon-fan closed-loop figure
(main_rocket_robust_closed_loop.py:211-454), and the robust-vs-soft
velocity/omega comparison figure (main_rocket_compare_closed_loop.py:409-495).
All run under Agg on synthetic npz data and assert figure structure."""

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np
import pytest

from robust_nonlinear_mpc_tpu.expe import (
    main_rocket_compare_closed_loop as cmp_expe,
)
from robust_nonlinear_mpc_tpu.expe import (
    main_rocket_robust_closed_loop as rocket_expe,
)
from robust_nonlinear_mpc_tpu.expe._common import save_results
from robust_nonlinear_mpc_tpu.models import Rocket
from robust_nonlinear_mpc_tpu.utils.plotting import (
    affine_to_unit,
    compact_dual_legend,
    draw_alpha_gradient_tube,
    halfwidth_to_unit,
)


@pytest.fixture(autouse=True)
def _close_all():
    yield
    plt.close("all")


def test_affine_unit_helpers():
    assert affine_to_unit(np.array([2.0]), 0.0, 4.0)[0] == 0.0
    assert affine_to_unit(np.array([4.0]), 0.0, 4.0)[0] == 1.0
    assert affine_to_unit(np.array([0.0]), 0.0, 4.0)[0] == -1.0
    assert halfwidth_to_unit(np.array([2.0]), 0.0, 4.0)[0] == 1.0
    # degenerate bound span must not divide by zero
    assert np.isfinite(affine_to_unit(np.array([1.0]), 2.0, 2.0)).all()


def test_draw_alpha_gradient_tube_artists():
    fig, ax = plt.subplots()
    t = np.linspace(0, 1, 6)
    draw_alpha_gradient_tube(ax, t, -np.ones_like(t), np.ones_like(t), "C0",
                             a_start=0.4, a_end=0.1)
    polys = ax.collections
    assert len(polys) == (len(t) - 1) * 4  # segments_per_step = 4
    alphas = [p.get_alpha() for p in polys]
    assert alphas[0] > alphas[-1] > 0  # fading along the horizon


def test_rocket_grouped_tube_plots():
    m = Rocket()
    T = 8
    rng = np.random.default_rng(0)
    X = 0.1 * rng.standard_normal((m.nx, T))
    B = np.abs(0.05 * rng.standard_normal((m.nx, T)))
    axes = m.plot_state_tube(B, X)
    assert len(axes) == 5
    assert all(len(ax.collections) > 0 for ax in axes)

    axes2 = m.plot_normalized_state_tube_with_constraints(X, B)
    assert len(axes2) == 5
    # hlines at the normalized bounds present
    assert all(len(ax.collections) > 0 for ax in axes2)

    axes3 = m.plot_states_constraints(10)
    assert len(axes3) == 5


def _fake_rocket_run(tmp_path, monkeypatch):
    m = Rocket()
    N, T = 5, 7
    rng = np.random.default_rng(1)
    res = {
        "state_trajectory": 0.1 * rng.standard_normal((m.nx, T)),
        "input_trajectory": 0.1 * rng.standard_normal((m.nu, T - 1)),
        "nominal_trajectory_x": 0.1 * rng.standard_normal((m.nx, N + 1, T)),
        "nominal_trajectory_u": 0.1 * rng.standard_normal((m.nu, N, T)),
        "backoff_trajectory_x": np.abs(0.02 * rng.standard_normal((m.nx, N + 1, T))),
        "backoff_trajectory_u": np.abs(0.02 * rng.standard_normal((m.nu, N, T))),
        "dt": m.dt, "g": np.asarray(m.g), "nx": m.nx, "nu": m.nu,
        "simulation_time_steps": T, "N": N,
    }
    folder = str(tmp_path / "rocket_run")
    save_results(folder, "rockETH_robust_closed_loop", res)
    monkeypatch.setattr(rocket_expe, "FOLDER", folder)
    return res


def test_rocket_closed_loop_figure(tmp_path, monkeypatch):
    _fake_rocket_run(tmp_path, monkeypatch)
    fig = rocket_expe.plot(tube_frequency=3, show=False)
    assert fig is not None
    axs = fig.get_axes()
    assert len(axs) == 6
    # every panel carries tube fans (collections) and overlay lines
    for ax in axs:
        assert len(ax.collections) > 0
        assert len(ax.get_lines()) > 0
    # saved artifacts exist
    import os

    assert os.path.exists(os.path.join(rocket_expe.FOLDER,
                                       "trajectory_plot_closed_loop.pdf"))
    assert os.path.exists(os.path.join(rocket_expe.FOLDER,
                                       "trajectory_plot_closed_loop.png"))


def test_compare_vel_omega_figure(tmp_path, monkeypatch):
    m = Rocket()
    T = 7
    rng = np.random.default_rng(2)
    res = {}
    for tag in ("r", "s"):
        res[f"{tag}_state_trajectory"] = 0.1 * rng.standard_normal((m.nx, T))
        res[f"{tag}_input_trajectory"] = 0.1 * rng.standard_normal((m.nu, T - 1))
    res.update({
        "dt": m.dt, "g": np.asarray(m.g), "nx": m.nx, "nu": m.nu,
        "simulation_time_steps": T, "N": 5,
        "Jr_total": 1.0, "Js_total": 2.0,
    })
    folder = str(tmp_path / "cmp_run")
    save_results(folder, "rockETH_compare_closed_loop", res)
    monkeypatch.setattr(cmp_expe, "FOLDER", folder)
    fig = cmp_expe.plot_vel_omega_inputs(show=False)
    assert fig is not None
    axs = fig.get_axes()
    assert len(axs) == 2
    for ax in axs:
        # 3 robust + 3 soft lines per panel (+ legend proxy artists)
        solid = [l for l in ax.get_lines() if l.get_linestyle() == "-"]
        assert len(solid) >= 3
        # two stacked legends (variables + robust/soft key)
        assert len(ax.findobj(matplotlib.legend.Legend)) == 2


def test_compact_dual_legend_without_tagged_series():
    fig, ax = plt.subplots()
    ax.plot([0, 1], [0, 1], label="plain")
    compact_dual_legend(ax)  # must not raise when no "(robust)" series
    assert len(ax.findobj(matplotlib.legend.Legend)) >= 1
