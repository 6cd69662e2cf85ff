"""Rocket robust (SCP-SLS) vs soft-constrained NLP baseline comparison.

Parity with the reference `expe/main_rocket_compare_closed_loop.py`: both
controllers run on the SAME fixed x0 and the SAME constant disturbance
sequence W = -0.8 * ones (reference :241), robust with rti = 1/1, soft with
rho_soft = rho_soft_l1 = 1e6 (reference :180); the npz stores both
trajectories plus stage/terminal/total closed-loop costs.

Usage:  python -m robust_nonlinear_mpc_tpu.expe.main_rocket_compare_closed_loop --run
"""

from __future__ import annotations

import argparse

from robust_nonlinear_mpc_tpu.expe.main_rocket_robust_closed_loop import (
    X0,
    make_rocket_problem,
)
from robust_nonlinear_mpc_tpu.utils.platform import setup

FOLDER = "rockETH_compare_closed_loop"


def _compute_closed_loop_cost(X_all, U_all, Q, R, Qf):
    import numpy as np

    T = X_all.shape[1]
    J = 0.0
    for t in range(T - 1):
        J += float(X_all[:, t] @ Q @ X_all[:, t]) + float(U_all[:, t] @ R @ U_all[:, t])
    J_terminal = float(X_all[:, -1] @ Qf @ X_all[:, -1])
    return J, J_terminal, J + J_terminal


def generate(N: int = 15, T: int = 30):
    setup("cpu", x64=True)
    import jax.numpy as jnp
    import numpy as np

    from robust_nonlinear_mpc_tpu.expe._common import save_results
    from robust_nonlinear_mpc_tpu.solvers.soft_nlp import NLPSoftSolver

    x0 = np.array(X0)
    m, robust_solver = make_rocket_problem(N)
    robust_solver.opts = robust_solver.opts._replace(verbose=False)
    Q, R, Qf = robust_solver.Q, robust_solver.R, robust_solver.Qf

    # identical disturbance sequence for both controllers (reference :236-241)
    W = -0.8 * np.ones((T - 1, m.nx))

    def run(controller_step, warm=None):
        X = np.zeros((m.nx, T))
        U = np.zeros((m.nu, T - 1))
        Xn = np.zeros((m.nx, N + 1, T - 1))
        Un = np.zeros((m.nu, N, T - 1))
        bx = np.zeros((m.nx, N + 1, T - 1))
        bu = np.zeros((m.nu, N, T - 1))
        x = x0.copy()
        X[:, 0] = x
        for i in range(T - 1):
            sol = controller_step(i, x)
            Xn[:, :, i] = sol["primal_x"]
            Un[:, :, i] = sol["primal_u"]
            if "backoff_x" in sol:
                bx[:, :, i] = sol["backoff_x"].T
                bu[:, :, i] = sol["backoff_u"].T
            u0 = sol["primal_u"][:, 0]
            U[:, i] = u0
            x = np.asarray(m.ddyn(jnp.asarray(x), jnp.asarray(u0))) + m.E @ W[i]
            X[:, i + 1] = x
        return dict(
            state_trajectory=X, input_trajectory=U,
            nominal_trajectory_x=Xn, nominal_trajectory_u=Un,
            backoff_trajectory_x=bx, backoff_trajectory_u=bu,
        )

    def robust_step(i, x):
        if i > 0:
            robust_solver.reset_warm_start()
        return robust_solver.solve(x)

    print("[compare] running robust SCP-SLS ...")
    robust_res = run(robust_step)

    soft_solver = NLPSoftSolver(N, Q, R, m, Qf, rho_soft=1e6, rho_soft_l1=1e6)

    def soft_step(i, x):
        sol = soft_solver.solve(x)
        if not sol.get("success", False):
            if not np.all(np.isfinite(sol["primal_u"])):
                raise RuntimeError(f"Soft-constrained NLP failed at step {i}.")
            # persistent worst-case disturbances push the plant into
            # genuinely infeasible territory; the best feasible-to-~1e-3
            # iterate is still the meaningful baseline action
            print(f"[compare] soft NLP step {i}: accepting best iterate "
                  "(SQP not fully converged)")
        return sol

    print("[compare] running soft-constrained NLP baseline ...")
    soft_res = run(soft_step)

    Jr_s, Jr_T, Jr = _compute_closed_loop_cost(
        robust_res["state_trajectory"], robust_res["input_trajectory"], Q, R, Qf
    )
    Js_s, Js_T, Js = _compute_closed_loop_cost(
        soft_res["state_trajectory"], soft_res["input_trajectory"], Q, R, Qf
    )
    print(f"[compare] robust closed-loop cost: {Jr:.4e}  (stage {Jr_s:.4e} + terminal {Jr_T:.4e})")
    print(f"[compare] soft   closed-loop cost: {Js:.4e}  (stage {Js_s:.4e} + terminal {Js_T:.4e})")

    results = {
        **{f"r_{k}": v for k, v in robust_res.items()},
        **{f"s_{k}": v for k, v in soft_res.items()},
        "dt": m.dt, "g": np.asarray(m.g), "nx": m.nx, "nu": m.nu,
        "simulation_time_steps": T, "N": N, "x0": x0, "W": W,
        "Jr_stage": Jr_s, "Jr_terminal": Jr_T, "Jr_total": Jr,
        "Js_stage": Js_s, "Js_terminal": Js_T, "Js_total": Js,
    }
    return save_results(FOLDER, "rockETH_compare_closed_loop", results)


def plot(show: bool = True):
    import matplotlib

    if not show:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from robust_nonlinear_mpc_tpu.expe._common import load_latest
    from robust_nonlinear_mpc_tpu.utils.plotting import add_footnote_time

    data = load_latest(FOLDER)
    if data is None:
        print("No data files found in the directory.")
        return None
    dt = float(data["dt"])
    T = int(data["simulation_time_steps"])
    t = np.arange(T) * dt
    fig, axes = plt.subplots(2, 1, figsize=(12, 9), sharex=True)
    nx = int(data["nx"])
    colors = plt.cm.viridis(np.linspace(0, 1, nx + 2))
    for i in range(nx):
        axes[0].plot(t, data["r_state_trajectory"][i], color=colors[i + 1])
        axes[0].plot(t, data["s_state_trajectory"][i], "--", color=colors[i + 1])
    axes[0].set_ylabel("states (solid robust, dashed soft)")
    for j in range(int(data["nu"])):
        axes[1].plot(t[:-1], data["r_input_trajectory"][j], label=f"u{j} robust")
        axes[1].plot(t[:-1], data["s_input_trajectory"][j], "--", label=f"u{j} soft")
    axes[1].legend(ncol=4, fontsize=8)
    axes[1].set_xlabel("time [s]")
    axes[1].set_ylabel("inputs")
    fig.suptitle(
        f"robust J = {float(data['Jr_total']):.3e}   soft J = {float(data['Js_total']):.3e}"
    )
    add_footnote_time(fig)
    if show:
        plt.show()
    return fig


def plot_vel_omega_inputs(show: bool = True):
    """Velocity / angular-velocity comparison figure with compact dual
    legends (reference main_rocket_compare_closed_loop.py:409-495): robust
    solid vs soft dashed, same color per variable, red constraint lines."""
    import os

    import matplotlib

    if not show:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from robust_nonlinear_mpc_tpu.expe._common import load_latest
    from robust_nonlinear_mpc_tpu.utils.plotting import compact_dual_legend

    data = load_latest(FOLDER)
    if data is None:
        print("No data files found in the directory.")
        return None

    g = data["g"]
    nx, nu = int(data["nx"]), int(data["nu"])
    dt = float(data["dt"])
    Xr = data["r_state_trajectory"]
    Xs = data["s_state_trajectory"]
    ub_x = g[:nx]
    lb_x = -g[nx + nu:nx + nu + nx]

    viridis = plt.cm.viridis
    grid_kw = dict(alpha=0.3, linestyle="--")
    t = np.arange(Xr.shape[1]) * dt
    fig, axs = plt.subplots(1, 2, figsize=(10, 5))

    panels = [
        (axs[0], range(3, 6), [r"$v_x$", r"$v_y$", r"$v_z$"],
         "Velocity [m/s]"),
        (axs[1], range(10, 13),
         [r"$\omega_x$", r"$\omega_y$", r"$\omega_z$"],
         "Angular vel. [rad/s]"),
    ]
    for ax, idxs, lbls, ylab in panels:
        colors = viridis(np.linspace(0.3, 0.7, len(lbls)))
        for idx, lbl, color in zip(idxs, lbls, colors):
            ax.plot(t, Xr[idx], label=f"{lbl} (robust)", linewidth=2.5,
                    color=color, linestyle="-")
            ax.plot(t, Xs[idx], label=f"{lbl} (soft)", linewidth=2.5,
                    color=color, linestyle="--")
            ax.hlines([lb_x[idx], ub_x[idx]], t[0], t[-1], colors="red",
                      linestyles=[":"], linewidth=2.5)
        ax.set_ylabel(ylab)
        ax.set_xlabel("Time [s]")
        ax.grid(True, **grid_kw)
        compact_dual_legend(ax, ncol=3)

    fig.tight_layout(pad=1.2)
    fig.savefig(os.path.join(FOLDER, "trajectory_plot_compare_vel_omega.pdf"),
                dpi=300, bbox_inches="tight")
    if show:
        plt.show()
    return fig


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--run", action="store_true")
    p.add_argument("--N", type=int, default=15)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--vel-omega", action="store_true",
                   help="plot the velocity/omega comparison figure")
    args = p.parse_args()
    if args.run:
        generate(args.N, args.steps)
    elif args.vel_omega:
        plot_vel_omega_inputs()
    else:
        plot()
