"""Pendulum robust closed loop.

Config parity with the reference `expe/main_pendulum_robust_closed_loop.py`:
N = 15, Q = I, R = I, Qf = 10 I, Q_reg = R_reg = 1e3 I, Q_reg_f = 1e4 I,
rti = 3, fast_sls_rti_steps = 2, E = 0.003 I, dt = 0.05, fixed
x0 = [0.5, 0.5, 0, 0], 60 noise-free steps (the pendulum sim propagates
without disturbance, reference :96).

Usage:  python -m robust_nonlinear_mpc_tpu.expe.main_pendulum_robust_closed_loop --run [--N 15]
"""

from __future__ import annotations

import argparse

from robust_nonlinear_mpc_tpu.utils.platform import setup

FOLDER = "pendulum_robust_closed_loop"


def generate(N: int | None = None, sim_steps: int = 60):
    setup("cpu", x64=True)
    import numpy as np

    from robust_nonlinear_mpc_tpu.expe._common import save_results
    from robust_nonlinear_mpc_tpu.models import Pendulum
    from robust_nonlinear_mpc_tpu.sim.closed_loop import run_closed_loop
    from robust_nonlinear_mpc_tpu.solvers.scp_sls import SCPSLSSolver

    np.random.seed(0)
    m = Pendulum()
    N = int(N) if N is not None else 15
    m.E = 0.003 * np.eye(m.nx)
    m.dt = 0.05
    x_max = 10 * np.ones(m.nx)
    u_max = 5 * np.ones(m.nu)
    m.replace_constraints(x_max, -x_max, u_max, -u_max, x_max, -x_max)

    solver = SCPSLSSolver(
        N, np.eye(m.nx), np.eye(m.nu), m, 10 * np.eye(m.nx),
        Q_reg=1e3 * np.eye(m.nx), R_reg=1e3 * np.eye(m.nu),
        Q_reg_f=1e4 * np.eye(m.nx),
        rti=3, fast_sls_rti_steps=2, verbose=True,
    )

    x0 = np.array([0.5, 0.5, 0.0, 0.0])
    results = run_closed_loop(m, solver, x0, sim_steps, noise="none", verbose=True)
    return save_results(FOLDER, "pendulum_robust_closed_loop", results)


def plot():
    from robust_nonlinear_mpc_tpu.expe._common import plot_closed_loop

    plot_closed_loop(FOLDER)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--run", action="store_true")
    p.add_argument("--N", type=int, default=None)
    p.add_argument("--steps", type=int, default=60)
    args = p.parse_args()
    if args.run:
        generate(args.N, args.steps)
    else:
        plot()
