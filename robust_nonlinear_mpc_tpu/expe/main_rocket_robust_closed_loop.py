"""Rocket ("rockETH") robust closed loop — the headline RTI configuration.

Config parity with the reference `expe/main_rocket_robust_closed_loop.py`:
N = 15, Q = diag(10,10,10, 1x3, 1x4, 1,5,5, 1x4), R = I4, Qf = 10 Q,
regs = 1e4 I, **rti = 1, fast_sls_rti_steps = 1** (true real-time
iteration), E = dt * diag(...) override, hardcoded 17-dim x0, 30 steps with
uniform noise x+ = f(x, u) + E w, w ~ U[-1, 1]^nx drawn from the seeded
global RNG (np.random.seed(0), reference :30,178-182).

Usage:  python -m robust_nonlinear_mpc_tpu.expe.main_rocket_robust_closed_loop --run [--N 15]
"""

from __future__ import annotations

import argparse

from robust_nonlinear_mpc_tpu.utils.platform import setup

FOLDER = "rockETH_robust_closed_loop"

X0 = [
    1.75729, 4.15951, 4.72757,
    -0.18913, -0.38367, -0.08697,
    -0.79487, 0.00768, -0.21110, -0.56883,
    -0.12752, -0.58026, -0.76542,
    0.20555, 0.54610, -0.40116, -0.35401,
]


def make_rocket_problem(N=15):
    """Model + solver with the reference rocket experiment settings."""
    import numpy as np

    from robust_nonlinear_mpc_tpu.models import Rocket
    from robust_nonlinear_mpc_tpu.solvers.scp_sls import SCPSLSSolver

    m = Rocket()
    Q = np.diag(
        [10.0, 10.0, 10.0,
         1.0, 1.0, 1.0,
         1.0, 1.0, 1.0, 1.0,
         1.0, 5.0, 5.0,
         1.0, 1.0, 1.0, 1.0]
    )
    R = np.diag([1.0, 1.0, 1.0, 1.0])
    Qf = 10 * Q
    m.dt = 0.05
    sigma_theta = np.deg2rad(2.0)
    q_vec_std = 0.5 * sigma_theta
    q_w_std = 0.1 * q_vec_std
    m.E = m.dt * np.diag(
        [0.20, 0.20, 0.20,
         0.2, 0.20, 0.20,
         q_vec_std, q_vec_std, q_vec_std, q_w_std,
         0.2, 0.2, 0.2,
         0.8, 0.2, 0.04, 0.04]
    )
    solver = SCPSLSSolver(
        N, Q, R, m, Qf,
        Q_reg=1e4 * np.eye(m.nx), R_reg=1e4 * np.eye(m.nu),
        Q_reg_f=1e4 * np.eye(m.nx),
        rti=1, fast_sls_rti_steps=1, verbose=True,
    )
    return m, solver


def generate(N: int | None = None, sim_steps: int = 30):
    setup("cpu", x64=True)
    import numpy as np

    from robust_nonlinear_mpc_tpu.expe._common import save_results
    from robust_nonlinear_mpc_tpu.sim.closed_loop import run_closed_loop

    np.random.seed(0)
    N = int(N) if N is not None else 15
    m, solver = make_rocket_problem(N)
    x0 = np.array(X0)

    results = run_closed_loop(
        m, solver, x0, sim_steps, noise="uniform",
        rng=np.random.RandomState(0), verbose=True,
    )
    return save_results(FOLDER, "rockETH_robust_closed_loop", results)


def plot():
    from robust_nonlinear_mpc_tpu.expe._common import plot_closed_loop

    plot_closed_loop(FOLDER)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--run", action="store_true")
    p.add_argument("--N", type=int, default=None)
    p.add_argument("--steps", type=int, default=30)
    args = p.parse_args()
    if args.run:
        generate(args.N, args.steps)
    else:
        plot()
