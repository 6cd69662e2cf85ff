"""Oracle SCP-SLS outer loop: transliteration of `solver/SCP_SLS_jit.py`.

Quirks preserved:
  * nominal init only when no warm state exists (`SCP_SLS_jit.py:74-77`);
  * `update_jacobian` before the first socp_step and again after each
    non-converged iteration (`:80,139`);
  * the warm-start ubg shift is prepared but consumed by dead code
    (`shift_ubg = False`, `:82-102`) — so it is simply not implemented here;
  * the deviation initial condition handed to fast-SLS is x_nom0 - x0
    (`:408-410`);
  * on until-convergence success the IPOPT "refinement" result is discarded
    (`:129-133`) — a no-op for trajectories, so the solve is skipped;
  * `reset_warm_start` keeps u_{N-1} and closes the tail with
    x_N <- f(x_N_old, u_{N-1,old}) (`:512-518`).
"""

from __future__ import annotations

import numpy as np

from .fast_sls import OracleFastSLS
from .nlp import OracleNLP


def pack_primal(X, U):
    # stage-wise y = [x0;u0;...;x_{N-1};u_{N-1};xN] (`ocp.py:43-56`)
    N = U.shape[1]
    parts = []
    for k in range(N):
        parts.append(np.asarray(X[:, k]).ravel())
        parts.append(np.asarray(U[:, k]).ravel())
    parts.append(np.asarray(X[:, N]).ravel())
    return np.concatenate(parts)


class OracleSCPSLS:
    def __init__(self, N, Q, R, m, Qf, Q_reg=None, R_reg=None, Q_reg_f=None,
                 rti=-1, fast_sls_rti_steps=None):
        self.N, self.Q, self.R, self.m, self.Qf = N, Q, R, m, Qf
        nx, nu = m.nx, m.nu
        self.Q_reg = np.eye(nx) if Q_reg is None else Q_reg
        self.R_reg = np.eye(nu) if R_reg is None else R_reg
        self.Q_reg_f = np.eye(nx) if Q_reg_f is None else Q_reg_f
        self.epsilon_convergence = 1e-10
        self.MAX_ITER_SCP = 100
        self.rti = rti

        self.nominal_trajectory_solver = OracleNLP(N, Q, R, m, Qf)
        self.fast_SLS_solver = OracleFastSLS(N, Q, R, m, Qf)
        self.fast_SLS_solver.set_rti_steps(fast_sls_rti_steps)
        self.fast_SLS_solver.Q_reg = self.Q_reg
        self.fast_SLS_solver.R_reg = self.R_reg
        self.fast_SLS_solver.Q_reg_f = self.Q_reg_f
        self.H = self.fast_SLS_solver.solver_forward.P

        self.current_iteration_scp = {}

    # ------------- pieces -------------
    def solve_nominal_trajectory(self, x0):
        sol = self.nominal_trajectory_solver.solve(x0)
        if not sol["success"]:
            return False
        cur = self.current_iteration_scp
        cur["primal_x"] = sol["primal_x"]
        cur["primal_u"] = sol["primal_u"]
        cur["primal_vec"] = pack_primal(sol["primal_x"], sol["primal_u"])
        cur["dual_vec"] = sol["dual_vec"]
        cur["cost"] = sol["cost"]
        return True

    def update_jacobian(self):
        # `SCP_SLS_jit.py:251-366`
        m, N = self.m, self.N
        cur = self.current_iteration_scp
        X, U = cur["primal_x"], cur["primal_u"]
        G = np.asarray(m.G, float)
        g = np.asarray(m.g, float).ravel()
        Gf = np.asarray(m.Gf, float)
        gf = np.asarray(m.gf, float).ravel()

        A_list, B_list, c_list, g_list = [], [], [], []
        for k in range(N):
            A, B = m.linearize(X[:, k], U[:, k], m.dt)
            A_list.append(A)
            B_list.append(B)
            c_list.append(m.ddyn(X[:, k], U[:, k], m.dt) - X[:, k + 1])
            z = np.concatenate([X[:, k], U[:, k]])
            g_list.append(g - G @ z)
        g_list.append(gf - Gf @ X[:, N])
        E_list = [np.asarray(m.E, float) for _ in range(N + 1)]

        cur["A_list"], cur["B_list"] = A_list, B_list
        cur["c_offset_list"], cur["g_list"] = c_list, g_list
        self.fast_SLS_solver.update_dynamics_list(A_list, B_list, E_list,
                                                  g_list, c_list)
        self.fast_SLS_solver.update_linear_cost(2.0 * (self.H @ cur["primal_vec"]))

    def socp_step(self, x0):
        # `SCP_SLS_jit.py:404-473`
        cur = self.current_iteration_scp
        x0 = np.asarray(x0, float).ravel()
        x_nom0 = np.asarray(cur["primal_x"][:, 0]).ravel()
        sol = self.fast_SLS_solver.solve(x_nom0 - x0)
        if not sol["success"]:
            return False
        dX, dU = sol["primal_x"], sol["primal_u"]
        delta_vec = pack_primal(dX, dU)
        cur["primal_x"] = cur["primal_x"] + dX
        cur["primal_u"] = cur["primal_u"] + dU
        cur["primal_vec"] = cur["primal_vec"] + delta_vec
        cur["dual_vec"] = sol["dual_vec"]
        cur["dual_mu"] = sol["dual_mu"]
        cur["dual_mu_f"] = sol["dual_mu_f"]
        cur["delta_vec"] = delta_vec
        cur["backoff"] = sol["backoff"]
        cur["backoff_x"] = sol["backoff_x"]
        cur["backoff_u"] = sol["backoff_u"]
        return True

    def check_convergence_scp(self):
        cur = self.current_iteration_scp
        if "delta_vec" in cur:
            return np.max(np.abs(cur["delta_vec"])) < self.epsilon_convergence
        return False

    # ------------- main -------------
    def solve(self, x0):
        cur = self.current_iteration_scp
        if not ("primal_x" in cur and "primal_u" in cur):
            if not self.solve_nominal_trajectory(x0):
                return {"success": False}
        self.update_jacobian()

        if self.rti is not None and self.rti > 0:
            max_iters, until = int(self.rti), False
        else:
            max_iters, until = self.MAX_ITER_SCP, True

        last_success = False
        for ii in range(max_iters):
            last_success = self.socp_step(x0)
            if not last_success:
                break
            if until and self.check_convergence_scp():
                cur["success"] = True
                cur["iterations"] = ii
                return cur
            self.update_jacobian()

        cur["iterations"] = max_iters - 1
        cur["success"] = last_success if not until else False
        return dict(cur)

    def reset_warm_start(self):
        # `SCP_SLS_jit.py:500-551` minus the dead ubg-shift stash
        N, m = self.N, self.m
        cur = self.current_iteration_scp
        X = np.asarray(cur["primal_x"], float).copy()
        U = np.asarray(cur["primal_u"], float).copy()
        X_new, U_new = X.copy(), U.copy()
        X_new[:, :N] = X[:, 1:N + 1]
        if N >= 2:
            U_new[:, :N - 1] = U[:, 1:N]
        U_new[:, N - 1] = U[:, N - 1]
        X_new[:, N] = m.ddyn(X[:, N], U[:, N - 1], m.dt)

        self.current_iteration_scp = {}
        self.fast_SLS_solver.reset_solver_to_zeros()
        cur = self.current_iteration_scp
        cur["primal_x"] = X_new
        cur["primal_u"] = U_new
        cur["primal_vec"] = pack_primal(X_new, U_new)
