"""Oracle fast-SLS: plain-loop transliteration of `solver/fast_SLS_jit.py`.

Behavioral quirks preserved deliberately (they shape the RTI trajectories):

  * `initialize_backoff()` at every `solve()` resets beta to the 1e-10 floor
    (`fast_SLS_jit.py:281,299,444-454`), so the first eta of each call is
    mu / (2e-5) regardless of the previous tightening.
  * eta is evaluated from the *previous* iteration's beta (`:475-487`).
  * convergence is primal-only; the dual criterion is computed and discarded
    (`:594-600`), and the `_prev` comparison state persists across solve()
    calls and across `reset_solver_to_zeros` (instance attrs, never cleared).
  * RTI mode always finishes on one extra forward QP solve (`:291-293`) and
    reports success as long as no QP was infeasible (`:295`).
  * Phi_x / Phi_u are computed for the backoffs but never stored into the
    returned solution (update_tightening `:537` keeps them local), so the
    solution dict carries Phi = None.
  * the tightened ubg drops the +EPSILON that `offset_constraints` put on
    the dynamics rows (`:562-569` uses -c exactly).
"""

from __future__ import annotations

import numpy as np

from .qp_frontend import OracleQP


def riccati_step(A, B, Cx, Cu, Sk):
    # `fast_SLS_jit.py:43-62` including the symmetrization
    x = B.T @ Sk
    y = A.T @ Sk
    H = Cu + x @ B
    F = x @ A
    K = -np.linalg.solve(H, F)
    S = Cx + y @ (A + B @ K)
    return K, 0.5 * (S + S.T)


def backward_solve_loops(N, nx, nu, A, B, G, Gf, eta, eta_f,
                         Q_reg, R_reg, Q_reg_f):
    # `_backward_solve_numba` (`fast_SLS_jit.py:65-84`): independent columns
    S = np.zeros((N + 1, N + 1, nx, nx))
    K = np.zeros((N, N + 1, nu, nx))
    for jj in range(N + 1):
        C_fj = Gf.T @ (eta_f[jj][:, None] * Gf)
        S[N, jj] = C_fj + Q_reg_f
        for kk in range(N - 1, jj - 1, -1):
            C_kj = G.T @ (eta[kk, jj][:, None] * G)
            C_xx = C_kj[:nx, :nx] + Q_reg
            C_uu = C_kj[nx:, nx:] + R_reg
            K[kk, jj], S[kk, jj] = riccati_step(A[kk], B[kk], C_xx, C_uu,
                                                S[kk + 1, jj])
    return S, K


def propagate_loops(A, B, E, K):
    # `_propagate` (`fast_SLS_jit.py:87-117`)
    N, nx = A.shape[0], A.shape[1]
    nu, nw = B.shape[2], E.shape[2]
    Phi_x = np.zeros((N + 1, N + 1, nx, nw))
    Phi_u = np.zeros((N, N + 1, nu, nw))
    for j in range(N + 1):
        Phi_x[j, j] = E[j]
    for kk in range(N):
        for jj in range(kk + 1):
            Phi_u[kk, jj] = K[kk, jj] @ Phi_x[kk, jj]
            Phi_x[kk + 1, jj] = (A[kk] + B[kk] @ K[kk, jj]) @ Phi_x[kk, jj]
    return Phi_x, Phi_u


def backoff_loops(Phi_x, Phi_u, Gx, Gu, Gf, epsilon):
    # `_backoff_from_phi` (`fast_SLS_jit.py:120-188`)
    N = Phi_u.shape[0]
    ni, ni_f = Gx.shape[0], Gf.shape[0]
    beta = np.zeros((N, N, ni))
    beta_f = np.zeros((N + 1, ni_f))
    for kk in range(N):
        for jj in range(kk + 1):
            Z = Gx @ Phi_x[kk, jj] + Gu @ Phi_u[kk, jj]
            beta[kk, jj] = np.maximum((Z**2).sum(axis=1), epsilon)
    for jj in range(N + 1):
        Zf = Gf @ Phi_x[N, jj]
        beta_f[jj] = np.maximum((Zf**2).sum(axis=1), epsilon)
    backoff = np.sqrt(beta).sum(axis=1)
    backoff_f = np.sqrt(beta_f).sum(axis=0)
    return beta, beta_f, backoff, backoff_f


def tube_cost(N, Q_reg, R_reg, Q_reg_f, Phi_x, Phi_u):
    # `util/SLS.py:38-46` via the block-matrix Frobenius norm:
    # || blkdiag(Q_reg...Q_reg_f) Phi_x_mat ||_F^2 + || blkdiag(R_reg...) Phi_u_mat ||_F^2
    acc = 0.0
    for k in range(N + 1):
        W = Q_reg_f if k == N else Q_reg
        for j in range(N + 1):
            acc += float(((W @ Phi_x[k, j]) ** 2).sum())
    for k in range(N):
        for j in range(N + 1):
            acc += float(((R_reg @ Phi_u[k, j]) ** 2).sum())
    return np.sqrt(acc)


class OracleFastSLS:
    def __init__(self, N, Q, R, m, Qf, Q_reg=None, R_reg=None, Q_reg_f=None):
        self.N, self.Q, self.R, self.Qf, self.m = N, Q, R, Qf, m
        nx, nu = m.nx, m.nu
        self.Q_reg = np.eye(nx) if Q_reg is None else Q_reg
        self.R_reg = np.eye(nu) if R_reg is None else R_reg
        self.Q_reg_f = np.eye(nx) if Q_reg_f is None else Q_reg_f
        self.epsilon_backoff = 1e-10
        self.MAX_ITER = 30
        self.rti_steps = None

        # placeholder-ones dynamics until the first update, `dyn/LTV.py:28-32`
        self.A_list = [np.ones((nx, nx)) for _ in range(N)]
        self.B_list = [np.ones((nx, nu)) for _ in range(N)]
        self.E_list = [np.ones((nx, m.nw)) for _ in range(N + 1)]
        self.g_list = [np.asarray(m.g, float).ravel() for _ in range(N)]
        self.g_list.append(np.asarray(m.gf, float).ravel())
        self.c_offset_list = [np.zeros(nx) for _ in range(N)]

        self.solver_forward = OracleQP(N, Q, R, m, Qf, self.A_list,
                                       self.B_list, self.g_list)
        self.current_iteration = {}
        self.initialize_solver()
        self.initialize_backoff()

    def set_rti_steps(self, steps):
        self.rti_steps = int(steps) if steps and steps > 0 else None

    def initialize_solver(self):
        N, ni, ni_f = self.N, self.m.ni, self.m.ni_f
        self.current_iteration = {
            "primal_vec": np.zeros(1),
            "dual_vec": np.zeros(1),
            "eta": np.zeros((N, N, ni)),
            "eta_f": np.zeros((N + 1, ni_f)),
            "iteration_number": 0,
            "success": False,
            "cost_nominal": np.nan,
            "cost_tube": np.nan,
            "cost": np.nan,
        }

    def initialize_backoff(self):
        N, nx, nu = self.N, self.m.nx, self.m.nu
        ci = self.current_iteration
        ci["beta"] = np.full((N, N, self.m.ni), self.epsilon_backoff)
        ci["beta_f"] = np.full((N + 1, self.m.ni_f), self.epsilon_backoff)
        ci["backoff"] = np.sqrt(ci["beta"]).sum(axis=1)
        ci["backoff_f"] = np.sqrt(ci["beta_f"]).sum(axis=0)
        ci["backoff_x"] = np.zeros((N + 1, nx))
        ci["backoff_u"] = np.zeros((N, nu))

    def reset_solver_to_zeros(self):
        # `fast_SLS_jit.py:424-442`; note `_prev_*` deliberately NOT cleared
        self.initialize_backoff()
        self.initialize_solver()
        self.solver_forward.reset_ubg()
        self.solver_forward.reset_lbg()
        self.solver_forward.reset_q_cost_lin()
        self.initialize_backoff()

    def update_dynamics_list(self, A_list, B_list, E_list=None, g_list=None,
                             c_offset_list=None):
        self.A_list = [np.asarray(A, float) for A in A_list]
        self.B_list = [np.asarray(B, float) for B in B_list]
        if E_list is not None:
            self.E_list = [np.asarray(E, float) for E in E_list]
        if g_list is not None:
            self.g_list = [np.asarray(g, float).ravel() for g in g_list]
        self.solver_forward.update_dynamics(self.A_list, self.B_list,
                                            self.E_list, self.g_list)
        if c_offset_list is not None:
            self.c_offset_list = [np.asarray(c, float).ravel()
                                  for c in c_offset_list]
            self.solver_forward.offset_constraints(
                np.stack(self.c_offset_list, axis=1))

    def update_linear_cost(self, q):
        self.solver_forward.update_q_cost_lin(q)

    # ------------- main loop -------------
    def solve(self, x0):
        if self.rti_steps is not None:
            self.initialize_backoff()
            last_infeasible = False
            for _ in range(self.rti_steps):
                state = self._step(x0)
                if state is False:
                    last_infeasible = True
                    break
            if not last_infeasible:
                self.forward_solve(x0)
            self.current_iteration["success"] = (
                not last_infeasible
                or bool(self.current_iteration.get("success", False)))
            return self.post_processing_solution()

        self.initialize_backoff()
        for _ in range(self.MAX_ITER):
            state = self._step(x0)
            if state is False:
                self.current_iteration["success"] = False
                sol = self.post_processing_solution()
                self.reset_solver_to_zeros()
                return sol
            if state is True:
                return self.post_processing_solution()
        self.forward_solve(x0)
        self.current_iteration["success"] = False
        sol = self.post_processing_solution()
        self.reset_solver_to_zeros()
        return sol

    def _step(self, x0):
        if not self.forward_solve(x0):
            return False
        self.evaluate_dual_eta()
        if self.check_convergence_socp():
            self.current_iteration["success"] = True
            return True
        self.backward_solve()
        self.update_tightening()
        ci = self.current_iteration
        ci["cost"] = ci["cost_nominal"] + ci["cost_tube"]
        ci["iteration_number"] += 1
        return None

    def forward_solve(self, x0):
        sol = self.solver_forward.solve(x0)
        if not sol["success"]:
            return False
        ci = self.current_iteration
        ci["primal_vec"] = sol["primal_vec"]
        ci["primal_x"] = sol["primal_x"]
        ci["primal_u"] = sol["primal_u"]
        ci["dual_vec"] = sol["dual_vec"]
        ci["dual_mu"] = sol["dual_mu"]
        ci["dual_mu_f"] = sol["dual_mu_f"]
        ci["cost_nominal"] = sol["cost"]
        return True

    def evaluate_dual_eta(self):
        # `fast_SLS_jit.py:475-487`: eta from the PREVIOUS beta
        N = self.N
        ci = self.current_iteration
        beta = np.maximum(ci["beta"], self.epsilon_backoff)
        beta_f = np.maximum(ci["beta_f"], self.epsilon_backoff)
        eta = ci["eta"]
        for jj in range(N):
            for kk in range(jj, N):
                eta[kk, jj] = ci["dual_mu"][:, kk] / (2.0 * np.sqrt(beta[kk, jj]))
        eta_f = ci["eta_f"]
        for jj in range(N + 1):
            eta_f[jj] = ci["dual_mu_f"] / (2.0 * np.sqrt(beta_f[jj]))

    def check_convergence_socp(self):
        # primal-only, 1e-3, persistent history (`fast_SLS_jit.py:581-600`)
        prev_p = getattr(self, "_prev_primal_vec", None)
        prev_eta = getattr(self, "_prev_eta", None)
        cur_p = self.current_iteration["primal_vec"]
        cur_eta = self.current_iteration["eta"]
        if prev_p is None or prev_eta is None:
            self._prev_primal_vec = cur_p.copy()
            self._prev_eta = cur_eta.copy()
            return False
        if prev_p.shape != cur_p.shape:
            ok_p = False
        else:
            ok_p = np.max(np.abs(cur_p - prev_p)) <= 1e-3
        self._prev_primal_vec = cur_p.copy()
        self._prev_eta = cur_eta.copy()
        return ok_p

    def backward_solve(self):
        m, N = self.m, self.N
        A = np.stack(self.A_list)
        B = np.stack(self.B_list)
        G = np.asarray(m.G, float)
        Gf = np.asarray(m.Gf, float)
        ci = self.current_iteration
        S, K = backward_solve_loops(N, m.nx, m.nu, A, B, G, Gf,
                                    ci["eta"], ci["eta_f"],
                                    self.Q_reg, self.R_reg, self.Q_reg_f)
        ci["S"], ci["K"] = S, K

    def update_tightening(self):
        m, N = self.m, self.N
        nx, nu = m.nx, m.nu
        ci = self.current_iteration
        A = np.stack(self.A_list)
        B = np.stack(self.B_list)
        E = np.stack(self.E_list)
        K = ci["K"]
        G = np.asarray(m.G, float)
        Gx, Gu = G[:, :nx], G[:, nx:]
        Gf = np.asarray(m.Gf, float)

        Phi_x, Phi_u = propagate_loops(A, B, E, K)
        ci["cost_tube"] = tube_cost(N, self.Q_reg, self.R_reg, self.Q_reg_f,
                                    Phi_x, Phi_u)
        beta, beta_f, backoff, backoff_f = backoff_loops(
            Phi_x, Phi_u, Gx, Gu, Gf, float(self.epsilon_backoff))
        ci["beta"], ci["beta_f"] = beta, beta_f
        ci["backoff"], ci["backoff_f"] = backoff, backoff_f
        ci["backoff_x"] = np.vstack([backoff[:, :nx], backoff_f[:nx]])
        ci["backoff_u"] = backoff[:, nx:nx + nu]

        # new ubg = per-stage [-c ; g_res - backoff], terminal gf_res - backoff_f
        g = np.stack([gk for gk in self.g_list[:-1]])  # (N, ni) residuals
        absolute_backoff = g - backoff
        c_mat = np.stack(self.c_offset_list, axis=1)  # (nx, N)
        new_ubg_table = np.vstack([-c_mat, absolute_backoff.T])  # (nx+ni, N)
        new_ubg = np.concatenate([
            new_ubg_table.reshape(N * (m.ni + nx), order="F"),
            self.g_list[-1] - backoff_f,
        ])
        self.solver_forward.update_ubg(new_ubg)

    def post_processing_solution(self):
        ci = self.current_iteration
        return {
            "iteration_number": ci["iteration_number"],
            "success": ci["success"],
            "cost_nominal": ci.get("cost_nominal", np.nan),
            "cost_tube": np.nan,
            "cost": np.nan,
            "primal_x": ci.get("primal_x"),
            "primal_u": ci.get("primal_u"),
            "primal_vec": ci.get("primal_vec"),
            "dual_vec": ci.get("dual_vec"),
            "dual_mu": ci.get("dual_mu"),
            "dual_mu_f": ci.get("dual_mu_f"),
            "eta": ci.get("eta"),
            "eta_f": ci.get("eta_f"),
            "K": ci.get("K"),
            "beta": ci.get("beta"),
            "beta_f": ci.get("beta_f"),
            "backoff": ci.get("backoff"),
            "backoff_f": ci.get("backoff_f"),
            "backoff_x": ci.get("backoff_x"),
            "backoff_u": ci.get("backoff_u"),
            "t_qp_ms": np.nan,
            "t_backward_ms": np.nan,
        }
