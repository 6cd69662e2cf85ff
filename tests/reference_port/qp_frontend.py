"""Oracle QP front-end replicating the reference `solver/qp_jit.py` contract.

Same constraint layout and bound state machine as the reference QP class
(backend="osqp" semantics), with the dense f64 Mehrotra IPM of
`qp_dense.py` standing in for OSQP at eps = 1e-9 + polish:

  rows per stage k (`qp_jit.py:102-118`):   [A_k  B_k  -I] (nx dynamics rows)
                                            [G_x  G_u    ] (ni inequality rows)
  terminal (`:119-121`):                    [Gf] (ni_f rows)
  appended x0 pin (`:178-192`):             I on the first nx vars,
                                            bounds -x0 ∓ EPSILON

Bound state machine:
  update_dynamics  (`:518-534,269-273`)  rebuild ubg from g_list, reset lbg
  offset_constraints (`:595-610`)        ubg -= off - EPS; lbg = nom - off - EPS
  update_ubg / reset_ubg / reset_lbg     direct vector replacement

Dual unpacking follows `_pack_solution` (`:487-513`): drop the x0-row duals,
split per-stage [dyn | ineq] rows into dual_mu (ni, N) and dual_mu_f.
"""

from __future__ import annotations

import numpy as np

from .qp_dense import solve_dense_qp

EPSILON = 1e-10  # x0 box slack, `qp_jit.py:19`
_EQ_TOL = 1e-8   # l==u detection, same as `_convert_bounds_to_quadprog:843`


class OracleQP:
    def __init__(self, N, Q, R, m, Qf, A_list, B_list, g_list):
        self.N, self.Q, self.R, self.Qf, self.m = N, Q, R, Qf, m
        nx, nu, ni, ni_f = m.nx, m.nu, m.ni, m.ni_f
        self.nv = (nx + nu) * N + nx
        self.nrows = (nx + ni) * N + ni_f
        self.A_list = [np.asarray(A, float) for A in A_list]
        self.B_list = [np.asarray(B, float) for B in B_list]
        self.g_list = [np.asarray(g, float).ravel() for g in g_list]

        # cost P = blkdiag(Q, R, ..., Qf); solver convention y' P y + q' y
        self.P = np.zeros((self.nv, self.nv))
        for k in range(N):
            o = k * (nx + nu)
            self.P[o:o + nx, o:o + nx] = Q
            self.P[o + nx:o + nx + nu, o + nx:o + nx + nu] = R
        self.P[-nx:, -nx:] = Qf

        self.nominal_ubg = self._ubg_from_g_list()
        self.ubg = self.nominal_ubg.copy()
        lb = np.concatenate(
            [np.concatenate([np.zeros(nx), np.full(ni, -np.inf)])
             for _ in range(N)] + [np.full(ni_f, -np.inf)])
        self.lbg_nominal = lb
        self.lbg = lb.copy()
        self.q_cost_lin = np.zeros(self.nv)

    # ---------------- bound state machine ----------------
    def _ubg_from_g_list(self):
        nx = self.m.nx
        pieces = [np.concatenate([np.zeros(nx), g]) for g in self.g_list[:-1]]
        return np.concatenate(pieces + [self.g_list[-1]])

    def update_dynamics(self, A_list, B_list, E_list=None, g_list=None):
        self.A_list = [np.asarray(A, float) for A in A_list]
        self.B_list = [np.asarray(B, float) for B in B_list]
        if g_list is not None:
            self.g_list = [np.asarray(g, float).ravel() for g in g_list]
        self.ubg = self._ubg_from_g_list()
        self.lbg = self.lbg_nominal.copy()

    def offset_constraints(self, c_mat):
        nx, ni, ni_f, N = self.m.nx, self.m.ni, self.m.ni_f, self.N
        c_mat = np.asarray(c_mat, float).reshape(nx, N)
        off = np.zeros(self.nrows)
        for k in range(N):
            off[k * (nx + ni):k * (nx + ni) + nx] = c_mat[:, k]
        self.ubg = self.ubg - off + EPSILON
        self.lbg = self.lbg_nominal - off - EPSILON

    def update_ubg(self, new_ubg):
        self.ubg = np.asarray(new_ubg, float).ravel().copy()

    def reset_ubg(self):
        self.ubg = self.nominal_ubg.copy()

    def reset_lbg(self):
        self.lbg = self.lbg_nominal.copy()

    def update_q_cost_lin(self, q):
        q = np.asarray(q, float).ravel()
        assert q.size == self.nv
        self.q_cost_lin = q.copy()

    def reset_q_cost_lin(self):
        self.q_cost_lin = np.zeros(self.nv)

    # ---------------- assembly + solve ----------------
    def _constraint_matrix(self):
        nx, nu, ni, ni_f, N = (self.m.nx, self.m.nu, self.m.ni, self.m.ni_f,
                               self.N)
        A = np.zeros((self.nrows, self.nv))
        G = np.asarray(self.m.G, float)
        r = 0
        for k in range(N):
            cx = k * (nx + nu)
            A[r:r + nx, cx:cx + nx] = self.A_list[k]
            A[r:r + nx, cx + nx:cx + nx + nu] = self.B_list[k]
            A[r:r + nx, cx + nx + nu:cx + 2 * nx + nu] = -np.eye(nx)
            r += nx
            A[r:r + ni, cx:cx + nx] = G[:, :nx]
            A[r:r + ni, cx + nx:cx + nx + nu] = G[:, nx:]
            r += ni
        A[r:r + ni_f, N * (nx + nu):] = np.asarray(self.m.Gf, float)
        return A

    def solve(self, x0):
        nx, nu, ni, ni_f, N = (self.m.nx, self.m.nu, self.m.ni, self.m.ni_f,
                               self.N)
        x0 = np.asarray(x0, float).ravel()
        A = self._constraint_matrix()
        l, u = self.lbg.copy(), self.ubg.copy()

        # classify rows as equality (l≈u, midpoint) / upper inequality
        both = np.isfinite(l) & np.isfinite(u)
        is_eq = both & (np.abs(u - l) <= _EQ_TOL)
        is_up = np.isfinite(u) & ~is_eq

        C = np.vstack([A[is_eq], np.hstack([np.eye(nx),
                                            np.zeros((nx, self.nv - nx))])])
        d = np.concatenate([0.5 * (l[is_eq] + u[is_eq]), -x0])
        F = A[is_up]
        h = u[is_up]

        res = solve_dense_qp(self.P, self.q_cost_lin, C, d, F, h)
        if not res["success"]:
            return {"success": False}

        y = res["y"]
        # reassemble the OSQP-ordered dual vector (without the x0 rows)
        lam_full = np.zeros(self.nrows)
        lam_full[is_eq] = res["nu"][: int(is_eq.sum())]
        lam_full[is_up] = res["lam"]

        X = np.zeros((nx, N + 1))
        U = np.zeros((nu, N))
        p = 0
        for k in range(N):
            X[:, k] = y[p:p + nx]
            p += nx
            U[:, k] = y[p:p + nu]
            p += nu
        X[:, N] = y[p:]

        dual_mu_f = lam_full[-ni_f:]
        dual_non_term = lam_full[:-ni_f].reshape(N, nx + ni)
        dual_mu = dual_non_term[:, nx:].T  # (ni, N)

        return {
            "success": True,
            "primal_vec": y,
            "primal_x": X,
            "primal_u": U,
            "dual_vec": lam_full,
            "dual_mu": dual_mu,
            "dual_mu_f": dual_mu_f,
            "cost": float(y @ self.P @ y + self.q_cost_lin @ y),
            "time_ms": np.nan,
        }
