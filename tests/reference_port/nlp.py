"""Oracle nominal-NLP solver: the role IPOPT plays in the reference.

The reference solves the multiple-shooting NLP (`solver/nlp.py:158-217`)

    min  sum_k x_k' Q x_k + u_k' R u_k  +  x_N' Qf x_N
    s.t. x_{k+1} = ddyn(x_k, u_k, dt),  x_0 = p,
         G [x_k; u_k] <= g,             Gf x_N <= gf

with CasADi/IPOPT from a zero initial guess. This oracle solves the same
NLP with an l1-merit line-search SQP whose subproblems are the dense-IPM
QP front-end (`qp_frontend.OracleQP`) — structurally unrelated to the
framework's jitted Riccati-KKT SQP (`robust_nonlinear_mpc_tpu/solvers/sqp.py`)
while converging to the same KKT points at ~1e-10.
"""

from __future__ import annotations

import numpy as np

from .qp_frontend import OracleQP


class OracleNLP:
    def __init__(self, N, Q, R, m, Qf, *, tol=1e-10, max_iter=200):
        self.N, self.Q, self.R, self.m, self.Qf = N, Q, R, m, Qf
        self.tol, self.max_iter = tol, max_iter
        nx, nu = m.nx, m.nu
        ones_A = [np.ones((nx, nx)) for _ in range(N)]
        ones_B = [np.ones((nx, nu)) for _ in range(N)]
        g_list = [np.asarray(m.g, float).ravel() for _ in range(N)]
        g_list.append(np.asarray(m.gf, float).ravel())
        self.qp = OracleQP(N, Q, R, m, Qf, ones_A, ones_B, g_list)
        self.H = self.qp.P  # blkdiag(Q,R,...,Qf), stage-wise packing

    def _pack(self, X, U):
        parts = []
        for k in range(self.N):
            parts.append(X[:, k])
            parts.append(U[:, k])
        parts.append(X[:, self.N])
        return np.concatenate(parts)

    def _merit(self, X, U, p, rho):
        m, N = self.m, self.N
        y = self._pack(X, U)
        cost = float(y @ self.H @ y)
        ceq = np.abs(X[:, 0] - p).sum()
        for k in range(N):
            ceq += np.abs(m.ddyn(X[:, k], U[:, k], m.dt) - X[:, k + 1]).sum()
        G, g = np.asarray(m.G, float), np.asarray(m.g, float).ravel()
        Gf, gf = np.asarray(m.Gf, float), np.asarray(m.gf, float).ravel()
        cin = 0.0
        for k in range(N):
            z = np.concatenate([X[:, k], U[:, k]])
            cin += np.maximum(G @ z - g, 0.0).sum()
        cin += np.maximum(Gf @ X[:, N] - gf, 0.0).sum()
        return cost + rho * (ceq + cin)

    def solve(self, x0, x_guess=None, u_guess=None):
        m, N = self.m, self.N
        nx, nu = m.nx, m.nu
        p = np.asarray(x0, float).ravel()
        X = (np.zeros((nx, N + 1)) if x_guess is None
             else np.asarray(x_guess, float).copy())
        U = (np.zeros((nu, N)) if u_guess is None
             else np.asarray(u_guess, float).copy())
        G, g = np.asarray(m.G, float), np.asarray(m.g, float).ravel()
        Gf, gf = np.asarray(m.Gf, float), np.asarray(m.gf, float).ravel()

        rho = 1e3
        success = False
        for _ in range(self.max_iter):
            A_list, B_list, c_list, g_list = [], [], [], []
            for k in range(N):
                A, B = m.linearize(X[:, k], U[:, k], m.dt)
                A_list.append(A)
                B_list.append(B)
                c_list.append(m.ddyn(X[:, k], U[:, k], m.dt) - X[:, k + 1])
                z = np.concatenate([X[:, k], U[:, k]])
                g_list.append(g - G @ z)
            g_list.append(gf - Gf @ X[:, N])

            self.qp.update_dynamics(A_list, B_list, None, g_list)
            self.qp.offset_constraints(np.stack(c_list, axis=1))
            self.qp.update_q_cost_lin(2.0 * (self.H @ self._pack(X, U)))
            sub = self.qp.solve(X[:, 0] - p)
            if not sub["success"]:
                # relax: prox-damped retry is unnecessary for these plants;
                # report failure like the reference's status check (nlp.py:96)
                return {"success": False}

            dX, dU = sub["primal_x"], sub["primal_u"]
            step = max(np.abs(dX).max(), np.abs(dU).max())
            rho = max(rho, 10.0 * np.abs(sub["dual_vec"]).max())

            # backtracking l1-merit line search
            phi0 = self._merit(X, U, p, rho)
            alpha = 1.0
            for _ in range(30):
                if self._merit(X + alpha * dX, U + alpha * dU, p, rho) \
                        <= phi0 + 1e-12 * abs(phi0):
                    break
                alpha *= 0.5
            X = X + alpha * dX
            U = U + alpha * dU

            if step < self.tol:
                success = True
                break

        y = self._pack(X, U)
        return {
            "success": success,
            "primal_x": X,
            "primal_u": U,
            "primal_vec": y,
            "dual_vec": sub["dual_vec"],
            "cost": float(y @ self.H @ y),
        }
