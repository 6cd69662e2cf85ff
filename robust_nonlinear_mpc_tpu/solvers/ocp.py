"""OCP problem container: shared dimensions, costs, regularizers, and
stage-wise packing helpers.

API parity with the reference `solver/ocp.py:7-119` (class OCP), which all
solver layers subclass. In this framework the solvers are functional and
compose `QPStatics`/`SLSRegs` pytrees instead, but the OCP container is kept
for users of the reference API and for its packing / Riccati helpers.
"""

from __future__ import annotations

import numpy as np

from robust_nonlinear_mpc_tpu.models.linear import LTI, LTV


class OCP:
    def __init__(self, N, Q, R, m, Qf, Q_reg=None, R_reg=None, Q_reg_f=None):
        self.N = int(N)
        self.Q = np.asarray(Q, float)
        self.R = np.asarray(R, float)
        self.m = m
        self.xf = np.zeros((m.nx, 1))
        self.Qf = np.asarray(Qf, float)
        self.Q_reg = np.eye(self.Q.shape[0]) if Q_reg is None else np.asarray(Q_reg, float)
        self.R_reg = np.eye(self.R.shape[0]) if R_reg is None else np.asarray(R_reg, float)
        self.Q_reg_f = np.eye(self.Qf.shape[0]) if Q_reg_f is None else np.asarray(Q_reg_f, float)
        self.CONV_EPS = 1e-6  # reference ocp.py:28

        self.A_stack = None
        self.B_stack = None
        self.E_stack = None
        self.g_stack = None
        self.c_offset_stack = None

    # ------------------------------------------------------------------
    # Stage-wise packing (reference ocp.py:43-74); reference layouts
    # (nx, N+1) / (nu, N)
    # ------------------------------------------------------------------
    def pack_primal_nominal(self, X: np.ndarray, U: np.ndarray) -> np.ndarray:
        nx, nu, N = self.m.nx, self.m.nu, self.N
        X = np.asarray(X)
        U = np.asarray(U)
        assert X.shape == (nx, N + 1), f"X must be {(nx, N + 1)}, got {X.shape}"
        assert U.shape == (nu, N), f"U must be {(nu, N)}, got {U.shape}"
        stages = np.concatenate([X[:, :N], U], axis=0)  # (nx+nu, N)
        return np.concatenate([stages.T.ravel(), X[:, N]])

    def unpack_primal_nominal(self, y: np.ndarray):
        nx, nu, N = self.m.nx, self.m.nu, self.N
        y = np.asarray(y).reshape(-1)
        expected = (nx + nu) * N + nx
        assert y.size == expected, f"y must be size {expected}, got {y.size}"
        stages = y[: N * (nx + nu)].reshape(N, nx + nu)
        X = np.concatenate([stages[:, :nx], y[N * (nx + nu):][None]], axis=0).T
        U = stages[:, nx:].T
        return X, U

    # ------------------------------------------------------------------
    # Dynamics-stack init (reference ocp.py:76-99)
    # ------------------------------------------------------------------
    def initialize_list_dynamics(self):
        m = self.m
        if isinstance(m, LTI):
            self.A_stack = np.broadcast_to(m.A[None], (self.N, m.nx, m.nx)).copy()
            self.B_stack = np.broadcast_to(m.B[None], (self.N, m.nx, m.nu)).copy()
            self.E_stack = np.broadcast_to(m.E[None], (self.N + 1, m.nx, m.nw)).copy()
            self.g_stack = np.broadcast_to(np.asarray(m.g)[None], (self.N, m.ni)).copy()
            self.c_offset_stack = np.zeros((self.N, m.nx))
        elif isinstance(m, LTV):
            self.A_stack = m.A_stack
            self.B_stack = m.B_stack
            self.E_stack = m.E_stack
            self.g_stack = m.g_stack
        else:
            raise ValueError("Model type not supported")

    # ------------------------------------------------------------------
    # Riccati step helpers (reference ocp.py:103-119)
    # ------------------------------------------------------------------
    @staticmethod
    def riccati_step(A, B, Cx, Cu, Sk):
        x = B.T @ Sk
        y = A.T @ Sk
        K = -np.linalg.solve(Cu + x @ B, x @ A)
        S = Cx + y @ A + y @ B @ K
        return K, S

    @staticmethod
    def riccati_step_cholesky(A, B, Cx, Cu, Sk):
        x = B.T @ Sk
        y = A.T @ Sk
        L = np.linalg.cholesky(Cu + x @ B)
        M = np.linalg.solve(L, x @ A)
        K = -np.linalg.solve(L.T, M)
        S = Cx + y @ A + y @ B @ K
        return K, S
