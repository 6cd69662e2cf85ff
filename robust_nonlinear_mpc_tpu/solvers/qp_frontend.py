"""Stateful QP front-end with interchangeable backends.

API parity with the reference `solver/qp_jit.py:22-628` (class QP): build the
horizon QP once from a model, then per-iteration numeric updates only —
`update_dynamics`, `update_ubg`/`reset_ubg`/`reset_lbg`, `offset_constraints`,
`update_q_cost_lin`/`add_q_cost_lin`/`reset_q_cost_lin`, `solve(x0)` — and
pluggable backends:

  * "jax"    — the XLA Riccati-IPM kernel (ops/qp_ipm.py); default and the
               only TPU path (replaces the reference's "casadi_osqp"),
  * "native" — the C++ Riccati-IPM (native/rnm_qp.cpp via ctypes; replaces
               the reference's "osqp"/"osqp_codegen" native backends, without
               any codegen: one binary serves every shape).

The reference's stage-wise bound layout is preserved: `ubg` is the stacked
[(equality rhs -c_k); (ineq rhs h_k)] per stage plus the terminal block
(qp_jit.py:141-155), and `solve(x0)` pins x(0) = -x0 (qp_jit.py:161-169).
Dual unpacking matches `_pack_solution` (qp_jit.py:487-513).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from robust_nonlinear_mpc_tpu.models.linear import LTI, LTV
from robust_nonlinear_mpc_tpu.ops.packing import pack_primal
from robust_nonlinear_mpc_tpu.ops.qp_ipm import (
    IPMOptions,
    QPData,
    QPStatics,
    solve_qp,
)


class QP:
    def __init__(self, N, Q, R, m, Qf, *, backend="jax", ipm: IPMOptions | None = None,
                 verbose=False, export_standard_QP: bool = False,
                 export_dir=None):
        assert backend in {"jax", "native"}
        self.N = int(N)
        self.m = m
        self.backend = backend
        self.verbose = verbose
        self.ipm = ipm or IPMOptions()
        self.dtype = jnp.zeros(0).dtype
        # MATLAB-quadprog export for external validation (reference
        # qp_jit.py:36,45,477,884-943): every successful solve is dumped as a
        # standard-form QP .mat when export_standard_QP is set.
        self.export_standard_qp = bool(export_standard_QP)
        self.export_dir = export_dir if export_dir is not None else "build/quadprog_exports"
        self._export_counter = 0

        nx, nu = m.nx, m.nu
        G = np.asarray(m.G, float)
        self.stat = QPStatics(
            Hx=jnp.asarray(2 * np.asarray(Q, float), self.dtype),
            Hu=jnp.asarray(2 * np.asarray(R, float), self.dtype),
            HxN=jnp.asarray(2 * np.asarray(Qf, float), self.dtype),
            Gx=jnp.asarray(G[:, :nx], self.dtype),
            Gu=jnp.asarray(G[:, nx:], self.dtype),
            Gf=jnp.asarray(np.asarray(m.Gf, float), self.dtype),
        )

        # dynamics stacks (LTI broadcast / LTV per-stage, reference
        # ocp.py:76-99 initialize_list_dynamics)
        if isinstance(m, LTI):
            A = np.broadcast_to(m.A[None], (N, nx, nx))
            B = np.broadcast_to(m.B[None], (N, nx, nu))
            g_stack = np.broadcast_to(np.asarray(m.g)[None], (N, m.ni))
            gf = np.asarray(m.gf)
        elif isinstance(m, LTV):
            A, B = m.A_stack, m.B_stack
            g_stack, gf = m.g_stack, m.gf_vec
        else:
            raise ValueError("Model must be LTI or LTV")
        self._A = jnp.asarray(A, self.dtype)
        self._B = jnp.asarray(B, self.dtype)
        self._c = jnp.zeros((N, nx), self.dtype)

        self._nominal_h = jnp.asarray(np.array(g_stack, float), self.dtype)
        self._nominal_hf = jnp.asarray(np.asarray(gf, float), self.dtype)
        self._h = self._nominal_h
        self._hf = self._nominal_hf
        self.reset_q_cost_lin()

        self._solve_jit = jax.jit(
            lambda data: solve_qp(self.stat, data, self.ipm)
        )

    # ------------------------------------------------------------------
    # Updates (reference qp_jit.py:518-628)
    # ------------------------------------------------------------------
    def update_dynamics(self, A_stack, B_stack, E_stack=None, g_stack=None):
        self._A = jnp.asarray(np.asarray(A_stack, float), self.dtype)
        self._B = jnp.asarray(np.asarray(B_stack, float), self.dtype)
        if g_stack is not None:
            g_stack = np.asarray(g_stack, float)
            self._nominal_h = jnp.asarray(g_stack[: self.N], self.dtype)
            if g_stack.shape[0] > self.N:
                self._nominal_hf = jnp.asarray(g_stack[self.N].ravel()[: self.m.ni_f], self.dtype)
        # like the reference, a dynamics update resets the bounds to nominal
        # (qp_jit.py:269-273)
        self.reset_ubg()

    def offset_constraints(self, c_stack):
        """Set the dynamics affine term (equality rhs -c), reference :595-610."""
        self._c = jnp.asarray(np.asarray(c_stack, float).reshape(self.N, self.m.nx),
                              self.dtype)

    def update_ubg(self, h, hf=None):
        self._h = jnp.asarray(np.asarray(h, float).reshape(self.N, -1), self.dtype)
        if hf is not None:
            self._hf = jnp.asarray(np.asarray(hf, float).ravel(), self.dtype)

    def reset_ubg(self):
        self._h = self._nominal_h
        self._hf = self._nominal_hf

    def reset_lbg(self):
        """Reset the equality-row offsets to nominal (reference
        qp_jit.py:589-593). The reference encodes the dynamics defect in the
        OSQP lower/upper bounds of the equality rows; here equalities are
        explicit with affine term c, so resetting lbg = zeroing c."""
        self._c = jnp.zeros((self.N, self.m.nx), self.dtype)

    def update_q_cost_lin(self, qx, qu=None):
        if qu is None:
            # packed stage-wise vector y-layout (reference convention)
            y = np.asarray(qx, float).ravel()
            nx, nu, N = self.m.nx, self.m.nu, self.N
            stages = y[: N * (nx + nu)].reshape(N, nx + nu)
            qx_arr = np.concatenate([stages[:, :nx], y[N * (nx + nu):][None]], axis=0)
            qu_arr = stages[:, nx:]
        else:
            qx_arr, qu_arr = np.asarray(qx, float), np.asarray(qu, float)
        self._qx = jnp.asarray(qx_arr, self.dtype)
        self._qu = jnp.asarray(qu_arr, self.dtype)

    def add_q_cost_lin(self, qx, qu=None):
        old_qx, old_qu = self._qx, self._qu
        self.update_q_cost_lin(qx, qu)
        self._qx = self._qx + old_qx
        self._qu = self._qu + old_qu

    def reset_q_cost_lin(self):
        self._qx = jnp.zeros((self.N + 1, self.m.nx), self.dtype)
        self._qu = jnp.zeros((self.N, self.m.nu), self.dtype)

    # ------------------------------------------------------------------
    # Solve (reference qp_jit.py:343-513)
    # ------------------------------------------------------------------
    def solve(self, x0):
        """Solve with x(0) pinned to -x0 (reference sign convention)."""
        x0 = np.asarray(x0, float).reshape(-1)
        data = QPData(
            A=self._A, B=self._B, c=self._c,
            qx=self._qx, qu=self._qu,
            h=self._h, hf=self._hf,
            xinit=jnp.asarray(-x0, self.dtype),
        )
        if self.backend == "native":
            from robust_nonlinear_mpc_tpu.native import qp_solve_native

            r = qp_solve_native(self.stat, data, max_iter=self.ipm.max_iter,
                                tol=self.ipm.tol)
            X, U = r["X"], r["U"]
            lam, lam_f = r["lam"], r["lam_f"]
            ok, cost = r["success"], r["cost"]
            if not ok and self.verbose:
                print(f"QP(native): kkt={r['kkt_res']:.2e} (failed)")
        else:
            sol = self._solve_jit(data)
            ok = bool(sol.success)
            X, U = np.asarray(sol.X), np.asarray(sol.U)
            lam, lam_f = np.asarray(sol.lam), np.asarray(sol.lam_f)
            cost = float(sol.cost)
            if not ok and self.verbose:
                print(f"QP(jax): kkt={float(sol.kkt_res):.2e} (failed)")

        if not ok:
            return {"success": False}
        y = np.asarray(pack_primal(jnp.asarray(X), jnp.asarray(U)))
        ret = {
            "success": True,
            "primal_vec": y,
            "primal_x": X.T,          # (nx, N+1) reference layout
            "primal_u": U.T,          # (nu, N)
            "dual_mu": lam.T,         # (ni, N)
            "dual_mu_f": lam_f,
            "cost": cost,
        }
        if self.export_standard_qp:
            self._export_quadprog(x0, ret)
        return ret

    # ------------------------------------------------------------------
    # External-validation export (reference qp_jit.py:884-943)
    # ------------------------------------------------------------------
    def densify(self, x0=None):
        """Dense standard-form view of the current QP over the reference's
        stage-wise vector y = [x0;u0;...;x_{N-1};u_{N-1};xN]:
        min 0.5 y'H y + f'y  s.t.  A y <= b,  Aeq y = beq.

        Equality rows are the dynamics defects [A_k B_k -I] y = -c_k
        (reference qp_jit.py:102-123) plus, when x0 is given, the initial
        pin I·x(0) = -x0 (qp_jit.py:161-169 helper rows, exported as
        equalities like the reference's append at :906-910).
        """
        N, nx, nu = self.N, self.m.nx, self.m.nu
        A = np.asarray(self._A, float)
        B = np.asarray(self._B, float)
        c = np.asarray(self._c, float)
        h = np.asarray(self._h, float)
        hf = np.asarray(self._hf, float)
        Gx = np.asarray(self.stat.Gx, float)
        Gu = np.asarray(self.stat.Gu, float)
        Gf = np.asarray(self.stat.Gf, float)
        ni, ni_f = Gx.shape[0], Gf.shape[0]
        nv = (nx + nu) * N + nx

        def xi(k):
            return slice(k * (nx + nu), k * (nx + nu) + nx)

        def ui(k):
            return slice(k * (nx + nu) + nx, (k + 1) * (nx + nu))

        # quadprog minimizes 0.5 y'H y + f'y; our statics already hold
        # H-blocks = 2Q / 2R / 2Qf (reference H = 2*P, qp_jit.py:893)
        H = np.zeros((nv, nv))
        f = np.zeros(nv)
        qx = np.asarray(self._qx, float)
        qu = np.asarray(self._qu, float)
        for k in range(N):
            H[xi(k), xi(k)] = np.asarray(self.stat.Hx, float)
            H[ui(k), ui(k)] = np.asarray(self.stat.Hu, float)
            f[xi(k)] = qx[k]
            f[ui(k)] = qu[k]
        H[xi(N), xi(N)] = np.asarray(self.stat.HxN, float)
        f[xi(N)] = qx[N]

        n_eq = N * nx + (nx if x0 is not None else 0)
        Aeq = np.zeros((n_eq, nv))
        beq = np.zeros(n_eq)
        for k in range(N):
            r = slice(k * nx, (k + 1) * nx)
            Aeq[r, xi(k)] = A[k]
            Aeq[r, ui(k)] = B[k]
            Aeq[r, xi(k + 1)] = -np.eye(nx)
            beq[r] = -c[k]
        if x0 is not None:
            Aeq[N * nx:, xi(0)] = np.eye(nx)
            beq[N * nx:] = -np.asarray(x0, float).ravel()

        A_in = np.zeros((N * ni + ni_f, nv))
        b_in = np.zeros(N * ni + ni_f)
        for k in range(N):
            r = slice(k * ni, (k + 1) * ni)
            A_in[r, xi(k)] = Gx
            A_in[r, ui(k)] = Gu
            b_in[r] = h[k]
        A_in[N * ni:, xi(N)] = Gf
        b_in[N * ni:] = hf
        return H, f, A_in, b_in, Aeq, beq

    def _export_quadprog(self, x0, solve_ret: dict):
        """Dump the current QP + its solution as a MATLAB quadprog problem
        (fields match the reference's savemat at qp_jit.py:926-941)."""
        import os

        from scipy.io import savemat

        os.makedirs(self.export_dir, exist_ok=True)
        H, f, A_in, b_in, Aeq, beq = self.densify(x0)
        nv = H.shape[0]
        k = self._export_counter
        self._export_counter += 1
        out_path = os.path.join(self.export_dir, f"qp_export_{k:06d}.mat")
        savemat(out_path, {
            "H": H,
            "f": f,
            "A": A_in,
            "b": b_in,
            "Aeq": Aeq,
            "beq": beq,
            "lb": np.full(nv, -np.inf),
            "ub": np.full(nv, np.inf),
            "x0": np.asarray(x0, float).ravel(),
            "x_sol": np.asarray(solve_ret["primal_vec"], float).ravel(),
            "x_traj": np.asarray(solve_ret["primal_x"], float),
            "u_traj": np.asarray(solve_ret["primal_u"], float),
            "cost": float(solve_ret["cost"]),
            "backend": np.array(self.backend),
            "dimensions": np.array([self.m.nx, self.m.nu, self.N], np.int32),
        })
        if self.verbose:
            print(f"Saved quadprog export to {out_path}")
        return out_path
