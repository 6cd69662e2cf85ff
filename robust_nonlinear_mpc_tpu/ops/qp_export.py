"""QP export for external validation.

Parity with the reference's MATLAB-quadprog dump (`qp_jit.py:884-943`
`_export_quadprog`): any structured QP instance can be densified and saved
as a .mat file with quadprog-convention fields (H, f, A, b, Aeq, beq, lb,
ub) plus the solution, so solutions can be cross-checked offline in MATLAB
or any other environment.
"""

from __future__ import annotations

import os
from datetime import datetime

import numpy as np
from scipy.io import savemat


def densify(stat, data):
    """Structured (QPStatics, QPData) -> dense quadprog-style matrices.

    Returns dict with H (quadprog convention: min 1/2 x'Hx + f'x), f, Aeq,
    beq (dynamics + x0 pin), A, b (inequalities), lb, ub over the stage-wise
    variable y = [x0; u0; ...; xN].
    """
    A_d = np.asarray(data.A)
    B_d = np.asarray(data.B)
    c = np.asarray(data.c)
    qx = np.asarray(data.qx)
    qu = np.asarray(data.qu)
    h = np.asarray(data.h)
    hf = np.asarray(data.hf)
    xinit = np.asarray(data.xinit)

    N, nx = c.shape
    nu = B_d.shape[2]

    def stage(M, k):
        M = np.asarray(M)
        return M[k] if M.ndim == 3 else M

    ni = np.asarray(stat.Gx).shape[-2]
    ni_f = np.asarray(stat.Gf).shape[0]
    nv = (nx + nu) * N + nx

    def xi(k):
        return slice(k * (nx + nu), k * (nx + nu) + nx)

    def ui(k):
        return slice(k * (nx + nu) + nx, (k + 1) * (nx + nu))

    H = np.zeros((nv, nv))
    f = np.zeros(nv)
    for k in range(N):
        H[xi(k), xi(k)] = stage(stat.Hx, k)
        H[ui(k), ui(k)] = stage(stat.Hu, k)
        f[xi(k)] = qx[k]
        f[ui(k)] = qu[k]
    H[xi(N), xi(N)] = np.asarray(stat.HxN)
    f[xi(N)] = qx[N]

    Aeq = np.zeros((N * nx + nx, nv))
    beq = np.zeros(N * nx + nx)
    for k in range(N):
        r = slice(k * nx, (k + 1) * nx)
        Aeq[r, xi(k)] = A_d[k]
        Aeq[r, ui(k)] = B_d[k]
        Aeq[r, xi(k + 1)] = -np.eye(nx)
        beq[r] = -c[k]
    Aeq[N * nx :, xi(0)] = np.eye(nx)
    beq[N * nx :] = xinit

    Ain = np.zeros((N * ni + ni_f, nv))
    b = np.zeros(N * ni + ni_f)
    for k in range(N):
        r = slice(k * ni, (k + 1) * ni)
        Ain[r, xi(k)] = stage(stat.Gx, k)
        Ain[r, ui(k)] = stage(stat.Gu, k)
        b[r] = h[k]
    Ain[N * ni :, xi(N)] = np.asarray(stat.Gf)
    b[N * ni :] = hf

    lb = -np.inf * np.ones(nv)
    ub = np.inf * np.ones(nv)
    return {
        "H": H, "f": f, "Aeq": Aeq, "beq": beq, "A": Ain, "b": b,
        "lb": lb, "ub": ub,
        "dimensions": np.array([nx, nu, N], dtype=np.int32),
    }


def export_quadprog(stat, data, solution=None, out_dir="build/quadprog_exports",
                    tag=""):
    """Save a quadprog-style .mat of one QP (+ optional solution). Returns path."""
    os.makedirs(out_dir, exist_ok=True)
    payload = densify(stat, data)
    if solution is not None:
        payload["x_traj"] = np.asarray(solution.X)
        payload["u_traj"] = np.asarray(solution.U)
        payload["cost"] = float(solution.cost)
    stamp = datetime.now().strftime("%Y%m%d_%H%M%S_%f")
    path = os.path.join(out_dir, f"qp_export_{tag}{stamp}.mat")
    savemat(path, payload)
    return path
