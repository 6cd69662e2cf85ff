"""Independent numpy/scipy oracles used to validate the JAX kernels.

These are deliberately naive, loop-based implementations of the published
SCP-SLS math (arXiv:2005.13297) written directly from the equations — the
test suite checks the vectorized JAX kernels against them and checks the QP
kernel against scipy's SLSQP on densified problems.
"""

from __future__ import annotations

import numpy as np
from scipy.optimize import minimize


# ----------------------------------------------------------------------
# Dense QP oracle
# ----------------------------------------------------------------------
def dense_qp_reference(P, q, Aeq, beq, Ain, bin_, x0=None, tol=1e-12):
    """Solve min x'Px + q'x s.t. Aeq x = beq, Ain x <= bin via SLSQP."""
    n = P.shape[0]
    if x0 is None:
        x0 = np.zeros(n)

    def f(x):
        return float(x @ P @ x + q @ x)

    def jac(x):
        return 2 * P @ x + q

    cons = []
    if Aeq is not None and Aeq.shape[0]:
        cons.append({"type": "eq", "fun": lambda x: Aeq @ x - beq, "jac": lambda x: Aeq})
    if Ain is not None and Ain.shape[0]:
        cons.append(
            {"type": "ineq", "fun": lambda x: bin_ - Ain @ x, "jac": lambda x: -Ain}
        )
    res = minimize(
        f, x0, jac=jac, constraints=cons, method="SLSQP",
        options={"maxiter": 1000, "ftol": tol},
    )
    return res.x, res.fun, res.status


def densify_qp(stat, data):
    """Build dense (P, q, Aeq, beq, Ain, bin) over y = [x0;u0;...;xN] from the
    structured QPStatics/QPData pytrees (numpy)."""
    A = np.asarray(data.A)
    B = np.asarray(data.B)
    c = np.asarray(data.c)
    qx = np.asarray(data.qx)
    qu = np.asarray(data.qu)
    h = np.asarray(data.h)
    hf = np.asarray(data.hf)
    xinit = np.asarray(data.xinit)
    Hx, Hu, HxN = np.asarray(stat.Hx), np.asarray(stat.Hu), np.asarray(stat.HxN)
    Gx, Gu, Gf = np.asarray(stat.Gx), np.asarray(stat.Gu), np.asarray(stat.Gf)

    N, nx = c.shape
    nu = B.shape[2]
    ni = Gx.shape[0]
    ni_f = Gf.shape[0]
    nv = (nx + nu) * N + nx

    def xi(k):
        return slice(k * (nx + nu), k * (nx + nu) + nx)

    def ui(k):
        return slice(k * (nx + nu) + nx, (k + 1) * (nx + nu))

    P = np.zeros((nv, nv))
    q = np.zeros(nv)
    for k in range(N):
        P[xi(k), xi(k)] = Hx / 2
        P[ui(k), ui(k)] = Hu / 2
        q[xi(k)] = qx[k]
        q[ui(k)] = qu[k]
    P[xi(N), xi(N)] = HxN / 2
    q[xi(N)] = qx[N]

    Aeq = np.zeros((N * nx + nx, nv))
    beq = np.zeros(N * nx + nx)
    for k in range(N):
        r = slice(k * nx, (k + 1) * nx)
        Aeq[r, xi(k)] = A[k]
        Aeq[r, ui(k)] = B[k]
        Aeq[r, xi(k + 1)] = -np.eye(nx)
        beq[r] = -c[k]
    Aeq[N * nx :, xi(0)] = np.eye(nx)
    beq[N * nx :] = xinit

    Ain = np.zeros((N * ni + ni_f, nv))
    bin_ = np.zeros(N * ni + ni_f)
    for k in range(N):
        r = slice(k * ni, (k + 1) * ni)
        Ain[r, xi(k)] = Gx
        Ain[r, ui(k)] = Gu
        bin_[r] = h[k]
    Ain[N * ni :, xi(N)] = Gf
    bin_[N * ni :] = hf
    return P, q, Aeq, beq, Ain, bin_


# ----------------------------------------------------------------------
# Naive SLS oracles (direct transcription of the math)
# ----------------------------------------------------------------------
def eta_np(mu, mu_f, beta, beta_f, eps):
    N, ni = mu.shape
    ni_f = mu_f.shape[0]
    b = np.maximum(beta, eps)
    b_f = np.maximum(beta_f, eps)
    eta = np.zeros((N, N, ni))
    for j in range(N):
        for k in range(j, N):
            eta[k, j] = mu[k] / (2.0 * np.sqrt(b[k, j]))
    eta_f = np.zeros((N + 1, ni_f))
    for j in range(N + 1):
        eta_f[j] = mu_f / (2.0 * np.sqrt(b_f[j]))
    return eta, eta_f


def riccati_np(A, B, Cx, Cu, Sk):
    x = B.T @ Sk
    y = A.T @ Sk
    H = Cu + x @ B
    K = -np.linalg.solve(H, x @ A)
    S = Cx + y @ (A + B @ K)
    return K, 0.5 * (S + S.T)


def backward_np(A, B, G, Gf, eta, eta_f, Qr, Rr, Qrf):
    N, nx = A.shape[0], A.shape[1]
    nu = B.shape[2]
    S = np.zeros((N + 1, N + 1, nx, nx))
    K = np.zeros((N, N + 1, nu, nx))
    for j in range(N + 1):
        S[N, j] = Gf.T @ (eta_f[j][:, None] * Gf) + Qrf
        for k in range(N - 1, j - 1, -1):
            C = G.T @ (eta[k, j][:, None] * G)
            Cxx = C[:nx, :nx] + Qr
            Cuu = C[nx:, nx:] + Rr
            K[k, j], S[k, j] = riccati_np(A[k], B[k], Cxx, Cuu, S[k + 1, j])
    return S, K


def propagate_np(A, B, E, K):
    N, nx = A.shape[0], A.shape[1]
    nu = B.shape[2]
    nw = E.shape[2]
    Phi_x = np.zeros((N + 1, N + 1, nx, nw))
    Phi_u = np.zeros((N, N + 1, nu, nw))
    for j in range(N + 1):
        Phi_x[j, j] = E[j]
    for k in range(N):
        for j in range(k + 1):
            Phi_u[k, j] = K[k, j] @ Phi_x[k, j]
            Phi_x[k + 1, j] = (A[k] + B[k] @ K[k, j]) @ Phi_x[k, j]
    return Phi_x, Phi_u


def backoff_np(Phi_x, Phi_u, Gx, Gu, Gf, eps):
    N = Phi_u.shape[0]
    ni = Gx.shape[0]
    ni_f = Gf.shape[0]
    beta = np.zeros((N, N, ni))
    for k in range(N):
        for j in range(k + 1):
            Z = Gx @ Phi_x[k, j] + Gu @ Phi_u[k, j]
            beta[k, j] = np.maximum(np.sum(Z * Z, axis=1), eps)
    beta_f = np.zeros((N + 1, ni_f))
    for j in range(N + 1):
        Zf = Gf @ Phi_x[N, j]
        beta_f[j] = np.maximum(np.sum(Zf * Zf, axis=1), eps)
    backoff = np.zeros((N, ni))
    for k in range(N):
        backoff[k] = np.sum(np.sqrt(beta[k, : k + 1]), axis=0)
    backoff_f = np.sum(np.sqrt(beta_f), axis=0)
    return beta, beta_f, backoff, backoff_f


def tube_cost_np(Phi_x, Phi_u, Qr, Rr, Qrf):
    import scipy.linalg as sla

    N = Phi_u.shape[0]
    nx = Phi_x.shape[2]
    nu = Phi_u.shape[2]
    nw = Phi_x.shape[3]

    def t2m(t):
        P_, M_, n_, m_ = t.shape
        return t.transpose(0, 2, 1, 3).reshape(P_ * n_, M_ * m_)

    Q_blk = sla.block_diag(np.kron(np.eye(N), Qr), Qrf)
    R_blk = np.kron(np.eye(N), Rr)
    Phi = np.vstack([t2m(Phi_x), t2m(Phi_u)])
    return np.linalg.norm(sla.block_diag(Q_blk, R_blk) @ Phi, ord="fro")
