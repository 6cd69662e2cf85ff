"""Dense f64 Mehrotra predictor-corrector QP solver (oracle stand-in for OSQP).

Solves    min_y  y' P y + q' y
          s.t.   C y  = d
                 F y <= h

to ~1e-10 KKT accuracy — the role OSQP at eps_abs = eps_rel = 1e-9 with
polish plays in the reference (`/root/reference/solver/qp_jit.py:287-306`).
Deliberately structure-free: every Newton step is one dense
`scipy.linalg.lu_solve` on the full (ny + n_eq) KKT system, so the solver
shares no code or algorithmic structure with the framework's Riccati-KKT
IPM (robust_nonlinear_mpc_tpu/ops/qp_ipm.py).

Sign conventions match OSQP's duals (qp_jit.py:493-513): stationarity is
2 P y + q + C' nu + F' lam = 0 with lam >= 0 on active upper bounds.
"""

from __future__ import annotations

import numpy as np
import scipy.linalg as sla


# IPM initial slack floor. 1.0 is the oracle's production value; the
# sensitivity probe (sensitivity.py) perturbs it to 3.0 — both give an
# EXACT solver at tol=1e-10, so any closed-loop divergence between the two
# measures the loop's intrinsic sensitivity to the QP solver's selection
# among near-optimal solutions, not solver error (PARITY.md).
INIT_SLACK = 1.0


def solve_dense_qp(P, q, C, d, F, h, *, tol=1e-10, max_iter=100):
    """Return dict(y, nu, lam, s, cost, iters, success)."""
    P = np.asarray(P, float)
    q = np.asarray(q, float).ravel()
    C = np.asarray(C, float)
    d = np.asarray(d, float).ravel()
    F = np.asarray(F, float)
    h = np.asarray(h, float).ravel()
    ny = q.size
    ne = d.size
    mi = h.size

    H = 2.0 * P

    # --- initial point: equality-constrained minimizer, positive (s, lam) ---
    KKT0 = np.zeros((ny + ne, ny + ne))
    KKT0[:ny, :ny] = H + 1e-12 * np.eye(ny)
    KKT0[:ny, ny:] = C.T
    KKT0[ny:, :ny] = C
    rhs0 = np.concatenate([-q, d])
    try:
        z0 = np.linalg.solve(KKT0, rhs0)
    except np.linalg.LinAlgError:
        z0 = np.linalg.lstsq(KKT0, rhs0, rcond=None)[0]
    y = z0[:ny]
    nu = z0[ny:]
    s = np.maximum(h - F @ y, INIT_SLACK)
    lam = np.ones(mi)

    scale = 1.0 + max(np.abs(q).max(initial=0.0), np.abs(h).max(initial=0.0),
                      np.abs(d).max(initial=0.0))

    success = False
    it = 0
    for it in range(1, max_iter + 1):
        r_d = H @ y + q + C.T @ nu + F.T @ lam
        r_p = C @ y - d
        r_g = F @ y + s - h
        gap = float(lam @ s) / max(mi, 1)

        if (
            np.abs(r_d).max(initial=0.0) <= tol * scale
            and np.abs(r_p).max(initial=0.0) <= tol * scale
            and np.abs(r_g).max(initial=0.0) <= tol * scale
            and gap <= tol * scale
        ):
            success = True
            break

        # one LU factorization per iteration, two solves (affine + corrector)
        D = lam / s
        M = H + F.T @ (D[:, None] * F)
        KKT = np.zeros((ny + ne, ny + ne))
        KKT[:ny, :ny] = M
        KKT[:ny, ny:] = C.T
        KKT[ny:, :ny] = C
        try:
            lu = sla.lu_factor(KKT)
        except (np.linalg.LinAlgError, ValueError):
            break

        def newton(r_c):
            rhs = np.concatenate(
                [-r_d - F.T @ ((lam * r_g - r_c) / s), -r_p]
            )
            dz = sla.lu_solve(lu, rhs)
            dy = dz[:ny]
            dnu = dz[ny:]
            # dlam = (lam/s) (F dy) + (lam r_g - r_c)/s
            dlam = (lam * (F @ dy) + lam * r_g - r_c) / s
            ds = -(r_c + s * dlam) / lam
            return dy, dnu, dlam, ds

        def max_step(v, dv):
            neg = dv < 0
            if not np.any(neg):
                return 1.0
            return float(min(1.0, np.min(-v[neg] / dv[neg])))

        # affine (predictor) direction
        dy_a, dnu_a, dlam_a, ds_a = newton(lam * s)
        a_p = max_step(s, ds_a)
        a_d = max_step(lam, dlam_a)
        gap_aff = float((lam + a_d * dlam_a) @ (s + a_p * ds_a)) / max(mi, 1)
        mu = float(lam @ s) / max(mi, 1)
        sigma = (gap_aff / max(mu, 1e-300)) ** 3 if mu > 0 else 0.0
        sigma = min(max(sigma, 0.0), 1.0)

        # corrector
        r_c = lam * s + dlam_a * ds_a - sigma * mu
        dy, dnu, dlam, ds = newton(r_c)
        a_p = max_step(s, ds)
        a_d = max_step(lam, dlam)
        step = 0.99995 * min(a_p, a_d)
        step = min(1.0, step)

        y = y + step * dy
        nu = nu + step * dnu
        lam = np.maximum(lam + step * dlam, 1e-300)
        s = np.maximum(s + step * ds, 1e-300)

        if not np.all(np.isfinite(y)):
            break

    cost = float(y @ P @ y + q @ y)
    return {
        "y": y,
        "nu": nu,
        "lam": lam,
        "s": s,
        "cost": cost,
        "iters": it,
        "success": bool(success and np.all(np.isfinite(y))),
    }
