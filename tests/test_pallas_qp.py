"""Fused Pallas IPM Newton kernels vs the qp_ipm scan implementations.

Interpret mode on CPU (exact math, no TPU). The kernels replace the XLA
Riccati Newton solve (`_factorize_with_presolve` + `_forward_sweep` +
`_solve_newton`) when IPMOptions(kkt="pallas") and the solve is vmapped;
unbatched calls run equivalent XLA scan fallbacks.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from robust_nonlinear_mpc_tpu.ops.qp_ipm import (
    IPMOptions,
    QPData,
    QPStatics,
    _curvature,
    _factorize_with_presolve,
    _forward_sweep,
    _solve_newton,
    solve_qp,
)
from robust_nonlinear_mpc_tpu.ops.pallas_qp import (
    _factor_predictor_batched,
    _fallback_factor_predictor,
    _fallback_resolve,
    _resolve_batched,
)

Bc, N, nx, ni, ni_f = 3, 6, 5, 8, 6


def _mk(nu, seed):
    rng = np.random.default_rng(seed)
    A = 0.9 * np.eye(nx) + 0.05 * rng.standard_normal((N, nx, nx))
    B = 0.2 * rng.standard_normal((N, nx, nu))
    stat = QPStatics(
        jnp.asarray(np.broadcast_to(2 * np.eye(nx), (N, nx, nx)).copy()),
        jnp.asarray(np.broadcast_to(2 * np.eye(nu), (N, nu, nu)).copy()),
        jnp.asarray(6 * np.eye(nx)),
        jnp.asarray(np.broadcast_to(rng.standard_normal((ni, nx)), (N, ni, nx)).copy()),
        jnp.asarray(np.broadcast_to(rng.standard_normal((ni, nu)), (N, ni, nu)).copy()),
        jnp.asarray(rng.standard_normal((ni_f, nx))),
    )
    data = QPData(
        jnp.asarray(A), jnp.asarray(B), jnp.zeros((N, nx)),
        jnp.zeros((N + 1, nx)), jnp.zeros((N, nu)),
        jnp.zeros((N, ni)), jnp.zeros(ni_f), jnp.zeros(nx),
    )
    W = jnp.asarray(np.abs(rng.standard_normal((N, ni))) + 0.1)
    Wf = jnp.asarray(np.abs(rng.standard_normal(ni_f)) + 0.1)
    rbx = rng.standard_normal((N, nx))
    rbx[0] = 0
    rhs = (jnp.asarray(rbx), jnp.asarray(rng.standard_normal(nx)),
           jnp.asarray(rng.standard_normal((N, nu))),
           jnp.asarray(rng.standard_normal((N, nx))))
    return stat, data, W, Wf, rhs


@pytest.mark.parametrize("nu", [1, 2, 4])
def test_pallas_newton_matches_scans(nu):
    probs = [_mk(nu, 10 + b) for b in range(Bc)]
    refs = []
    for stat, data, W, Wf, (rbx, rbxN, rbu, req) in probs:
        fact, (kff, pn) = _factorize_with_presolve(
            stat, data, W, Wf, rbx, rbxN, rbu, req
        )
        K, _, _, Pseq = fact
        refs.append(
            (_forward_sweep(data, K, kff, req, Pseq, pn), fact)
        )

    batch = lambda xs: jnp.stack(xs)
    A_b = batch([p[1].A for p in probs])
    B_b = batch([p[1].B for p in probs])
    Cs = [_curvature(p[0], p[2], p[3]) for p in probs]
    Cxx, Cuu, Cxu, PN = (batch([c[i] for c in Cs]) for i in range(4))
    rbx, rbxN, rbu, req = (
        batch([p[4][i] for p in probs]) for i in range(4)
    )

    dX, dU, dnu, fact = _factor_predictor_batched(
        A_b, B_b, Cxx, Cuu, Cxu, PN, rbx, rbxN, rbu, req,
        b_tile=4, interpret=True,
    )
    for b in range(Bc):
        (dXr, dUr, dnur), fct_r = refs[b]
        np.testing.assert_allclose(np.asarray(dX[b]), np.asarray(dXr), atol=1e-9)
        np.testing.assert_allclose(np.asarray(dU[b]), np.asarray(dUr), atol=1e-9)
        np.testing.assert_allclose(np.asarray(dnu[b]), np.asarray(dnur), atol=1e-9)
        np.testing.assert_allclose(
            np.asarray(fact[0][b]), np.asarray(fct_r[0]), atol=1e-9
        )

    # corrector re-solve against the cached factors, fresh rhs
    rng = np.random.default_rng(99)
    rbx2 = jnp.asarray(rng.standard_normal((Bc, N, nx)))
    rbxN2 = jnp.asarray(rng.standard_normal((Bc, nx)))
    rbu2 = jnp.asarray(rng.standard_normal((Bc, N, nu)))
    dX2, dU2, dnu2 = _resolve_batched(
        A_b, B_b, fact, rbx2, rbxN2, rbu2, req, b_tile=4, interpret=True
    )
    for b in range(Bc):
        stat, data = probs[b][0], probs[b][1]
        dXr, dUr, dnur = _solve_newton(
            stat, data, refs[b][1], rbx2[b], rbxN2[b], rbu2[b], probs[b][4][3]
        )
        np.testing.assert_allclose(np.asarray(dX2[b]), np.asarray(dXr), atol=1e-8)
        np.testing.assert_allclose(np.asarray(dU2[b]), np.asarray(dUr), atol=1e-8)
        np.testing.assert_allclose(np.asarray(dnu2[b]), np.asarray(dnur), atol=1e-8)

    # XLA fallbacks agree too (they define the unbatched kkt="pallas" path)
    for b in range(Bc):
        stat, data, W, Wf, (rbx1, rbxN1, rbu1, req1) = probs[b]
        Cb = _curvature(stat, W, Wf)
        fX, fU, fn, ffact = _fallback_factor_predictor(
            data.A, data.B, *Cb, rbx1, rbxN1, rbu1, req1
        )
        np.testing.assert_allclose(
            np.asarray(fX), np.asarray(refs[b][0][0]), atol=1e-10
        )
        rX, _, _ = _fallback_resolve(
            data.A, data.B, ffact, rbx2[b], rbxN2[b], rbu2[b], req1
        )
        dXr, _, _ = _solve_newton(
            stat, data, refs[b][1], rbx2[b], rbxN2[b], rbu2[b], req1
        )
        np.testing.assert_allclose(np.asarray(rX), np.asarray(dXr), atol=1e-8)


def test_solve_qp_kkt_pallas_full_ipm():
    """The complete Mehrotra IPM through the Pallas Newton path converges to
    the same optimum as the riccati path — batched (interpret kernels) and
    unbatched (scan fallbacks)."""
    nu = 2
    datas = []
    for b in range(Bc):
        rng = np.random.default_rng(200 + b)
        stat, data, _, _, _ = _mk(nu, 200 + b)
        data = data._replace(
            qx=jnp.asarray(0.1 * rng.standard_normal((N + 1, nx))),
            qu=jnp.asarray(0.1 * rng.standard_normal((N, nu))),
            c=jnp.asarray(0.01 * rng.standard_normal((N, nx))),
            h=jnp.asarray(4.0 + np.abs(rng.standard_normal((N, ni)))),
            hf=jnp.asarray(4.0 + np.abs(rng.standard_normal(ni_f))),
            xinit=jnp.asarray(0.3 * rng.standard_normal(nx)),
        )
        datas.append(data)
    stat = _mk(nu, 200)[0]
    datab = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *datas)

    o_r = IPMOptions(max_iter=40, tol=1e-10)
    o_p = IPMOptions(max_iter=40, tol=1e-10, kkt="pallas")
    sol_r = jax.vmap(lambda d: solve_qp(stat, d, o_r))(datab)
    sol_p = jax.vmap(lambda d: solve_qp(stat, d, o_p))(datab)
    assert bool(jnp.all(sol_r.success)) and bool(jnp.all(sol_p.success))
    np.testing.assert_allclose(np.asarray(sol_p.X), np.asarray(sol_r.X), atol=1e-7)
    np.testing.assert_allclose(np.asarray(sol_p.U), np.asarray(sol_r.U), atol=1e-7)

    s1 = solve_qp(stat, datas[0], o_p)   # unbatched -> scan fallbacks
    assert bool(s1.success)
    np.testing.assert_allclose(np.asarray(s1.X), np.asarray(sol_r.X[0]), atol=1e-7)


def test_solve_qp_kkt_pallas_iter_full_ipm():
    """The fully fused whole-iteration kernel (kkt="pallas_iter",
    experimental — see the STATUS note in ops/pallas_qp.py) converges to the
    same optimum with the same iteration counts as the riccati path."""
    nu = 2
    datas = []
    for b in range(Bc):
        rng = np.random.default_rng(300 + b)
        stat, data, _, _, _ = _mk(nu, 300 + b)
        data = data._replace(
            qx=jnp.asarray(0.1 * rng.standard_normal((N + 1, nx))),
            qu=jnp.asarray(0.1 * rng.standard_normal((N, nu))),
            c=jnp.asarray(0.01 * rng.standard_normal((N, nx))),
            h=jnp.asarray(4.0 + np.abs(rng.standard_normal((N, ni)))),
            hf=jnp.asarray(4.0 + np.abs(rng.standard_normal(ni_f))),
            xinit=jnp.asarray(0.3 * rng.standard_normal(nx)),
        )
        datas.append(data)
    stat = _mk(nu, 300)[0]
    datab = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *datas)

    o_r = IPMOptions(max_iter=40, tol=1e-10)
    o_i = IPMOptions(max_iter=40, tol=1e-10, kkt="pallas_iter")
    sol_r = jax.vmap(lambda d: solve_qp(stat, d, o_r))(datab)
    sol_i = jax.vmap(lambda d: solve_qp(stat, d, o_i))(datab)
    assert bool(jnp.all(sol_i.success))
    np.testing.assert_array_equal(np.asarray(sol_i.iters), np.asarray(sol_r.iters))
    np.testing.assert_allclose(np.asarray(sol_i.X), np.asarray(sol_r.X), atol=1e-7)
    np.testing.assert_allclose(np.asarray(sol_i.U), np.asarray(sol_r.U), atol=1e-7)
    # unbatched path = the XLA replica of one fused iteration
    d0 = jax.tree_util.tree_map(lambda x: x[0], datab)
    s1 = solve_qp(stat, d0, o_i)
    assert bool(s1.success)
    np.testing.assert_allclose(np.asarray(s1.X), np.asarray(sol_r.X[0]), atol=1e-7)


@pytest.mark.parametrize("window", [2, 3, 4])
def test_windowed_newton_matches_single_kernel(window):
    """Blockwise-N windowed kernels (long-horizon VMEM fix) produce the
    SAME Newton solve as the single-kernel path: the stage axis becomes a
    sequential grid dimension with the Riccati carries (P, p, dx) persisted
    in scratch across windows. window=4 does not divide N=6 — it exercises
    the front-padding path (pass-through pad stages)."""
    from robust_nonlinear_mpc_tpu.ops.pallas_qp import (
        _factor_predictor_batched_win,
        _resolve_batched_win,
    )

    nu = 2
    probs = [_mk(nu, 40 + b) for b in range(Bc)]
    batch = lambda xs: jnp.stack(xs)
    A_b = batch([p[1].A for p in probs])
    B_b = batch([p[1].B for p in probs])
    Cs = [_curvature(p[0], p[2], p[3]) for p in probs]
    Cxx, Cuu, Cxu, PN = (batch([c[i] for c in Cs]) for i in range(4))
    rbx, rbxN, rbu, req = (
        batch([p[4][i] for p in probs]) for i in range(4)
    )

    ref = _factor_predictor_batched(
        A_b, B_b, Cxx, Cuu, Cxu, PN, rbx, rbxN, rbu, req,
        b_tile=4, interpret=True,
    )
    win = _factor_predictor_batched_win(
        A_b, B_b, Cxx, Cuu, Cxu, PN, rbx, rbxN, rbu, req,
        window, b_tile=4, interpret=True,
    )
    for r, w in zip(ref[:3], win[:3]):
        np.testing.assert_allclose(np.asarray(w), np.asarray(r), atol=1e-10)
    for r, w in zip(ref[3], win[3]):
        np.testing.assert_allclose(np.asarray(w), np.asarray(r), atol=1e-10)

    rng = np.random.default_rng(7)
    rbx2 = jnp.asarray(rng.standard_normal((Bc, N, nx)))
    rbxN2 = jnp.asarray(rng.standard_normal((Bc, nx)))
    rbu2 = jnp.asarray(rng.standard_normal((Bc, N, nu)))
    ref2 = _resolve_batched(
        A_b, B_b, ref[3], rbx2, rbxN2, rbu2, req, b_tile=4, interpret=True
    )
    win2 = _resolve_batched_win(
        A_b, B_b, ref[3], rbx2, rbxN2, rbu2, req, window,
        b_tile=4, interpret=True,
    )
    for r, w in zip(ref2, win2):
        np.testing.assert_allclose(np.asarray(w), np.asarray(r), atol=1e-10)


def test_windowed_dispatch_threshold(monkeypatch):
    """_factor_predictor_batched auto-routes to the windowed path above the
    fit envelope (the N>30 guard that replaced the RNM_BENCH_KKT=riccati
    workaround)."""
    import robust_nonlinear_mpc_tpu.ops.pallas_qp as pq

    assert pq._pick_window(15) == 15
    assert pq._pick_window(30) == 30
    assert pq._pick_window(60) == 30
    # non-divisors (incl. primes) window via front-padding — no window=1 cliff
    assert pq._pick_window(45) == 23
    assert pq._pick_window(59) == 30
    assert pq._pick_window(31) == 16
    monkeypatch.setattr(pq, "_WINDOW_N_MAX", 20)
    assert pq._pick_window(60) == 20
