"""fast-SLS integration tests: tightened-QP consistency and the SLS tube
containment guarantee on an LTI system."""

import jax
import jax.numpy as jnp
import numpy as np

from robust_nonlinear_mpc_tpu.ops.qp_ipm import IPMOptions, QPStatics
from robust_nonlinear_mpc_tpu.ops.sls_kernels import SLSRegs
from robust_nonlinear_mpc_tpu.solvers.fast_sls import (
    FastSLSOptions,
    FastSLSPersist,
    SLSProblem,
    fast_sls_solve,
)


def _double_integrator_problem(N=8, tight=4.0):
    """LTI double integrator with box constraints pushed to activity."""
    nx, nu, nw = 2, 1, 2
    A = np.array([[1.0, 0.1], [0.0, 1.0]])
    B = np.array([[0.005], [0.1]])
    E = 0.02 * np.eye(2)
    Q = np.eye(nx)
    R = 0.1 * np.eye(nu)
    Qf = 5 * np.eye(nx)
    G = np.vstack([np.eye(3), -np.eye(3)])  # box on [x; u]
    g = np.array([tight, tight, 2.0, tight, tight, 2.0])
    Gf = np.vstack([np.eye(2), -np.eye(2)])
    gf = np.array([tight, tight, tight, tight])

    stat = QPStatics(
        Hx=jnp.asarray(2 * Q), Hu=jnp.asarray(2 * R), HxN=jnp.asarray(2 * Qf),
        Gx=jnp.asarray(G[:, :nx]), Gu=jnp.asarray(G[:, nx:]), Gf=jnp.asarray(Gf),
    )
    regs = SLSRegs(
        Q_reg=jnp.asarray(10.0 * np.eye(nx)),
        R_reg=jnp.asarray(10.0 * np.eye(nu)),
        Q_reg_f=jnp.asarray(50.0 * np.eye(nx)),
    )
    prob = SLSProblem(
        stat=stat, regs=regs,
        E=jnp.broadcast_to(jnp.asarray(E)[None], (N + 1, nx, nw)),
    )
    Ab = jnp.broadcast_to(jnp.asarray(A)[None], (N, nx, nx))
    Bb = jnp.broadcast_to(jnp.asarray(B)[None], (N, nx, nu))
    c = jnp.zeros((N, nx))
    qx = jnp.zeros((N + 1, nx))
    qu = jnp.zeros((N, nu))
    g_res = jnp.broadcast_to(jnp.asarray(g)[None], (N, 6))
    gf_res = jnp.asarray(gf)
    return prob, Ab, Bb, c, qx, qu, g_res, gf_res, N, nx, nu, nw


def _solve(x0, rti_steps=0, N=8):
    prob, A, B, c, qx, qu, g_res, gf_res, N, nx, nu, nw = _double_integrator_problem(N)
    persist = FastSLSPersist.init(N, nx, nu, 6, 4, nw, jnp.zeros(0).dtype)
    opts = FastSLSOptions(
        rti_steps=rti_steps, max_iter=30, ipm=IPMOptions(max_iter=50, tol=1e-10)
    )
    sol = jax.jit(fast_sls_solve, static_argnums=(10,))(
        prob, A, B, c, qx, qu, g_res, gf_res, jnp.asarray(x0), persist, opts
    )
    return sol, (prob, A, B, c, g_res, gf_res)


def test_fast_sls_converges_and_tightens():
    sol, (prob, A, B, c, g_res, gf_res) = _solve(np.array([3.0, 0.5]))
    assert bool(sol.success)
    assert int(sol.iteration_number) >= 1
    # backoffs grow with the column index (more accumulated disturbance)
    bo = np.asarray(sol.backoff)
    assert np.all(bo[1:, 0] >= bo[:-1, 0] - 1e-12)
    # the primal satisfies the tightened constraints
    X, U = np.asarray(sol.X), np.asarray(sol.U)
    Gx, Gu = np.asarray(prob.stat.Gx), np.asarray(prob.stat.Gu)
    lhs = X[:-1] @ Gx.T + U @ Gu.T
    assert np.max(lhs - (np.asarray(g_res) - bo)) < 1e-7
    assert np.isfinite(float(sol.cost_tube))


def test_fast_sls_tube_containment_monte_carlo():
    """SLS guarantee: for any per-step disturbance ||w_j||_2 <= 1, the
    closed-loop deviations delta_z = Phi w satisfy G delta_z <= backoff."""
    sol, (prob, A, B, c, g_res, gf_res) = _solve(np.array([3.0, 0.5]))
    Phi_x = np.asarray(sol.Phi_x)
    Phi_u = np.asarray(sol.Phi_u)
    bo = np.asarray(sol.backoff)
    bof = np.asarray(sol.backoff_f)
    Gx, Gu, Gf = (
        np.asarray(prob.stat.Gx),
        np.asarray(prob.stat.Gu),
        np.asarray(prob.stat.Gf),
    )
    N, nw = Phi_u.shape[0], Phi_x.shape[3]
    rng = np.random.default_rng(0)
    for _ in range(200):
        w = rng.standard_normal((N + 1, nw))
        w /= np.maximum(np.linalg.norm(w, axis=1, keepdims=True), 1.0)
        dx = np.einsum("kjiw,jw->ki", Phi_x, w)
        du = np.einsum("kjuw,jw->ku", Phi_u, w)
        stage = dx[:N] @ Gx.T + du @ Gu.T
        assert np.max(stage - bo) < 1e-9
        assert np.max(Gf @ dx[N] - bof) < 1e-9

    # and the closed-loop dynamics are consistent with Phi:
    # simulate x+ = A x + B u + E w with u = sum_j K[k,j] (Phi-consistent)
    K = np.asarray(sol.K)
    E = np.asarray(prob.E)
    w = rng.standard_normal((N + 1, nw))
    x = np.zeros((N + 1, 2))
    u = np.zeros((N, 1))
    contrib = np.zeros((N + 1, N + 1, 2))  # per-column state contributions
    for j in range(N + 1):
        contrib[j, j] = E[j] @ w[j]
    for k in range(N):
        for j in range(k + 1):
            u_kj = K[k, j] @ contrib[k, j]
            contrib[k + 1, j] = np.asarray(A[k]) @ contrib[k, j] + np.asarray(B[k]) @ u_kj
            u[k] += u_kj
        x[k + 1] = contrib[k + 1, : k + 2].sum(axis=0)
    dx = np.einsum("kjiw,jw->ki", Phi_x, w)
    du = np.einsum("kjuw,jw->ku", Phi_u, w)
    np.testing.assert_allclose(x[1:], dx[1:], atol=1e-9)
    np.testing.assert_allclose(u, du, atol=1e-9)


def test_fast_sls_rti_mode_runs_fixed_steps():
    sol, _ = _solve(np.array([3.0, 0.5]), rti_steps=2)
    assert bool(sol.success)
    assert int(sol.iteration_number) <= 2


def test_fast_sls_vmap_batch():
    """Batched deviation solves must match per-instance solves."""
    prob, A, B, c, qx, qu, g_res, gf_res, N, nx, nu, nw = _double_integrator_problem()
    opts = FastSLSOptions(rti_steps=2, ipm=IPMOptions(max_iter=50, tol=1e-10))
    persist = FastSLSPersist.init(N, nx, nu, 6, 4, nw, jnp.zeros(0).dtype)
    x0s = jnp.asarray(np.random.default_rng(1).uniform(-2, 2, (5, nx)))

    f = jax.jit(
        jax.vmap(
            lambda x0: fast_sls_solve(
                prob, A, B, c, qx, qu, g_res, gf_res, x0, persist, opts
            )
        )
    )
    bsol = f(x0s)
    for i in range(5):
        s = fast_sls_solve(prob, A, B, c, qx, qu, g_res, gf_res, x0s[i], persist, opts)
        np.testing.assert_allclose(np.asarray(bsol.U[i]), np.asarray(s.U), atol=1e-7)
        np.testing.assert_allclose(
            np.asarray(bsol.backoff[i]), np.asarray(s.backoff), atol=1e-8
        )


def test_fast_sls_streaming_response_matches():
    """streaming_response=True must produce the same solve (X/U/backoffs/
    beta/tube cost) as the materializing path, with Phi left empty when the
    persist is allocated with store_phi=False."""
    x0 = np.array([3.0, 0.5])
    prob, A, B, c, qx, qu, g_res, gf_res, N, nx, nu, nw = _double_integrator_problem()
    dtype = jnp.zeros(0).dtype
    ipm = IPMOptions(max_iter=50, tol=1e-10)

    base = FastSLSOptions(rti_steps=2, ipm=ipm)
    stream = FastSLSOptions(rti_steps=2, ipm=ipm, streaming_response=True)

    p_full = FastSLSPersist.init(N, nx, nu, 6, 4, nw, dtype)
    p_slim = FastSLSPersist.init(N, nx, nu, 6, 4, nw, dtype, store_phi=False)
    assert p_slim.Phi_x.size == 0 and p_slim.Phi_u.size == 0

    f = jax.jit(fast_sls_solve, static_argnums=(10,))
    sol_a = f(prob, A, B, c, qx, qu, g_res, gf_res, jnp.asarray(x0), p_full, base)
    sol_b = f(prob, A, B, c, qx, qu, g_res, gf_res, jnp.asarray(x0), p_slim, stream)

    assert bool(sol_a.success) and bool(sol_b.success)
    np.testing.assert_allclose(np.asarray(sol_b.X), np.asarray(sol_a.X), atol=1e-12)
    np.testing.assert_allclose(np.asarray(sol_b.U), np.asarray(sol_a.U), atol=1e-12)
    np.testing.assert_allclose(np.asarray(sol_b.K), np.asarray(sol_a.K), atol=1e-12)
    np.testing.assert_allclose(np.asarray(sol_b.beta), np.asarray(sol_a.beta), atol=1e-14)
    np.testing.assert_allclose(
        np.asarray(sol_b.backoff), np.asarray(sol_a.backoff), atol=1e-14
    )
    np.testing.assert_allclose(
        np.asarray(sol_b.backoff_f), np.asarray(sol_a.backoff_f), atol=1e-14
    )
    np.testing.assert_allclose(
        float(sol_b.cost_tube), float(sol_a.cost_tube), rtol=1e-12
    )
    assert sol_b.Phi_x.size == 0  # never materialized


def test_fast_sls_recycle_eta_mode():
    """Dual-recycling RTI (one QP per solve): containment-relevant outputs
    (backoffs from the CURRENT linearization/gains) stay exact; eta persists
    across solves and converges toward the two-QP path's tube weights."""
    x0 = np.array([3.0, 0.5])
    prob, A, B, c, qx, qu, g_res, gf_res, N, nx, nu, nw = _double_integrator_problem()
    dtype = jnp.zeros(0).dtype
    ipm = IPMOptions(max_iter=50, tol=1e-10)
    opts_std = FastSLSOptions(rti_steps=1, ipm=ipm)
    opts_rec = FastSLSOptions(rti_steps=1, ipm=ipm, recycle_eta=True)
    f = jax.jit(fast_sls_solve, static_argnums=(10,))

    pers = FastSLSPersist.init(N, nx, nu, 6, 4, nw, dtype)
    sols = []
    for _ in range(6):  # thread persist across solves (LTI -> same A, B)
        sol = f(prob, A, B, c, qx, qu, g_res, gf_res, jnp.asarray(x0), pers, opts_rec)
        assert bool(sol.success)
        pers = sol.persist
        sols.append(sol)

    # first solve: eta was zero -> regularizer-only gains; later solves use
    # recycled duals -> eta nonzero
    assert float(jnp.max(jnp.abs(sols[1].eta))) > 0

    # single QP per solve (the standard RTI(1) path runs 2: untightened +
    # final tightened)
    p2 = FastSLSPersist.init(N, nx, nu, 6, 4, nw, dtype)
    sol_std = f(prob, A, B, c, qx, qu, g_res, gf_res, jnp.asarray(x0), p2, opts_std)
    assert int(sols[-1].qp_iters) < int(sol_std.qp_iters)

    # robustness is not lagged: Phi/backoffs correspond to the current K —
    # Monte-Carlo containment check identical to the two-QP path
    sol = sols[-1]
    Phi_x, Phi_u = np.asarray(sol.Phi_x), np.asarray(sol.Phi_u)
    bo, bof = np.asarray(sol.backoff), np.asarray(sol.backoff_f)
    Gx, Gu, Gf = map(np.asarray, (prob.stat.Gx, prob.stat.Gu, prob.stat.Gf))
    rng = np.random.default_rng(1)
    for _ in range(100):
        w = rng.standard_normal((N + 1, nw))
        w /= np.maximum(np.linalg.norm(w, axis=1, keepdims=True), 1.0)
        dx = np.einsum("kjiw,jw->ki", Phi_x, w)
        du = np.einsum("kjuw,jw->ku", Phi_u, w)
        assert np.max(dx[:N] @ Gx.T + du @ Gu.T - bo) < 1e-9
        assert np.max(Gf @ dx[N] - bof) < 1e-9

    # the primal satisfies its tightened constraints
    X, U = np.asarray(sol.X), np.asarray(sol.U)
    assert np.max(X[:-1] @ Gx.T + U @ Gu.T - (np.asarray(g_res) - bo)) < 1e-7

    # threading recycled duals across solves of the SAME problem is a
    # fixed-point iteration of the eta <-> (K, beta) map with one QP each:
    # it must stabilize (self-consistent tube), and land in the same
    # ballpark as the two-QP path. (Exact agreement is not expected: the
    # reference's convergence criterion is primal-only and exits before eta
    # reaches its own fixed point, SURVEY.md §2.2.)
    bo3, bo4 = np.asarray(sols[-2].backoff), np.asarray(sols[-1].backoff)
    assert np.max(np.abs(bo4 - bo3)) / np.max(bo4) < 2e-2
    bo_std = np.asarray(sol_std.backoff)
    mask = bo_std > 0.1 * np.max(bo_std)
    ratio = bo4[mask] / bo_std[mask]
    assert np.all(ratio > 0.5) and np.all(ratio < 2.0)


def test_fast_sls_recycle_warm_qp_matches_cold():
    """recycle_warm_qp: the IPM seeded from the previous solve's QP solution
    converges to the SAME optimum (the QP is strictly convex — warm starting
    changes iteration counts, never the solution) in no more iterations."""
    x0 = np.array([3.0, 0.5])
    prob, A, B, c, qx, qu, g_res, gf_res, N, nx, nu, nw = _double_integrator_problem()
    dtype = jnp.zeros(0).dtype
    ipm = IPMOptions(max_iter=50, tol=1e-10)
    opts_cold = FastSLSOptions(rti_steps=1, ipm=ipm, recycle_eta=True)
    opts_warm = opts_cold._replace(recycle_warm_qp=True)
    f = jax.jit(fast_sls_solve, static_argnums=(10,))

    pc = FastSLSPersist.init(N, nx, nu, 6, 4, nw, dtype)
    pw = FastSLSPersist.init(N, nx, nu, 6, 4, nw, dtype)
    total_cold = total_warm = 0
    for i in range(5):
        sc = f(prob, A, B, c, qx, qu, g_res, gf_res, jnp.asarray(x0), pc, opts_cold)
        sw = f(prob, A, B, c, qx, qu, g_res, gf_res, jnp.asarray(x0), pw, opts_warm)
        assert bool(sc.success) and bool(sw.success)
        np.testing.assert_allclose(np.asarray(sw.X), np.asarray(sc.X), atol=1e-8)
        np.testing.assert_allclose(np.asarray(sw.U), np.asarray(sc.U), atol=1e-8)
        np.testing.assert_allclose(
            np.asarray(sw.backoff), np.asarray(sc.backoff), atol=1e-8
        )
        pc, pw = sc.persist, sw.persist
        total_cold += int(sc.qp_iters)
        total_warm += int(sw.qp_iters)
        # the warm start is persisted and marked valid after the first solve
        assert bool(sw.persist.qp_warm.valid)
    # repeated solves of the same problem are the best case for a warm
    # start: after the first solve it must save iterations overall
    assert total_warm < total_cold


def test_fast_sls_condensed_kkt_matches():
    """fast-SLS with the condensed (scan-free) IPM Newton solver, sharing
    one per-solve condense() across its forward QPs, matches the Riccati
    path bit-for-tolerance."""
    x0 = np.array([3.0, 0.5])
    prob, A, B, c, qx, qu, g_res, gf_res, N, nx, nu, nw = _double_integrator_problem()
    dtype = jnp.zeros(0).dtype
    f = jax.jit(fast_sls_solve, static_argnums=(10,))
    base = FastSLSOptions(rti_steps=2, ipm=IPMOptions(max_iter=50, tol=1e-10))
    cond = base._replace(ipm=base.ipm._replace(kkt="condensed"))
    p1 = FastSLSPersist.init(N, nx, nu, 6, 4, nw, dtype)
    p2 = FastSLSPersist.init(N, nx, nu, 6, 4, nw, dtype)
    s1 = f(prob, A, B, c, qx, qu, g_res, gf_res, jnp.asarray(x0), p1, base)
    s2 = f(prob, A, B, c, qx, qu, g_res, gf_res, jnp.asarray(x0), p2, cond)
    assert bool(s1.success) and bool(s2.success)
    np.testing.assert_allclose(np.asarray(s2.X), np.asarray(s1.X), atol=1e-9)
    np.testing.assert_allclose(np.asarray(s2.U), np.asarray(s1.U), atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(s2.backoff), np.asarray(s1.backoff), atol=1e-9
    )


def test_sls_block_option_matches_folded():
    """FastSLSOptions.sls_block plumbs the triangular column-blocked kernels
    into the solve; results must match the folded default to roundoff
    amplification (the kernels themselves are roundoff-equal,
    tests/test_sls_kernels.py). Shallow single-solve program only — the
    blocked variants are not XLA:CPU-safe inside the deeper SCP/SQP nests
    (see solvers/fast_sls.py)."""
    prob, A, B, c, qx, qu, g_res, gf_res, N, nx, nu, nw = (
        _double_integrator_problem(N=6)
    )
    persist = FastSLSPersist.init(N, nx, nu, 6, 4, nw, jnp.zeros(0).dtype)
    x0 = jnp.asarray(np.array([3.0, 0.5]))

    def run(block):
        opts = FastSLSOptions(
            rti_steps=2, streaming_response=True, sls_block=block,
            ipm=IPMOptions(max_iter=50, tol=1e-10),
        )
        return jax.jit(fast_sls_solve, static_argnums=(10,))(
            prob, A, B, c, qx, qu, g_res, gf_res, x0, persist, opts
        )

    s0 = run(0)
    s3 = run(3)  # does not divide N -> ragged last segment exercised
    assert bool(s0.success) and bool(s3.success)
    np.testing.assert_allclose(np.asarray(s3.X), np.asarray(s0.X), atol=1e-8)
    np.testing.assert_allclose(np.asarray(s3.U), np.asarray(s0.U), atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(s3.backoff), np.asarray(s0.backoff), atol=1e-9
    )
    np.testing.assert_allclose(
        float(s3.cost_tube), float(s0.cost_tube), rtol=1e-9
    )


def test_fast_sls_verbose_iteration_table(capfd):
    """opts.verbose emits the inner iteration table (reference fast_SLS
    PrettyTable, fast_SLS_jit.py:346-403) via jax.debug.print, and the flag
    does not change the solution."""
    prob, A, B, c, qx, qu, g_res, gf_res, N, nx, nu, nw = _double_integrator_problem()
    persist = FastSLSPersist.init(N, nx, nu, 6, 4, nw, jnp.zeros(0).dtype)
    ipm = IPMOptions(max_iter=50, tol=1e-10)
    x0 = jnp.asarray(np.array([3.0, 0.5]))

    quiet = fast_sls_solve(
        prob, A, B, c, qx, qu, g_res, gf_res, x0, persist,
        FastSLSOptions(rti_steps=2, ipm=ipm),
    )
    jax.block_until_ready(quiet.X)
    capfd.readouterr()  # drop anything buffered so far

    loud = fast_sls_solve(
        prob, A, B, c, qx, qu, g_res, gf_res, x0, persist,
        FastSLSOptions(rti_steps=2, ipm=ipm, verbose=True, verbose_tab="  "),
    )
    jax.block_until_ready(loud.X)
    jax.effects_barrier()
    out = capfd.readouterr().out
    assert "cost tube" in out          # header row
    lines = [l for l in out.splitlines() if l.strip() and "cost tube" not in l]
    assert len(lines) >= 2             # one row per RTI iteration
    assert all(l.startswith("  ") for l in lines)  # verbose_tab indent
    np.testing.assert_allclose(
        np.asarray(loud.X), np.asarray(quiet.X), rtol=0, atol=0
    )


def test_warm_shift_persist_semantics():
    """warm_shift_persist stage/column-shifts eta (repeat-last boundary) and
    leaves qp_warm untouched (measured: shifting the warm QP iterate breaks
    failed-lane recovery — see the docstring)."""
    from robust_nonlinear_mpc_tpu.solvers.fast_sls import warm_shift_persist

    N, nx, nu, ni, ni_f, nw = 4, 2, 1, 3, 2, 2
    p = FastSLSPersist.init(N, nx, nu, ni, ni_f, nw, jnp.zeros(0).dtype)
    eta = jnp.arange(N * N * ni, dtype=jnp.float64).reshape(N, N, ni)
    eta_f = jnp.arange((N + 1) * ni_f, dtype=jnp.float64).reshape(N + 1, ni_f)
    qp_warm = p.qp_warm._replace(X=p.qp_warm.X + 7.0)
    p = p._replace(eta=eta, eta_f=eta_f, qp_warm=qp_warm)

    s = warm_shift_persist(p)
    # interior: s.eta[k, j] == eta[k+1, j+1]
    np.testing.assert_array_equal(np.asarray(s.eta[0, 0]), np.asarray(eta[1, 1]))
    np.testing.assert_array_equal(np.asarray(s.eta[1, 2]), np.asarray(eta[2, 3]))
    # boundaries repeat the last stage/column
    np.testing.assert_array_equal(np.asarray(s.eta[N - 1, 0]), np.asarray(eta[N - 1, 1]))
    np.testing.assert_array_equal(np.asarray(s.eta[0, N - 1]), np.asarray(eta[1, N - 1]))
    np.testing.assert_array_equal(np.asarray(s.eta_f[:-1]), np.asarray(eta_f[1:]))
    np.testing.assert_array_equal(np.asarray(s.eta_f[-1]), np.asarray(eta_f[-1]))
    # qp_warm and the non-recycled fields pass through verbatim
    np.testing.assert_array_equal(np.asarray(s.qp_warm.X), np.asarray(qp_warm.X))
    np.testing.assert_array_equal(np.asarray(s.K), np.asarray(p.K))


def test_fast_sls_adaptive_ipm_budget():
    """Steady-state-aware IPM budget (FastSLSOptions.adaptive_ipm_budget):
    a cold lane runs at the full cold cap; once a QP converges inside the
    steady cap the persisted flag flips and subsequent solves run at the
    steady cap — and the budgeted solution matches the uncapped one when
    the steady budget suffices. The cap is a traced value (no recompile)."""
    prob, A, B, c, qx, qu, g_res, gf_res, N, nx, nu, nw = (
        _double_integrator_problem()
    )
    dtype = jnp.zeros(0).dtype
    x0 = jnp.asarray(np.array([1.5, 0.5]))

    run = jax.jit(fast_sls_solve, static_argnums=(10,))

    # uncapped reference
    p0 = FastSLSPersist.init(N, nx, nu, 6, 4, nw, dtype)
    o_ref = FastSLSOptions(rti_steps=1, ipm=IPMOptions(max_iter=50, tol=1e-10))
    s_ref = run(prob, A, B, c, qx, qu, g_res, gf_res, x0, p0, o_ref)
    assert bool(s_ref.success)

    # adaptive: steady cap deliberately generous (20) so the first cold
    # solve (cold cap 50) flips the lane to steady
    o_ad = o_ref._replace(adaptive_ipm_budget=(20, 50))
    p1 = FastSLSPersist.init(N, nx, nu, 6, 4, nw, dtype)
    assert not bool(p1.qp_steady)
    s1 = run(prob, A, B, c, qx, qu, g_res, gf_res, x0, p1, o_ad)
    assert bool(s1.success)
    assert bool(s1.persist.qp_steady)
    np.testing.assert_allclose(np.asarray(s1.U), np.asarray(s_ref.U), atol=1e-9)

    # second (steady) solve runs under the steady cap and still matches
    s2 = run(prob, A, B, c, qx, qu, g_res, gf_res, x0, s1.persist, o_ad)
    assert bool(s2.success) and bool(s2.persist.qp_steady)

    # a choked steady cap (1 iteration) must flip the lane back to cold
    o_choke = o_ref._replace(adaptive_ipm_budget=(1, 50))
    p_steady = p1._replace(qp_steady=jnp.array(True))
    s3 = run(prob, A, B, c, qx, qu, g_res, gf_res, x0, p_steady, o_choke)
    assert not bool(s3.persist.qp_steady)
