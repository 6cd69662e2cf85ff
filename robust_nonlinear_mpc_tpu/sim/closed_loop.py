"""Closed-loop MPC simulation harnesses.

Two paths, same math:

  * `run_closed_loop` — the experiment-parity driver: a host loop around the
    stateful SCPSLSSolver reproducing the reference's per-step workflow
    {warm-shift, solve, apply u0, propagate + E w} and its npz field names
    (reference expe/main_*_robust_closed_loop.py).

  * `build_batched_closed_loop` — the TPU throughput path: the entire
    closed loop (nominal SQP init, per-step SCP/fast-SLS RTI iterations,
    warm shifting, plant rollout with disturbances) as ONE pure jitted
    function, `lax.scan` over time and `vmap` over scenario batches — this is
    what the reference fundamentally cannot do (single CPU process) and what
    the 10k-solves/s north star is measured on (BASELINE.json).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from robust_nonlinear_mpc_tpu.solvers.fast_sls import (
    FastSLSPersist,
    warm_shift_persist,
)
from robust_nonlinear_mpc_tpu.solvers.scp_sls import SCPSLSSolver
from robust_nonlinear_mpc_tpu.solvers.sqp import sqp_solve
from robust_nonlinear_mpc_tpu.utils.numerics import mv


class ClosedLoopLog(NamedTuple):
    state_trajectory: jax.Array       # (T, nx)
    input_trajectory: jax.Array       # (T-1, nu) (reference stores T-1 inputs)
    nominal_x: jax.Array              # (T, N+1, nx)
    nominal_u: jax.Array              # (T, N, nu)
    backoff_x: jax.Array              # (T, N+1, nx)
    backoff_u: jax.Array              # (T, N, nu)
    success: jax.Array                # (T,)
    qp_iters: jax.Array               # (T,)
    # failure taxonomy (VERDICT r3 item 2): SCP iterations spent this step,
    # and whether a failed step failed because an INNER solve failed
    # (infeasible-forward/QP failure) vs exhausted the SCP budget
    # unconverged (success=False & ~scp_failed)
    scp_iters: jax.Array = None       # (T,)
    scp_failed: jax.Array = None      # (T,) inner-solve failure flag


def run_closed_loop(
    model,
    solver: SCPSLSSolver,
    x0,
    sim_steps: int,
    *,
    noise: str = "none",           # "none" | "uniform" (reference rocket)
    rng: np.random.RandomState | None = None,
    verbose: bool = False,
):
    """Experiment-parity closed loop (host loop, stateful solver).

    noise="uniform": x+ = f(x, u0) + E w with w ~ U[-1, 1]^nx drawn from the
    *global-style* seeded RNG, matching the reference rocket experiment
    (main_rocket_robust_closed_loop.py:178-182 with np.random.seed(0)).
    """
    m = model
    N = solver.N
    x0 = np.asarray(x0, float).reshape(-1)
    if rng is None:
        rng = np.random.RandomState(0)

    T = sim_steps
    state_traj = np.zeros((m.nx, T))
    input_traj = np.zeros((m.nu, T - 1))
    nom_x = np.zeros((m.nx, N + 1, T))
    nom_u = np.zeros((m.nu, N, T))
    bo_x = np.zeros((m.nx, N + 1, T))
    bo_u = np.zeros((m.nu, N, T))
    t_solve = np.zeros((T, 1))

    state_traj[:, 0] = x0
    for i in range(T):
        if i > 0:
            solver.reset_warm_start()
        sol = solver.solve(x0)
        if "primal_x" not in sol:
            # unrecoverable failure (e.g. nominal init failed): stop here,
            # return the partial log with the failure marked
            print(f"[closed_loop] step {i}: solver failed hard; truncating run")
            break
        if not sol.get("success", False) and verbose:
            print(f"[closed_loop] step {i}: solver reported failure")
        t_solve[i] = sol.get("t_solve_ms", np.nan)

        bo_x[:, :, i] = sol["backoff_x"].T
        bo_u[:, :, i] = sol["backoff_u"].T
        nom_x[:, :, i] = sol["primal_x"]
        nom_u[:, :, i] = sol["primal_u"]
        state_traj[:, i] = sol["primal_x"][:, 0]

        u0 = sol["primal_u"][:, 0]
        if i < T - 1:
            input_traj[:, i] = u0

        x_next = np.asarray(m.ddyn(jnp.asarray(x0), jnp.asarray(u0)))
        if noise == "uniform":
            w = 2.0 * rng.rand(m.nx) - 1.0
            x_next = x_next + np.asarray(m.E) @ w
        x0 = x_next

    return {
        "state_trajectory": state_traj,
        "input_trajectory": input_traj,
        "nominal_trajectory_x": nom_x,
        "nominal_trajectory_u": nom_u,
        "backoff_trajectory_x": bo_x,
        "backoff_trajectory_u": bo_u,
        "dt": m.dt,
        "g": np.asarray(m.g),
        "nx": m.nx,
        "nu": m.nu,
        "simulation_time_steps": T,
        "N": N,
        # timings (ms): the solve is one fused XLA program; keep the
        # reference npz keys, all reporting the fused per-step solve time
        "t_jac": np.zeros((T, 1)),
        "t_qp": t_solve,
        "t_riccati": np.zeros((T, 1)),
        "t_solve": t_solve,
    }


def _accept_until_conv(X, U, res, it, restore, damp, damp_after):
    """Shared until-convergence acceptance: finite-gate + stall damping +
    feasibility restoration. make_mpc_step's scp_once and the chunked
    driver's scp_chunk body MUST run identical acceptance (the bit-for-bit
    equivalence contract of build_chunked_converged_loop) — one helper
    makes divergence impossible. Returns (X, U, ok, fail_now)."""
    finite = jnp.all(jnp.isfinite(res.X)) & jnp.all(jnp.isfinite(res.U))
    ok = res.success & finite
    if damp > 0.0:
        # stall damping (SCPSLSOptions.scp_stall_damping): damped
        # acceptance after the stall threshold collapses the
        # boundary-riding active-set limit cycle toward its center
        alpha = jnp.where(it >= damp_after, damp, 1.0).astype(X.dtype)
        X_acc = X + alpha * (res.X - X)
        U_acc = U + alpha * (res.U - U)
    else:
        X_acc, U_acc = res.X, res.U
    if restore:
        # feasibility restoration (solvers/restoration.py): on an inner
        # failure, accept the soft-slacked iterate and KEEP ITERATING
        # instead of failing the step; restored iterates never satisfy the
        # convergence branch, so step success semantics are unchanged
        rest = (~ok) & res.rest_ok
        X = jnp.where(ok, X_acc, jnp.where(rest, res.X_rest, X))
        U = jnp.where(ok, U_acc, jnp.where(rest, res.U_rest, U))
        fail_now = ~(ok | rest)
    else:
        X = jnp.where(ok, X_acc, X)
        U = jnp.where(ok, U_acc, U)
        fail_now = ~ok
    return X, U, ok, fail_now


# ----------------------------------------------------------------------
# Fully-jitted batched closed loop
# ----------------------------------------------------------------------
def make_mpc_step(solver: SCPSLSSolver):
    """One pure closed-loop MPC step: (carry, w_t) -> (carry', outputs).

    carry = (X, U, persist, x): the warm-start trajectory, the cross-step
    SLS state, and the true plant state. The step replicates the reference
    main loop exactly — `rti` SCP iterations, apply u0, propagate
    x+ = f(x, u0) + E w, warm-shift for the next step (reference
    reset_warm_start; SCPSLSSolver.reset_warm_start is the stateful twin of
    the shift logic here — keep them in sync). Shared by
    `build_batched_closed_loop` (lax.scan over time) and bench.py (one
    timed invocation per rep).
    """
    m = solver.m
    N = solver.N
    rti = int(solver.opts.rti)
    until_conv = rti <= 0  # reference until-convergence mode (SCP_SLS_jit.py:20-22)
    E = jnp.asarray(m.E, solver.dtype)
    fopts = solver._fast_sls_opts()

    def _accept(X, U, persist, res):
        # accept any FINITE iterate, even from a reported failure — a
        # capped/inaccurate QP still returns a Newton-ish step that
        # re-centers the nominal, and lanes recover within 1-2 steps
        # (measured: gating on success instead freezes a stale plan and
        # failed lanes never recover; no gate at all lets a non-finite
        # solve poison the warm start and the lane NaNs within ~30
        # steps). The reference updates unconditionally (socp_step,
        # SCP_SLS_jit.py:426-430) but never sees non-finite QP output
        # from OSQP at 1e-9 — finiteness is the f32/TPU-honest gate.
        finite = jnp.all(jnp.isfinite(res.X)) & jnp.all(jnp.isfinite(res.U))
        X = jnp.where(finite, res.X, X)
        U = jnp.where(finite, res.U, U)
        persist = jax.tree_util.tree_map(
            lambda new, old: jnp.where(finite, new, old), res.persist, persist
        )
        return X, U, persist, finite

    def mpc_step(carry, w_t):
        X, U, persist, x = carry
        if not until_conv:
            res = None
            # qp_iters = TOTAL IPM iterations this step (summed across the
            # rti loop), matching the until-convergence branch's accounting
            # so telemetry means the same thing in both modes
            qp_total = jnp.zeros((), jnp.int32)
            for _ in range(max(rti, 1)):
                res = solver._iteration(X, U, x, persist)
                X, U, persist, _ = _accept(X, U, persist, res)
                qp_total = qp_total + res.sls.qp_iters
            bx, bu = res.sls.backoff_x, res.sls.backoff_u
            success, qp_iters = res.success, qp_total
            scp_it = jnp.full((), max(rti, 1), jnp.int32)
            scp_failed = ~res.success
        else:
            # until-convergence SCP (the reference default, rti = -1): iterate
            # {linearize, fast-SLS} until the primal update satisfies
            # |delta|_inf < epsilon_convergence, the inner solve fails (the
            # host/reference loop breaks WITHOUT accepting a failed iterate,
            # SCP_SLS_jit.py:96-99 / SCPSLSSolver.solve), or max_iter_scp is
            # exhausted. Under vmap the while_loop bills the batch for its
            # slowest lane — this is the validation mode, not the throughput
            # mode.
            eps = solver.opts.epsilon_convergence
            max_scp = int(solver.opts.max_iter_scp)
            # NaN sentinel: a step whose FIRST SCP iteration fails has no
            # accepted backoffs — logging zeros would fake a zero-width tube
            # and downstream containment stats would count the step as a
            # tube miss on top of success=False. NaN makes "no tube
            # available" unmistakable; statistics must mask by log.success.
            zero_bx = jnp.full((N + 1, m.nx), jnp.nan, solver.dtype)
            zero_bu = jnp.full((N, m.nu), jnp.nan, solver.dtype)

            restore = bool(getattr(solver.opts, "feasibility_restoration", False))
            damp = float(getattr(solver.opts, "scp_stall_damping", 0.0))
            damp_after = int(getattr(solver.opts, "stall_damping_after", 15))

            def scp_once(st):
                X, U, persist, bx, bu, qpi, it, done, failed = st
                res = solver._iteration(X, U, x, persist)
                X, U, ok, fail_now = _accept_until_conv(
                    X, U, res, it, restore, damp, damp_after
                )
                persist = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(ok, new, old),
                    res.persist, persist,
                )
                bx = jnp.where(ok, res.sls.backoff_x, bx)
                bu = jnp.where(ok, res.sls.backoff_u, bu)
                delta = jnp.max(jnp.abs(res.delta_vec))
                return (X, U, persist, bx, bu, qpi + res.sls.qp_iters,
                        it + 1, ok & (delta < eps), fail_now)

            def cond(st):
                it, done, failed = st[6], st[7], st[8]
                return (~done) & (~failed) & (it < max_scp)

            st0 = (X, U, persist, zero_bx, zero_bu,
                   jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
                   jnp.array(False), jnp.array(False))
            st = jax.lax.while_loop(cond, scp_once, st0)
            (X, U, persist, bx, bu, qp_iters, scp_it, done, scp_failed) = st
            # step success = SCP reached the delta criterion (host solve
            # returns True exactly then)
            success = done
        u0 = U[0]
        x_next = m.ddyn(x, u0) + mv(E, w_t)
        # warm shift for the next step (reference reset_warm_start)
        Xs, Us = solver._warm_shift(X, U)
        persist_next = FastSLSPersist.init(
            N, m.nx, m.nu, m.ni, m.ni_f, m.nw, solver.dtype,
            keep_prev=persist.prev_primal,
            store_phi=persist.Phi_x.shape[1] > 0,
        )._replace(have_prev=persist.have_prev)
        if fopts.recycle_eta:
            # dual-recycling mode: eta must survive the warm shift (it IS
            # the recycled state), stage-shifted to stay aligned with the
            # advanced horizon (fast_sls.warm_shift_persist)
            shifted = warm_shift_persist(persist)
            persist_next = persist_next._replace(
                eta=shifted.eta, eta_f=shifted.eta_f
            )
            if fopts.recycle_warm_qp:
                persist_next = persist_next._replace(qp_warm=shifted.qp_warm)
        out = (
            x,
            u0,
            X,
            U,
            bx,
            bu,
            success,
            qp_iters,
            scp_it,
            scp_failed,
        )
        return (Xs, Us, persist_next, x_next), out

    return mpc_step


def build_chunked_converged_loop(
    solver: SCPSLSSolver,
    sim_steps: int,
    scp_per_dispatch: int = 2,
    mesh=None,
):
    """Until-convergence closed loop at TPU scale: bounded dispatches.

    The single-dispatch converged mode (build_batched_closed_loop with
    rti <= 0) runs the whole closed loop as ONE device program whose
    per-step `lax.while_loop` bills the batch for its slowest lane's full
    scp(max_iter_scp) x sls(sls_max_iter) budget — at >= 96 rocket lanes a
    single dispatch exceeds the device dispatch envelope (VERDICT r3
    missing-item 1; ROUND3.md investigation step 5). This driver is the
    dispatch-envelope analogue of the MC `--chunks` HBM fix: each device
    dispatch advances every unconverged lane by AT MOST `scp_per_dispatch`
    SCP iterations (each still containing the inner fast-SLS
    until-convergence loop — reference semantics,
    /root/reference/solver/SCP_SLS_jit.py:20-29, fast_SLS_jit.py:298-312),
    carrying (X, U, persist, backoffs, convergence/failure masks) between
    dispatches so converged lanes freeze and unconverged lanes resume.
    Per-lane iteration sequences are IDENTICAL to the single-dispatch
    while_loop (vmapped while_loop applies masked updates per lane), so
    results match bit-for-bit up to XLA fusion reordering — asserted by
    tests/test_closed_loop.py::test_chunked_converged_matches_single_dispatch.

    Returns run(x0s (B, nx), Ws (B, T, nw)) -> ClosedLoopLog with leading
    batch axis; a host loop of bounded jitted dispatches with early exit
    once every lane's step is decided.
    """
    m = solver.m
    N = solver.N
    assert int(solver.opts.rti) <= 0, "chunked driver is for until-convergence mode"
    eps = solver.opts.epsilon_convergence
    max_scp = int(solver.opts.max_iter_scp)
    kpd = max(1, int(scp_per_dispatch))
    E = jnp.asarray(m.E, solver.dtype)
    fopts = solver._fast_sls_opts()
    store_phi = not fopts.streaming_response

    def init_lane(x0):
        x0 = jnp.asarray(x0, solver.dtype)
        nominal = sqp_solve(
            m, N, solver.Q, solver.R, solver.Qf, x0, opts=solver.opts.sqp
        )
        persist0 = FastSLSPersist.init(
            N, m.nx, m.nu, m.ni, m.ni_f, m.nw, solver.dtype,
            store_phi=store_phi,
        )
        return nominal.X, nominal.U, persist0, x0, nominal.success

    def _apply_soft_fallback(x0s, Xs, Us, hard_ok, sh=None):
        """Host-chunked soft-slack cold-start fallback (bench.py semantics).

        This driver is already a host loop, so the fallback runs OUTSIDE the
        main vmap in bounded-lane chunks — the vmapped soft solve
        kernel-faults on this TPU backend above a lanes x horizon envelope
        (measured: ~512 lanes at N=15, 34 lanes at N=60; bench.py:196-215),
        which is why the in-vmap variant (build_batched_closed_loop) is
        capped by its callers instead. Converged-mode measurement: the
        128x10 converged MC has 15 lanes whose t=0 SCP fails from a
        wrong-basin hard-SQP nominal (converged_probe: first delta 10-25,
        then permanent inner failure); the fallback re-seeds exactly those.

        Only the ~hard_ok lanes are solved (gathered on the host — typically
        a handful out of hundreds), scattered back with .at[idx].set; on a
        multi-device mesh the result is device_put back to the scenario
        sharding `sh` so the main-loop dispatches stay sharded (ADVICE r4).
        """
        from robust_nonlinear_mpc_tpu.solvers.soft_nlp import (
            soft_fallback_chunk,
            soft_nlp_solve,
        )

        idx = np.flatnonzero(~np.asarray(hard_ok))
        if idx.size == 0:
            return Xs, Us
        soft_j = jax.jit(jax.vmap(
            lambda x: soft_nlp_solve(
                m, N, solver.Q, solver.R, solver.Qf, x,
                rho_soft=1e6, rho_soft_l1=1e6,
            )
        ))
        hard_j = jax.jit(jax.vmap(
            lambda x, Xi, Ui: sqp_solve(
                m, N, solver.Q, solver.R, solver.Qf, x,
                X_init=Xi, U_init=Ui, opts=solver.opts.sqp,
            )
        ))
        fb_chunk = soft_fallback_chunk(N)
        x0_h = np.asarray(x0s)
        # np.array (copy): np.asarray on a jax array yields a READ-ONLY view
        X_h, U_h = np.array(Xs), np.array(Us)
        for c0 in range(0, idx.size, fb_chunk):
            ii = idx[c0 : c0 + fb_chunk]
            # pad the gather to the FIXED chunk size (repeat the last lane)
            # so the solvers always see one (fb_chunk, ...) shape — a
            # variable-size gather recompiles per distinct failed-lane
            # count (and each remote compile is minutes on this backend)
            n_real = ii.size
            ii_p = (np.concatenate([ii, np.full(fb_chunk - n_real, ii[-1])])
                    if n_real < fb_chunk else ii)
            soft_b = soft_j(jnp.asarray(x0_h[ii_p], solver.dtype))
            hard_b = hard_j(jnp.asarray(x0_h[ii_p], solver.dtype),
                            soft_b.X, soft_b.U)
            fb_X = jnp.where(hard_b.success[:, None, None], hard_b.X, soft_b.X)
            fb_U = jnp.where(hard_b.success[:, None, None], hard_b.U, soft_b.U)
            use = np.asarray(soft_b.success)[:n_real, None, None]
            ii = ii_p[:n_real]
            X_h[ii] = np.where(use, np.asarray(fb_X)[:n_real], X_h[ii])
            U_h[ii] = np.where(use, np.asarray(fb_U)[:n_real], U_h[ii])
        Xs = jnp.asarray(X_h, solver.dtype)
        Us = jnp.asarray(U_h, solver.dtype)
        if sh is not None:
            Xs = jax.device_put(Xs, sh)
            Us = jax.device_put(Us, sh)
        return Xs, Us

    def scp_chunk(X, U, persist, x, bx, bu, qpi, it, done, failed):
        """Advance one lane's step-t SCP state by <= kpd iterations.

        Body/acceptance/convergence logic mirrors make_mpc_step's
        until-convergence branch exactly (keep in sync)."""
        restore = bool(getattr(solver.opts, "feasibility_restoration", False))
        damp = float(getattr(solver.opts, "scp_stall_damping", 0.0))
        damp_after = int(getattr(solver.opts, "stall_damping_after", 15))

        def body(st):
            X, U, persist, bx, bu, qpi, it, local, done, failed = st
            res = solver._iteration(X, U, x, persist)
            X, U, ok, fail_now = _accept_until_conv(
                X, U, res, it, restore, damp, damp_after
            )
            persist = jax.tree_util.tree_map(
                lambda new, old: jnp.where(ok, new, old), res.persist, persist
            )
            bx = jnp.where(ok, res.sls.backoff_x, bx)
            bu = jnp.where(ok, res.sls.backoff_u, bu)
            delta = jnp.max(jnp.abs(res.delta_vec))
            return (X, U, persist, bx, bu, qpi + res.sls.qp_iters,
                    it + 1, local + 1, ok & (delta < eps), fail_now)

        def cond(st):
            it, local, done, failed = st[6], st[7], st[8], st[9]
            return (~done) & (~failed) & (it < max_scp) & (local < kpd)

        st0 = (X, U, persist, bx, bu, qpi, it,
               jnp.zeros((), jnp.int32), done, failed)
        st = jax.lax.while_loop(cond, body, st0)
        (X, U, persist, bx, bu, qpi, it, _, done, failed) = st
        return X, U, persist, bx, bu, qpi, it, done, failed

    def advance(X, U, persist, x, w_t):
        """Apply u0, propagate the plant, warm-shift (make_mpc_step tail)."""
        u0 = U[0]
        x_next = m.ddyn(x, u0) + mv(E, w_t)
        Xs, Us = solver._warm_shift(X, U)
        persist_next = FastSLSPersist.init(
            N, m.nx, m.nu, m.ni, m.ni_f, m.nw, solver.dtype,
            keep_prev=persist.prev_primal,
            store_phi=store_phi,
        )._replace(have_prev=persist.have_prev)
        if fopts.recycle_eta:
            shifted = warm_shift_persist(persist)
            persist_next = persist_next._replace(
                eta=shifted.eta, eta_f=shifted.eta_f
            )
            if fopts.recycle_warm_qp:
                persist_next = persist_next._replace(qp_warm=shifted.qp_warm)
        return Xs, Us, persist_next, x_next

    init_j = jax.jit(jax.vmap(init_lane))
    chunk_j = jax.jit(jax.vmap(scp_chunk, in_axes=(0,) * 3 + (0,) * 7))
    adv_j = jax.jit(jax.vmap(advance))

    def run(x0s, Ws):
        import numpy as _np

        B = x0s.shape[0]
        sh = None
        if mesh is not None and mesh.devices.size > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from robust_nonlinear_mpc_tpu.parallel.mesh import SCENARIO_AXIS

            sh = NamedSharding(mesh, P(SCENARIO_AXIS))
        x0s = jnp.asarray(x0s, solver.dtype)
        Ws = jnp.asarray(Ws, solver.dtype)
        if sh is not None:
            x0s = jax.device_put(x0s, sh)
            Ws = jax.device_put(Ws, sh)

        X, U, persist, x, init_ok = init_j(x0s)
        if getattr(solver.opts, "nominal_soft_fallback", False):
            X, U = _apply_soft_fallback(x0s, X, U, init_ok, sh=sh)
        logs = {k: [] for k in
                ("x", "u0", "X", "U", "bx", "bu", "success", "qp_iters",
                 "scp_iters", "scp_failed")}
        nan_bx = jnp.full((B, N + 1, m.nx), jnp.nan, solver.dtype)
        nan_bu = jnp.full((B, N, m.nu), jnp.nan, solver.dtype)
        max_dispatches = -(-max_scp // kpd)
        for t in range(sim_steps):
            bx, bu = nan_bx, nan_bu
            qpi = jnp.zeros((B,), jnp.int32)
            it = jnp.zeros((B,), jnp.int32)
            done = jnp.zeros((B,), bool)
            failed = jnp.zeros((B,), bool)
            for _ in range(max_dispatches):
                X, U, persist, bx, bu, qpi, it, done, failed = chunk_j(
                    X, U, persist, x, bx, bu, qpi, it, done, failed
                )
                decided = _np.asarray(done | failed | (it >= max_scp))
                if decided.all():
                    break
            logs["x"].append(x)
            logs["u0"].append(U[:, 0])
            logs["X"].append(X)
            logs["U"].append(U)
            logs["bx"].append(bx)
            logs["bu"].append(bu)
            logs["success"].append(done)
            logs["qp_iters"].append(qpi)
            logs["scp_iters"].append(it)
            logs["scp_failed"].append(failed)
            X, U, persist, x = adv_j(X, U, persist, x, Ws[:, t])

        stk = {k: jnp.stack(v, axis=1) for k, v in logs.items()}
        return ClosedLoopLog(
            state_trajectory=stk["x"],
            input_trajectory=stk["u0"][:, : sim_steps - 1],
            nominal_x=stk["X"],
            nominal_u=stk["U"],
            backoff_x=stk["bx"],
            backoff_u=stk["bu"],
            success=stk["success"],
            qp_iters=stk["qp_iters"],
            scp_iters=stk["scp_iters"],
            scp_failed=stk["scp_failed"],
        )

    return run


def build_batched_closed_loop(solver: SCPSLSSolver, sim_steps: int, noise_scale=None):
    """Build a pure function: (x0, W) -> ClosedLoopLog for one scenario.

    x0: (nx,) initial state; W: (sim_steps, nw) disturbance samples in
    [-1, 1] (scaled by E inside; pass zeros for noise-free parity sims).
    vmap it for scenario batches; jit once.
    """
    m = solver.m
    N = solver.N
    mpc_step = make_mpc_step(solver)

    def rollout(x0, W):
        x0 = jnp.asarray(x0, solver.dtype)
        nominal = sqp_solve(
            m, N, solver.Q, solver.R, solver.Qf, x0, opts=solver.opts.sqp
        )
        if getattr(solver.opts, "nominal_soft_fallback", False):
            # host-driver parity (SCPSLSSolver.solve_nominal_trajectory): a
            # cold hard-SQP can fail or converge to a wrong basin on
            # aggressive x0 (measured N=30: one lane's "nominal" ignored its
            # own initial state and the closed loop diverged); fall back to
            # the always-feasible soft-slack SQP + hard polish. Under vmap
            # both branches are computed for every lane — cold-start-only
            # cost, so off by default and enabled by the MC/bench configs.
            from robust_nonlinear_mpc_tpu.solvers.soft_nlp import soft_nlp_solve

            soft = soft_nlp_solve(
                m, N, solver.Q, solver.R, solver.Qf, x0,
                rho_soft=1e6, rho_soft_l1=1e6,
            )
            hard = sqp_solve(
                m, N, solver.Q, solver.R, solver.Qf, x0,
                X_init=soft.X, U_init=soft.U, opts=solver.opts.sqp,
            )
            Xfb = jnp.where(hard.success, hard.X, soft.X)
            Ufb = jnp.where(hard.success, hard.U, soft.U)
            use_fb = (~nominal.success) & soft.success
            nominal = nominal._replace(
                X=jnp.where(use_fb, Xfb, nominal.X),
                U=jnp.where(use_fb, Ufb, nominal.U),
            )
        persist0 = FastSLSPersist.init(
            N, m.nx, m.nu, m.ni, m.ni_f, m.nw, solver.dtype,
            # streaming mode never fills Phi — drop the buffers entirely
            store_phi=not solver._fast_sls_opts().streaming_response,
        )
        carry0 = (nominal.X, nominal.U, persist0, x0)
        _, outs = jax.lax.scan(mpc_step, carry0, W[:sim_steps])
        (xs, u0s, Xs, Us, bx, bu, succ, qpi, scpi, scpf) = outs
        return ClosedLoopLog(
            state_trajectory=xs,
            input_trajectory=u0s[: sim_steps - 1],
            nominal_x=Xs,
            nominal_u=Us,
            backoff_x=bx,
            backoff_u=bu,
            success=succ,
            qp_iters=qpi,
            scp_iters=scpi,
            scp_failed=scpf,
        )

    return rollout
