"""fast-SLS: disturbance-feedback tube synthesis via alternating QP forward
solves and column-wise Riccati backward solves.

Functional re-design of the reference `solver/fast_SLS_jit.py:195-646`
(class fast_SLS): all mutable `current_iteration` dict state becomes an
explicit fixed-shape pytree so the whole loop jits (and vmaps over problem
batches). Semantics replicated exactly, including the reference's quirks
(SURVEY.md §2.2):

  * the convergence criterion is primal-only with tolerance 1e-3; the dual
    criterion is computed but unused (fast_SLS_jit.py:594-600),
  * the first convergence check of a fresh solver only stores the primal and
    reports not-converged (fast_SLS_jit.py:588-591),
  * the previous-primal memory persists across solve() calls (it lives on the
    solver object in the reference and is never cleared by
    reset_solver_to_zeros) — here it is threaded through explicitly,
  * beta is (re)initialized to epsilon_backoff at the start of every solve,
    which makes the first eta = mu / (2 sqrt(eps)) large
    (fast_SLS_jit.py:299,444-452),
  * the first forward QP of a solve uses *untightened* bounds (the SCP's
    update_jacobian resets ubg to the raw residuals, qp_jit.py:269-273),
  * RTI mode runs exactly `rti_steps` iterations; a converged check mid-loop
    skips only the backward/tightening for that iteration, and the solve
    always finishes on a forward QP with the latest tightened bounds
    (fast_SLS_jit.py:280-296).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from robust_nonlinear_mpc_tpu.ops.packing import pack_primal
from robust_nonlinear_mpc_tpu.ops.qp_ipm import (
    IPMOptions,
    QPData,
    QPSolution,
    QPStatics,
    condense,
    solve_qp,
)
from robust_nonlinear_mpc_tpu.ops.sls_kernels import (
    SLSRegs,
    backoff_from_phi,
    evaluate_dual_eta,
    propagate,
    tube_cost,
)
# Kernel selection. Default: the GEMM-folded kernels (column axis folded into
# the GEMM dimensions; 28%/24% faster than vmap-over-columns on v5e).
# RNM_SLS_BLOCK=<b> opts into the triangular column-blocked variants, which
# additionally skip not-yet-active (exact-zero) column blocks by splitting the
# stage scan into segments of b stages — ~30-40% less GEMM volume, measured
# 11.4 -> 6.8 ms (backward) / 6.2 -> 3.7 ms (response) STANDALONE at the
# rocket bench shapes (tools/kernel_bench.py, block=2, v5e f32).  They are
# opt-in rather than default because the multi-segment scan structure, nested
# inside the solver's SQP/SCP while_loops, blows up XLA:CPU compilation
# (minutes-long compiles at block=2; an XLA:CPU segfault at block=8 on this
# jaxlib) — standalone or shallowly-jitted use is fine on both backends.
import functools
import os

from robust_nonlinear_mpc_tpu.ops.sls_kernels import (
    backward_solve_blocked,
    backward_solve_folded,
    response_streaming_blocked,
    response_streaming_folded,
)

_SLS_BLOCK = int(os.environ.get("RNM_SLS_BLOCK", "0"))  # 0 = folded kernels


def select_sls_kernels(block: int):
    """(backward_solve, response_streaming) for a column-block size.

    block = 0: the GEMM-folded kernels (the safe default on every backend).
    block > 0: the triangular column-blocked variants with stage segments of
    `block` — see the caveat above before using them anywhere XLA:CPU
    compiles deeply nested programs.
    block = -1: lane-packed backward (ops/sls_packed.py — block-diagonal
    GEMM packing of 7 instances per MXU pass; needs a BATCHED solve, falls
    back to folded unbatched) with the column-blocked streaming response.
    """
    if block == -1:
        from robust_nonlinear_mpc_tpu.ops.sls_packed import backward_K_packed

        def bwd_packed(A, B, Gmat, Gf, eta, eta_f, regs):
            # K-only (None stands in for the unused S output; the solver
            # consumes `bwd_solve(...)[1]` only)
            return None, backward_K_packed(
                A, B, Gmat, Gf, eta, eta_f,
                regs.Q_reg, regs.R_reg, regs.Q_reg_f,
            )

        return (
            bwd_packed,
            functools.partial(response_streaming_blocked, block=2),
        )
    if block > 0:
        return (
            functools.partial(backward_solve_blocked, block=block),
            functools.partial(response_streaming_blocked, block=block),
        )
    return backward_solve_folded, response_streaming_folded


# module-level bindings (env default) for tools/tests that time "what the
# solver runs by default"; the solver itself selects per FastSLSOptions
backward_solve, response_streaming = select_sls_kernels(_SLS_BLOCK)


class SLSProblem(NamedTuple):
    """Static problem geometry shared by every fast-SLS solve."""

    stat: QPStatics   # Hx = 2Q, Hu = 2R, HxN = 2Qf, Gx, Gu, Gf
    regs: SLSRegs     # Q_reg, R_reg, Q_reg_f
    E: jax.Array      # (N+1, nx, nw) disturbance input maps


class FastSLSOptions(NamedTuple):
    rti_steps: int = 0          # >0: run exactly this many iterations (RTI)
    # per-iteration table via jax.debug.print (reference fast_SLS PrettyTable,
    # fast_SLS_jit.py:346-403). Static flag: zero cost when off. Meant for
    # single-instance debugging; under vmap every lane prints.
    verbose: bool = False
    verbose_tab: str = "\t"     # indent prefix (fast_SLS_jit.py:210-211)
    max_iter: int = 30          # safety cap in until-convergence mode
    conv_tol: float = 1e-3      # primal-only criterion (fast_SLS_jit.py:594)
    epsilon_backoff: float = 1e-10
    # warm-start the tightened QP re-solves from the previous solution.
    # Off by default: measured on TPU f32, Mehrotra recovers poorly from the
    # near-boundary warm point (success 73% vs 100%, no speedup).
    warm_start_qp: bool = False
    # use the Pallas fused response kernel (propagate + backoffs + tube cost
    # in one VMEM-resident pass; ~1.7x the XLA path on v5e). f32-only and
    # reduced-precision dots — throughput path only, off for f64 parity.
    use_pallas_response: bool = False
    # pure-XLA fused response: compute backoffs + tube cost inside the
    # propagation scan without materializing Phi_x/Phi_u (ops/sls_kernels.
    # response_streaming). Peak memory O(N nx nw) per instance instead of
    # O(N^2 nx nw) — required for very large MC batches. The solution's Phi
    # fields are zeros in this mode (pair with FastSLSPersist.init(...,
    # store_phi=False) to drop the buffers entirely). Ignored when
    # use_pallas_response is set.
    streaming_response: bool = False
    # dual-recycling RTI (TPU throughput redesign, no reference analogue):
    # one QP per solve instead of two. The backward Riccati uses the eta
    # weights persisted from the PREVIOUS solve's final QP duals (zeros on
    # the first solve -> regularizer-only tube gains); backoffs are still
    # computed from the CURRENT linearization and gains, so robust
    # constraint tightening remains exact every step — only the K
    # optimization lags one step, in RTI spirit. Requires threading
    # `persist` across solves WITHOUT re-initialization (the bench/MC path
    # does; the reference-faithful closed-loop driver re-zeros persist at
    # warm shift and degenerates this mode to reg-only tube gains).
    recycle_eta: bool = False
    # warm-start the recycle-mode QP from the PREVIOUS solve's QP solution
    # (primal + inequality/equality duals persisted in FastSLSPersist.qp_warm;
    # slacks are re-centered to the new tightened bounds inside solve_qp).
    # Distinct from warm_start_qp (intra-solve, untightened -> tightened,
    # measured-and-rejected): across MPC steps the warm-shifted problem is a
    # small perturbation with a near-identical active set, which is where a
    # Mehrotra IPM warm start actually pays.
    recycle_warm_qp: bool = False
    ipm: IPMOptions = IPMOptions()
    # optional looser IPM for the *untightened* first solve of an RTI
    # iteration: its primal is discarded (the final tightened solve decides
    # the control); only its duals feed eta -> backoffs, which tolerate
    # reduced accuracy. None = use `ipm` for both (the parity default).
    ipm_first: IPMOptions | None = None
    # SLS kernel column-block size (see select_sls_kernels): 0 = GEMM-folded
    # kernels; >0 = triangular column-blocked variants (+20% end-to-end on
    # v5e at block=2, but they blow up XLA:CPU compilation in deeply nested
    # programs — TPU throughput paths only). Default honors RNM_SLS_BLOCK.
    sls_block: int = _SLS_BLOCK
    # steady-state-aware IPM budget (steady_cap, cold_cap) or None: each
    # lane runs its tightened QPs at cold_cap until a solve SUCCEEDS in
    # fewer than steady_cap iterations, then drops to steady_cap; a solve
    # that exhausts the steady budget flips the lane back to cold_cap on
    # the next step. Makes the bench's throughput cap (6) safe during cold
    # starts/maneuvers without recompiling (the cap is a traced value) —
    # replaces the unsafe-if-cold global cap (VERDICT r1 item 10).
    adaptive_ipm_budget: tuple | None = None
    # LARGE-HORIZON mode: a jax.sharding.Mesh over the SLS column axis
    # (parallel/columns.py — the reference's prange-over-columns axis,
    # fast_SLS_jit.py:66,113, taken across devices). When set, the backward
    # Riccati and the streaming response run column-sharded under shard_map;
    # only the (N, ni)+(ni_f,)+scalar backoff/cost psums cross devices, the
    # O(N^2 nx nw) response work never moves. Implies streaming_response
    # (Phi is never materialized across devices).
    column_mesh: object = None


class QPWarm(NamedTuple):
    """Previous QP solution persisted across solves (consumed by
    FastSLSOptions.recycle_warm_qp to warm-start the next solve's IPM)."""

    X: jax.Array        # (N+1, nx)
    U: jax.Array        # (N, nu)
    lam: jax.Array      # (N, ni)
    lam_f: jax.Array    # (ni_f,)
    nu_dyn: jax.Array   # (N, nx)
    valid: jax.Array    # bool: fields hold a successful previous solution

    @staticmethod
    def init(N, nx, nu, ni, ni_f, dtype):
        return QPWarm(
            X=jnp.zeros((N + 1, nx), dtype),
            U=jnp.zeros((N, nu), dtype),
            lam=jnp.ones((N, ni), dtype),
            lam_f=jnp.ones((ni_f,), dtype),
            nu_dyn=jnp.zeros((N, nx), dtype),
            valid=jnp.array(False),
        )


class FastSLSPersist(NamedTuple):
    """State that survives across fast-SLS solves within one MPC step.

    In the reference these live in the fast_SLS object's `current_iteration`
    dict, which is only wiped by reset_solver_to_zeros -> initialize_solver
    (i.e. at warm-start time), while beta/backoff are re-initialized at every
    solve() entry. The convergence memory `_prev_primal_vec` is an instance
    attribute that is NEVER cleared (fast_SLS_jit.py:583-599) and therefore
    persists even across MPC steps.
    """

    prev_primal: jax.Array   # packed primal from the last convergence check
    have_prev: jax.Array     # bool: prev_primal is valid
    eta: jax.Array           # (N, N, ni)
    eta_f: jax.Array         # (N+1, ni_f)
    K: jax.Array             # (N, N+1, nu, nx)
    Phi_x: jax.Array         # (N+1, N+1, nx, nw)
    Phi_u: jax.Array         # (N, N+1, nu, nw)
    cost_tube: jax.Array     # scalar
    qp_warm: QPWarm          # previous QP solution (recycle_warm_qp)
    qp_steady: jax.Array     # bool: lane converged inside the steady budget

    @staticmethod
    def init(N, nx, nu, ni, ni_f, nw, dtype, keep_prev=None, store_phi=True):
        """store_phi=False allocates zero-size Phi buffers — pair with
        FastSLSOptions(streaming_response=True), which never fills them;
        all downstream selects/copies on the Phi fields become free."""
        prev = (
            keep_prev
            if keep_prev is not None
            else jnp.zeros((nx + nu) * N + nx, dtype)
        )
        n_phi = (N + 1) if store_phi else 0
        return FastSLSPersist(
            prev_primal=prev,
            have_prev=jnp.array(False) if keep_prev is None else jnp.array(True),
            eta=jnp.zeros((N, N, ni), dtype),
            eta_f=jnp.zeros((N + 1, ni_f), dtype),
            K=jnp.zeros((N, N + 1, nu, nx), dtype),
            Phi_x=jnp.zeros((N + 1, n_phi, nx, nw), dtype),
            Phi_u=jnp.zeros((N, n_phi, nu, nw), dtype),
            cost_tube=jnp.asarray(jnp.nan, dtype),
            qp_warm=QPWarm.init(N, nx, nu, ni, ni_f, dtype),
            qp_steady=jnp.array(False),
        )


def _shift_repeat(a, axis):
    """out[k] = a[k+1] along `axis`, with the last entry repeated."""
    n = a.shape[axis]
    src = jnp.minimum(jnp.arange(n) + 1, n - 1)
    return jnp.take(a, src, axis=axis)


def warm_shift_persist(persist: "FastSLSPersist") -> "FastSLSPersist":
    """Stage-shift the recycled cross-step state at an MPC warm shift.

    The MPC warm shift advances the horizon one stage (reference
    reset_warm_start, SCP_SLS_jit.py:512-518): stage k of the new problem is
    stage k+1 of the old one, and SLS column j (disturbance entering at step
    j) becomes old column j+1. The recycled quantities must shift the same
    way or they are misaligned by one stage:

      * eta (N, N, ni): shift both the stage axis and the column axis,
        repeating the last entry (the same boundary heuristic as the
        reference's primal shift, which keeps U[:, N-1]);
      * eta_f (N+1, ni_f): shift the column axis.

    qp_warm is deliberately NOT shifted: measured on the rocket closed loop
    (CPU f32 8-lane probe), stage-shifting the warm QP primal/duals makes
    lanes that fail a step unrecoverable (steady success 0.62 vs 1.0) — the
    warm deviation-QP iterate is a point near the NEW problem's central
    path, not a stage-indexed trajectory, so shifting it moves it off-path.
    Carrying it verbatim is both safe and what delivers the warm-start win
    (steady-state ~3.5 IPM iters vs ~8.6 without carrying it).

    K / Phi / cost_tube are not shifted — every consumer recomputes them from
    eta before use. Callers combine this with a fresh FastSLSPersist.init for
    the non-recycled fields (see SCPSLSSolver.reset_warm_start and
    sim.closed_loop.make_mpc_step).
    """
    eta = _shift_repeat(_shift_repeat(persist.eta, 0), 1)
    eta_f = _shift_repeat(persist.eta_f, 0)
    return persist._replace(eta=eta, eta_f=eta_f)


class FastSLSSolution(NamedTuple):
    X: jax.Array           # (N+1, nx) deviation states
    U: jax.Array           # (N, nu)  deviation inputs
    y: jax.Array           # packed stage-wise primal
    lam: jax.Array         # (N, ni)  stage ineq duals (dual_mu)
    lam_f: jax.Array       # (ni_f,)
    eta: jax.Array         # (N, N, ni)
    eta_f: jax.Array       # (N+1, ni_f)
    K: jax.Array           # (N, N+1, nu, nx)
    Phi_x: jax.Array       # (N+1, N+1, nx, nw)
    Phi_u: jax.Array       # (N, N+1, nu, nw)
    beta: jax.Array        # (N, N, ni)
    beta_f: jax.Array      # (N+1, ni_f)
    backoff: jax.Array     # (N, ni)
    backoff_f: jax.Array   # (ni_f,)
    backoff_x: jax.Array   # (N+1, nx)
    backoff_u: jax.Array   # (N, nu)
    cost_nominal: jax.Array
    cost_tube: jax.Array
    iteration_number: jax.Array
    success: jax.Array
    persist: FastSLSPersist  # thread back into the next solve
    qp_iters: jax.Array     # total IPM iterations across forward solves
    qp_kkt: jax.Array       # worst-case QP KKT residual seen


def _init_tube(N, ni, ni_f, nx, nu, eps, dtype):
    """Tube state at solve entry (reference initialize_backoff:444-454).

    Note the init backoff sums sqrt(eps) over *all* N columns (the computed
    backoff later sums only j <= k) — reference parity.
    """
    beta = jnp.full((N, N, ni), eps, dtype=dtype)
    beta_f = jnp.full((N + 1, ni_f), eps, dtype=dtype)
    backoff = jnp.sqrt(beta).sum(axis=1)
    backoff_f = jnp.sqrt(beta_f).sum(axis=0)
    return beta, beta_f, backoff, backoff_f


def fast_sls_solve(
    prob: SLSProblem,
    A: jax.Array,          # (N, nx, nx)
    B: jax.Array,          # (N, nx, nu)
    c: jax.Array,          # (N, nx) dynamics affine term
    qx: jax.Array,         # (N+1, nx) linear cost
    qu: jax.Array,         # (N, nu)
    g_res: jax.Array,      # (N, ni) untightened stage ineq rhs
    gf_res: jax.Array,     # (ni_f,)
    xinit_dev: jax.Array,  # (nx,) pinned deviation initial state
    persist: FastSLSPersist,
    opts: FastSLSOptions,
) -> FastSLSSolution:
    """One fast-SLS solve. Pure function; jit/vmap over a leading batch axis.

    `xinit_dev` follows the reference convention: the QP pins
    x(0) = -x0_arg where x0_arg = x_nom0 - x0 (qp_jit.py:161-169,376-379),
    i.e. pass xinit_dev = x0 - x_nom0 directly.
    """
    N, nx = c.shape
    nu = B.shape[2]
    ni = prob.stat.Gx.shape[0]
    ni_f = prob.stat.Gf.shape[0]
    dtype = A.dtype
    eps = opts.epsilon_backoff

    Gmat = jnp.concatenate([prob.stat.Gx, prob.stat.Gu], axis=1)
    bwd_solve, resp_streaming = select_sls_kernels(opts.sls_block)
    if opts.column_mesh is not None:
        # large-horizon column sharding (parallel/columns.py): same kernel
        # contracts, column axis distributed over the mesh
        from robust_nonlinear_mpc_tpu.parallel.columns import (
            column_sharded_backward_solve,
            column_sharded_response,
        )

        _mesh = opts.column_mesh
        bwd_solve = functools.partial(column_sharded_backward_solve, _mesh)
        resp_streaming = functools.partial(column_sharded_response, _mesh)

    beta, beta_f, backoff, backoff_f = _init_tube(N, ni, ni_f, nx, nu, eps, dtype)
    applied_backoff = jnp.zeros((N, ni), dtype=dtype)
    applied_backoff_f = jnp.zeros((ni_f,), dtype=dtype)

    # condensed-KKT precompute is W-independent and (A, B) are fixed across
    # every QP of this solve — build once, share across all forward solves
    use_cond = opts.ipm.kkt == "condensed" or (
        opts.ipm_first is not None and opts.ipm_first.kkt == "condensed"
    )
    pre = condense(prob.stat.per_stage(N), A, B) if use_cond else None

    if opts.adaptive_ipm_budget is not None:
        _steady_cap, _cold_cap = opts.adaptive_ipm_budget
        _budget = jnp.where(persist.qp_steady, _steady_cap, _cold_cap)
    else:
        _steady_cap, _budget = None, None

    def forward(applied, applied_f, init=None, first=False):
        data = QPData(
            A=A, B=B, c=c, qx=qx, qu=qu,
            h=g_res - applied, hf=gf_res - applied_f,
            xinit=xinit_dev,
        )
        use_first = first and opts.ipm_first is not None
        ipm = opts.ipm_first if use_first else opts.ipm
        return solve_qp(prob.stat, data, ipm, init=init, pre=pre,
                        max_iter_dyn=None if use_first else _budget)

    def compute_response(K, phi_like_x, phi_like_u):
        """propagate + backoffs + tube cost via the configured kernel.
        phi_like_*: arrays whose shapes define the (possibly zero-size)
        Phi output buffers for the non-materializing modes."""
        if opts.use_pallas_response:
            from robust_nonlinear_mpc_tpu.ops.pallas_response import fused_response

            Phi_x, Phi_u, nbeta, nbeta_f, nboff, nboff_f, ct = fused_response(
                A, B, prob.E, K,
                prob.stat.Gx, prob.stat.Gu, prob.stat.Gf,
                prob.regs.Q_reg, prob.regs.R_reg, prob.regs.Q_reg_f,
                eps=float(eps),
            )
            Phi_x = Phi_x.astype(dtype)
            Phi_u = Phi_u.astype(dtype)
            nbeta, nbeta_f = nbeta.astype(dtype), nbeta_f.astype(dtype)
            nboff, nboff_f = nboff.astype(dtype), nboff_f.astype(dtype)
            ct = ct.astype(dtype)
        elif opts.streaming_response or opts.column_mesh is not None:
            nbeta, nbeta_f, nboff, nboff_f, ct = resp_streaming(
                A, B, prob.E, K,
                prob.stat.Gx, prob.stat.Gu, prob.stat.Gf, prob.regs, eps,
            )
            Phi_x = jnp.zeros_like(phi_like_x)
            Phi_u = jnp.zeros_like(phi_like_u)
        else:
            Phi_x, Phi_u = propagate(A, B, prob.E, K)
            ct = tube_cost(Phi_x, Phi_u, prob.regs)
            nbeta, nbeta_f, nboff, nboff_f = backoff_from_phi(
                Phi_x, Phi_u, prob.stat.Gx, prob.stat.Gu, prob.stat.Gf, eps
            )
        return Phi_x, Phi_u, nbeta, nbeta_f, nboff, nboff_f, ct

    def _warm_init():
        """QP warm start from the previous solve's solution (recycle_warm_qp).
        Falls back to near-cold values on the first solve / after a failed
        QP (valid=False). Only X/U/lam/lam_f/nu_dyn are read by solve_qp's
        init path; slacks are re-centered there."""
        w = persist.qp_warm
        v = w.valid
        return QPSolution(
            X=jnp.where(v, w.X, 0.0),
            U=jnp.where(v, w.U, 0.0),
            lam=jnp.where(v, w.lam, 1.0),
            lam_f=jnp.where(v, w.lam_f, 1.0),
            nu_dyn=jnp.where(v, w.nu_dyn, 0.0),
            nu_init=jnp.zeros((nx,), dtype),
            s=jnp.zeros((N, ni), dtype),
            s_f=jnp.zeros((ni_f,), dtype),
            cost=jnp.zeros((), dtype),
            kkt_res=jnp.zeros((), dtype),
            iters=jnp.zeros((), jnp.int32),
            success=v,
        )

    def _update_warm(sol):
        """Refresh the persisted warm start from a successful QP; keep the
        previous (possibly stale) one when the QP failed — its duals are
        garbage, and a stale warm point still beats a cold one."""
        w = persist.qp_warm
        keep = sol.success
        pick = lambda new, old: jnp.where(keep, new, old)
        return QPWarm(
            X=pick(sol.X, w.X), U=pick(sol.U, w.U),
            lam=pick(sol.lam, w.lam), lam_f=pick(sol.lam_f, w.lam_f),
            nu_dyn=pick(sol.nu_dyn, w.nu_dyn),
            valid=keep | w.valid,
        )

    def _next_steady(sol):
        if _steady_cap is None:
            return persist.qp_steady
        return sol.success & (sol.iters < _steady_cap)

    if opts.recycle_eta:
        # --- dual-recycling RTI: K from persisted eta, one tightened QP ---
        K_r = bwd_solve(
            A, B, Gmat, prob.stat.Gf, persist.eta, persist.eta_f, prob.regs
        )[1]
        Phi_x, Phi_u, nbeta, nbeta_f, nboff, nboff_f, ct = compute_response(
            K_r, persist.Phi_x, persist.Phi_u
        )
        sol = forward(
            nboff, nboff_f, init=_warm_init() if opts.recycle_warm_qp else None
        )
        y = pack_primal(sol.X, sol.U)
        conv = persist.have_prev & (
            jnp.max(jnp.abs(y - persist.prev_primal)) <= opts.conv_tol
        )
        # refresh eta for the NEXT solve from this QP's duals and the
        # freshly computed beta (eta = mu / (2 sqrt(beta))) — but, mirroring
        # the standard path's `do_update = ~(conv | infeasible)`, keep the
        # previous eta when the QP failed (duals are garbage; recycling them
        # would poison the next step's gains) or when the primal has
        # converged (the tube is at its fixed point)
        eta_n, eta_f_n = evaluate_dual_eta(sol.lam, sol.lam_f, nbeta, nbeta_f, eps)
        refresh = sol.success & ~conv
        eta_n = jnp.where(refresh, eta_n, persist.eta)
        eta_f_n = jnp.where(refresh, eta_f_n, persist.eta_f)
        new_persist = FastSLSPersist(
            prev_primal=y, have_prev=jnp.array(True),
            eta=eta_n, eta_f=eta_f_n, K=K_r,
            Phi_x=Phi_x, Phi_u=Phi_u, cost_tube=ct,
            qp_warm=_update_warm(sol),
            qp_steady=_next_steady(sol),
        )
        return FastSLSSolution(
            X=sol.X, U=sol.U, y=y, lam=sol.lam, lam_f=sol.lam_f,
            eta=eta_n, eta_f=eta_f_n, K=K_r, Phi_x=Phi_x, Phi_u=Phi_u,
            beta=nbeta, beta_f=nbeta_f, backoff=nboff, backoff_f=nboff_f,
            backoff_x=jnp.concatenate(
                [nboff[:, :nx], nboff_f[None, :nx]], axis=0
            ),
            backoff_u=nboff[:, nx : nx + nu],
            cost_nominal=sol.cost, cost_tube=ct,
            # 0 when the primal already satisfied the convergence criterion
            # (the solve was a pure re-solve), 1 when a tube update ran
            iteration_number=jnp.where(conv, 0, 1).astype(jnp.int32),
            success=sol.success, persist=new_persist,
            qp_iters=sol.iters, qp_kkt=sol.kkt_res,
        )

    zero_sol = forward(applied_backoff, applied_backoff_f, first=True)
    # note: zero_sol is the first real forward solve (untightened bounds)

    class Carry(NamedTuple):
        sol: type(zero_sol)
        eta: jax.Array
        eta_f: jax.Array
        K: jax.Array
        Phi_x: jax.Array
        Phi_u: jax.Array
        beta: jax.Array
        beta_f: jax.Array
        backoff: jax.Array
        backoff_f: jax.Array
        backoff_x: jax.Array
        backoff_u: jax.Array
        applied: jax.Array
        applied_f: jax.Array
        cost_tube: jax.Array
        prev_primal: jax.Array
        have_prev: jax.Array
        converged: jax.Array
        infeasible: jax.Array
        iteration_number: jax.Array
        qp_iters: jax.Array
        qp_kkt: jax.Array

    def make_carry(sol):
        return Carry(
            sol=sol,
            eta=persist.eta,
            eta_f=persist.eta_f,
            K=persist.K,
            Phi_x=persist.Phi_x,
            Phi_u=persist.Phi_u,
            beta=beta, beta_f=beta_f,
            backoff=backoff, backoff_f=backoff_f,
            # reference initialize_backoff:453-454 resets these to zeros at
            # every solve entry; only update_tightening fills them
            backoff_x=jnp.zeros((N + 1, nx), dtype),
            backoff_u=jnp.zeros((N, nu), dtype),
            applied=applied_backoff, applied_f=applied_backoff_f,
            cost_tube=persist.cost_tube,
            prev_primal=persist.prev_primal, have_prev=persist.have_prev,
            converged=jnp.array(False),
            infeasible=~sol.success,
            iteration_number=jnp.array(0, jnp.int32),
            qp_iters=sol.iters,
            qp_kkt=sol.kkt_res,
        )

    def sls_update(carry: Carry):
        """eta -> backward Riccati -> propagate -> backoffs -> retighten."""
        sol = carry.sol
        eta, eta_f = evaluate_dual_eta(sol.lam, sol.lam_f, carry.beta, carry.beta_f, eps)
        _, K = bwd_solve(A, B, Gmat, prob.stat.Gf, eta, eta_f, prob.regs)
        Phi_x, Phi_u, nbeta, nbeta_f, nboff, nboff_f, ct = compute_response(
            K, carry.Phi_x, carry.Phi_u
        )
        backoff_x = jnp.concatenate([nboff[:, :nx], nboff_f[None, :nx]], axis=0)
        backoff_u = nboff[:, nx : nx + nu]
        return carry._replace(
            eta=eta, eta_f=eta_f, K=K, Phi_x=Phi_x, Phi_u=Phi_u,
            beta=nbeta, beta_f=nbeta_f, backoff=nboff, backoff_f=nboff_f,
            backoff_x=backoff_x, backoff_u=backoff_u,
            applied=nboff, applied_f=nboff_f, cost_tube=ct,
            iteration_number=carry.iteration_number + 1,
        )

    def step(carry: Carry, resolve_forward: bool):
        """One _step (fast_SLS_jit.py:314-327). If resolve_forward, start with
        a fresh QP on the current tightened bounds (used for iterations > 0;
        iteration 0 reuses the entry solve)."""
        if resolve_forward:
            init = carry.sol if opts.warm_start_qp else None
            sol = forward(carry.applied, carry.applied_f, init=init)
            carry = carry._replace(
                sol=sol,
                infeasible=carry.infeasible | ~sol.success,
                qp_iters=carry.qp_iters + sol.iters,
                qp_kkt=jnp.maximum(carry.qp_kkt, sol.kkt_res),
            )
        sol = carry.sol
        y = pack_primal(sol.X, sol.U)
        delta_primal = jnp.max(jnp.abs(y - carry.prev_primal))
        conv = carry.have_prev & (delta_primal <= opts.conv_tol)
        carry = carry._replace(prev_primal=y, have_prev=jnp.array(True))
        # converged or infeasible -> skip the backward/tighten update
        do_update = ~(conv | carry.infeasible)
        updated = sls_update(carry)
        carry = jax.tree_util.tree_map(
            lambda a, b: jnp.where(do_update, b, a), carry, updated
        )
        carry = carry._replace(converged=carry.converged | conv)
        if opts.verbose:
            # inner iteration table, mirroring the reference's fast-SLS
            # PrettyTable columns (fast_SLS_jit.py:346-403) with the same
            # `tab` indent (:210-211). jax.debug.print keeps this inside the
            # jitted loop; the static flag makes it free when off.
            lax.cond(
                carry.iteration_number <= 1,
                lambda: jax.debug.print(
                    opts.verbose_tab
                    + "{h0:>4} {h1:>10} {h2:>11} {h3:>11} {h4:>11} {h5:>6}",
                    h0="it", h1="Δ primal", h2="cost nom.", h3="cost tube",
                    h4="cost total", h5="qp it",
                ),
                lambda: None,
            )
            jax.debug.print(
                opts.verbose_tab
                + "{it:>4} {dp:>10.2e} {cn:>11.4e} {ct:>11.4e} {tot:>11.4e} {qi:>6}",
                it=carry.iteration_number, dp=delta_primal,
                cn=carry.sol.cost, ct=carry.cost_tube,
                tot=carry.sol.cost + carry.cost_tube, qi=carry.qp_iters,
            )
        return carry

    carry = make_carry(zero_sol)
    steps = max(int(opts.rti_steps), 1) if opts.rti_steps else None

    if steps is not None:
        # --- RTI mode: exactly `steps` iterations + final forward QP ---
        for i in range(steps):
            carry = step(carry, resolve_forward=(i > 0))
        final = forward(
            carry.applied, carry.applied_f,
            init=carry.sol if opts.warm_start_qp else None,
        )
        # keep the last feasible solution if the final solve failed mid-loop
        use_final = ~carry.infeasible
        sol = jax.tree_util.tree_map(
            lambda a, b: jnp.where(use_final, b, a), carry.sol, final
        )
        carry = carry._replace(
            sol=sol,
            infeasible=carry.infeasible | (use_final & ~final.success),
            qp_iters=carry.qp_iters + jnp.where(use_final, final.iters, 0),
            qp_kkt=jnp.maximum(carry.qp_kkt, jnp.where(use_final, final.kkt_res, 0.0)),
        )
        success = ~carry.infeasible
    else:
        # --- until convergence (safety cap max_iter), fast_SLS_jit.py:298-312 ---
        def cond(state):
            carry, it = state
            return (~carry.converged) & (~carry.infeasible) & (it < opts.max_iter)

        def body(state):
            carry, it = state
            return step(carry, resolve_forward=True), it + 1

        carry = step(carry, resolve_forward=False)
        carry, _ = lax.while_loop(cond, body, (carry, jnp.array(1, jnp.int32)))
        success = carry.converged & ~carry.infeasible

    sol = carry.sol
    backoff_x = carry.backoff_x
    backoff_u = carry.backoff_u

    new_persist = FastSLSPersist(
        prev_primal=carry.prev_primal,
        have_prev=carry.have_prev,
        eta=carry.eta,
        eta_f=carry.eta_f,
        K=carry.K,
        Phi_x=carry.Phi_x,
        Phi_u=carry.Phi_u,
        cost_tube=carry.cost_tube,
        qp_warm=_update_warm(carry.sol),
        qp_steady=_next_steady(carry.sol),
    )

    return FastSLSSolution(
        X=sol.X,
        U=sol.U,
        y=pack_primal(sol.X, sol.U),
        lam=sol.lam,
        lam_f=sol.lam_f,
        eta=carry.eta,
        eta_f=carry.eta_f,
        K=carry.K,
        Phi_x=carry.Phi_x,
        Phi_u=carry.Phi_u,
        beta=carry.beta,
        beta_f=carry.beta_f,
        backoff=carry.backoff,
        backoff_f=carry.backoff_f,
        backoff_x=backoff_x,
        backoff_u=backoff_u,
        cost_nominal=sol.cost,
        cost_tube=carry.cost_tube,
        iteration_number=carry.iteration_number,
        success=success,
        persist=new_persist,
        qp_iters=carry.qp_iters,
        qp_kkt=carry.qp_kkt,
    )
