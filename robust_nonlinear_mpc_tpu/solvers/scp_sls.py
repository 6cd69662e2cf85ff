"""SCP-SLS: sequential convex programming over System Level Synthesis.

TPU-native re-implementation of the reference `solver/SCP_SLS_jit.py:15-720`
(Algorithm 2 of arXiv:2005.13297): per SCP iteration, re-linearize the
dynamics along the nominal trajectory, form the deviation problem, and run
fast-SLS (tube-tightened QP + disturbance-feedback synthesis); in RTI mode a
fixed number of iterations runs per MPC step, with warm starting by shifting
the previous trajectory.

Design: the per-iteration math is a pure jitted function
(`SCPSLSSolver._iteration`) over an explicit state (X, U, prev_primal) —
replacing the reference's mutating solver-object dicts — so a full MPC step
is one XLA program and batches of independent MPC problems vmap.

Replicated reference semantics (SURVEY.md §2.2 quirks included):
  * warm-started solves skip the nominal (IPOPT->SQP) initialization
    (SCP_SLS_jit.py:74-77),
  * the prepared warm-start ubg shift is dead code in the reference
    (`shift_ubg = False`, SCP_SLS_jit.py:83-102) — not applied here either,
  * on convergence the reference solves an IPOPT refinement and *discards*
    it (SCP_SLS_jit.py:129-133) — optionally reproduced for logging only,
  * `primal_infeasibility` is the *signed* max dynamics defect
    (np.max without abs, SCP_SLS_jit.py:455),
  * the deviation QP initial condition is x_nom0 - x0 and the QP pins
    x(0) = -(x_nom0 - x0) (SCP_SLS_jit.py:408-410; qp_jit.py:163-169).
"""

from __future__ import annotations

import time
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from robust_nonlinear_mpc_tpu.ops.packing import pack_primal
from robust_nonlinear_mpc_tpu.ops.qp_ipm import IPMOptions, QPStatics
from robust_nonlinear_mpc_tpu.ops.sls_kernels import SLSRegs
from robust_nonlinear_mpc_tpu.solvers.fast_sls import (
    _SLS_BLOCK,
    FastSLSOptions,
    FastSLSPersist,
    SLSProblem,
    fast_sls_solve,
    warm_shift_persist,
)
from robust_nonlinear_mpc_tpu.solvers.sqp import SQPOptions, sqp_solve
from robust_nonlinear_mpc_tpu.utils.numerics import mm, mv


class SCPSLSOptions(NamedTuple):
    rti: int = -1                      # -1: until convergence; >0: exactly rti iters
    fast_sls_rti_steps: int = 0        # 0: inner loop until convergence
    epsilon_convergence: float = 1e-10  # SCP |delta|_inf criterion (SCP_SLS_jit.py:29)
    max_iter_scp: int = 100            # SCP_SLS_jit.py:50
    epsilon_backoff: float = 1e-10
    sls_conv_tol: float = 1e-3         # fast-SLS primal criterion
    sls_max_iter: int = 30
    ipm: IPMOptions = IPMOptions()
    # throughput modes (see FastSLSOptions for semantics/measurements):
    # streaming fused response (no Phi materialization) and dual-recycling
    # RTI (one QP per warm step, eta persisted across steps)
    streaming_response: bool = False
    recycle_eta: bool = False
    # warm-start the recycle-mode QP from the previous step's QP solution
    recycle_warm_qp: bool = False
    # looser IPM for the untightened first QP of each RTI iteration
    # (duals-only consumer); None = use `ipm` for both
    ipm_first: IPMOptions | None = None
    # SLS kernel column-block size (fast_sls.select_sls_kernels): 0 = folded
    # (safe everywhere); >0 = triangular column-blocked (TPU throughput
    # only). Default honors the RNM_SLS_BLOCK env knob, like FastSLSOptions.
    sls_block: int = _SLS_BLOCK
    # large-horizon column sharding: a jax.sharding.Mesh over the SLS column
    # axis (FastSLSOptions.column_mesh; parallel/columns.py)
    column_mesh: object = None
    # steady-state-aware IPM budget (steady_cap, cold_cap) or None — see
    # FastSLSOptions.adaptive_ipm_budget
    adaptive_ipm_budget: tuple | None = None
    sqp: SQPOptions = SQPOptions()
    # batched-rollout cold start: fall back to the soft-slack SQP (+ hard
    # polish) when the hard SQP fails — host-driver parity
    # (solve_nominal_trajectory); under vmap all lanes pay the extra
    # cold-start compute, so opt-in (MC validation enables it)
    nominal_soft_fallback: bool = False
    # feasibility restoration (solvers/restoration.py): on an inner
    # infeasible-forward event — the reference's abort case,
    # fast_SLS_jit.py:302-312 — solve the tightened deviation QP with soft
    # slacks and continue SCP from the restored iterate instead of failing
    # the step. Never counts as success by itself (the SCP convergence
    # criterion is unchanged), so the converged-mode guarantee is untouched.
    # Opt-in: under jit/vmap every lane pays the extra slacked QP per SCP
    # iteration, so it is a converged/validation-mode capability.
    feasibility_restoration: bool = False
    restoration_rho: float = 1e5
    # converged-mode stall damping: after `stall_damping_after` SCP
    # iterations in one step, accept X <- X + alpha * step instead of the
    # full step (alpha = scp_stall_damping; 0 disables). Targets the
    # measured boundary-riding limit cycle (converged_probe: lanes
    # oscillating between near-degenerate active-set vertices at delta
    # 1-3.3e-3, just above eps 1e-3) — damping contracts a two-cycle toward
    # its center while leaving cleanly-converging lanes untouched (they
    # finish before the threshold). Unbiased at the fixpoint (step -> 0).
    scp_stall_damping: float = 0.0
    stall_damping_after: int = 15
    refine_on_convergence: bool = False
    verbose: bool = False
    # inner fast-SLS iteration table (the reference's post-construction
    # `solver.fast_SLS_solver.verbose = True` poke,
    # main_rocket_robust_closed_loop.py:86-93); jax.debug.print-based
    fast_sls_verbose: bool = False


class SCPIterResult(NamedTuple):
    X: jax.Array
    U: jax.Array
    delta_vec: jax.Array
    persist: FastSLSPersist
    primal_infeasibility: jax.Array
    cost: jax.Array
    cost_QP: jax.Array
    sls: object   # FastSLSSolution
    success: jax.Array
    # feasibility-restoration iterate (None unless
    # SCPSLSOptions.feasibility_restoration; see solvers/restoration.py)
    X_rest: jax.Array = None
    U_rest: jax.Array = None
    rest_ok: jax.Array = None


class SCPSLSSolver:
    """Stateful driver around the pure jitted SCP iteration.

    Mirrors the reference constructor signature
    `SCP_SLS(N, Q, R, m, Qf, Q_reg, R_reg, Q_reg_f, rti=..., fast_sls_rti_steps=...)`
    (SCP_SLS_jit.py:24) and the `.solve(x0)` / `.reset_warm_start()` /
    `.reset()` / `.generate_lqr_controller()` API.
    """

    def __init__(
        self,
        N,
        Q,
        R,
        m,
        Qf,
        Q_reg=None,
        R_reg=None,
        Q_reg_f=None,
        *,
        rti: int = -1,
        fast_sls_rti_steps: int | None = None,
        options: SCPSLSOptions | None = None,
        dtype=None,
        **kwargs,
    ):
        self.N = int(N)
        self.m = m
        self.dtype = dtype or jnp.zeros(0).dtype  # honors jax_enable_x64
        dt = self.dtype

        self.Q = np.asarray(Q, float)
        self.R = np.asarray(R, float)
        self.Qf = np.asarray(Qf, float)
        self.Q_reg = np.eye(m.nx) if Q_reg is None else np.asarray(Q_reg, float)
        self.R_reg = np.eye(m.nu) if R_reg is None else np.asarray(R_reg, float)
        self.Q_reg_f = np.eye(m.nx) if Q_reg_f is None else np.asarray(Q_reg_f, float)

        opts = options or SCPSLSOptions()
        opts = opts._replace(rti=int(rti))
        if fast_sls_rti_steps is not None:
            opts = opts._replace(fast_sls_rti_steps=int(fast_sls_rti_steps))
        if "verbose" in kwargs:
            opts = opts._replace(verbose=bool(kwargs["verbose"]))
        self.opts = opts

        # remaining reference ctor kwargs (SCP_SLS_jit.py:33-44)
        self.save_it_data = bool(kwargs.get("save_it_data", True))
        if kwargs.get("linearization_error", False):
            # the reference also raises on first use (SCP_SLS_jit.py:263-264)
            raise NotImplementedError(
                "linearization_error=True is not implemented (parity with the "
                "reference, which raises NotImplementedError in "
                "update_jacobian); E is taken from the model at every stage."
            )
        # accepted for signature parity; the reference's consuming branch is
        # hardcoded dead (shift_ubg = False, SCP_SLS_jit.py:83-102), so the
        # flag has no effect there either (SURVEY.md §2.2)
        self.warm_start_ubg_shift_enabled = bool(
            kwargs.get("warm_start_ubg_shift", True)
        )

        self._build_problem()
        self._iter_jit = jax.jit(self._iteration)
        self._shift_jit = jax.jit(self._warm_shift)

        # persistent (warm-start) state
        self._X = None
        self._U = None
        self._persist = FastSLSPersist.init(
            self.N, m.nx, m.nu, m.ni, m.ni_f, m.nw, dt
        )
        self.it_data = {}
        self.K = None

    # ------------------------------------------------------------------
    def _build_problem(self):
        m, N, dt = self.m, self.N, self.dtype
        G = jnp.asarray(m.G, dt)
        stat = QPStatics(
            Hx=jnp.asarray(2 * self.Q, dt),
            Hu=jnp.asarray(2 * self.R, dt),
            HxN=jnp.asarray(2 * self.Qf, dt),
            Gx=G[:, : m.nx],
            Gu=G[:, m.nx :],
            Gf=jnp.asarray(m.Gf, dt),
        )
        regs = SLSRegs(
            Q_reg=jnp.asarray(self.Q_reg, dt),
            R_reg=jnp.asarray(self.R_reg, dt),
            Q_reg_f=jnp.asarray(self.Q_reg_f, dt),
        )
        # E_traj: identical E at every stage incl. the initial one
        # (reference SCP_SLS_jit.py:230-238)
        E = jnp.broadcast_to(jnp.asarray(m.E, dt)[None], (N + 1, m.nx, m.nw))
        self.prob = SLSProblem(stat=stat, regs=regs, E=E)
        self._g = jnp.asarray(m.g, dt)
        self._gf = jnp.asarray(m.gf, dt)
        self._Qj = jnp.asarray(self.Q, dt)
        self._Rj = jnp.asarray(self.R, dt)
        self._Qfj = jnp.asarray(self.Qf, dt)

    def _fast_sls_opts(self) -> FastSLSOptions:
        return FastSLSOptions(
            rti_steps=self.opts.fast_sls_rti_steps,
            max_iter=self.opts.sls_max_iter,
            conv_tol=self.opts.sls_conv_tol,
            epsilon_backoff=self.opts.epsilon_backoff,
            streaming_response=self.opts.streaming_response,
            recycle_eta=self.opts.recycle_eta,
            recycle_warm_qp=self.opts.recycle_warm_qp,
            ipm=self.opts.ipm,
            ipm_first=self.opts.ipm_first,
            sls_block=self.opts.sls_block,
            column_mesh=self.opts.column_mesh,
            adaptive_ipm_budget=self.opts.adaptive_ipm_budget,
            verbose=self.opts.fast_sls_verbose,
        )

    # ------------------------------------------------------------------
    # Pure per-iteration math (jitted)
    # ------------------------------------------------------------------
    def assemble_deviation_problem(self, X, U, x0):
        """Jacobian sweep + constraint residuals + linear cost + deviation IC
        (reference update_jacobian:251-366, socp_step:408-410). Pure; shared
        by _iteration, solve_profiled, and tools/stage_profile so the
        profilers always measure exactly the program the solver runs."""
        m, N = self.m, self.N
        stat = self.prob.stat
        A, B, c = m.linearize_traj(X, U)
        g_res = self._g[None] - mm(X[:N], stat.Gx.T) - mm(U, stat.Gu.T)
        gf_res = self._gf - mv(stat.Gf, X[N])
        # linear cost q = 2 H y_nom (reference :362-366)
        qx = jnp.concatenate(
            [2 * mm(X[:N], self._Qj.T), (2 * mv(self._Qfj, X[N]))[None]], axis=0
        )
        qu = 2 * mm(U, self._Rj.T)
        return A, B, c, qx, qu, g_res, gf_res, x0 - X[0]

    def _iteration(self, X, U, x0, persist) -> SCPIterResult:
        m, N = self.m, self.N

        A, B, c, qx, qu, g_res, gf_res, xinit_dev = (
            self.assemble_deviation_problem(X, U, x0)
        )

        sls = fast_sls_solve(
            self.prob, A, B, c, qx, qu, g_res, gf_res, xinit_dev,
            persist, self._fast_sls_opts(),
        )

        X_new = X + sls.X
        U_new = U + sls.U

        # signed max defect of the *updated* iterate (SCP_SLS_jit.py:451-456)
        f_new = jax.vmap(m.ddyn)(X_new[:N], U_new)
        primal_infeas = jnp.max(f_new - X_new[1 : N + 1])

        cost_nlp = (
            jnp.sum(mm(X_new[:N], self._Qj.T) * X_new[:N])
            + jnp.sum(mm(U_new, self._Rj.T) * U_new)
            + jnp.sum(X_new[N] * mv(self._Qfj, X_new[N]))
        )

        X_rest = U_rest = rest_ok = None
        if self.opts.feasibility_restoration:
            # on the infeasible-forward event (sls.success False), a soft-
            # slacked solve of the SAME tightened deviation QP gives the
            # lane a usable direction instead of a frozen plan. Computed
            # unconditionally under jit (a cond would become a select under
            # vmap anyway); callers consume X_rest/U_rest only when
            # ~sls.success & rest_ok.
            from robust_nonlinear_mpc_tpu.solvers.restoration import (
                restoration_solve,
            )

            ripm = IPMOptions(
                max_iter=30,
                tol=3e-5 if self.dtype == jnp.float32 else 1e-8,
                kkt="riccati",
            )
            rsol = restoration_solve(
                self.prob.stat, A, B, c, qx, qu,
                g_res - sls.backoff, gf_res - sls.backoff_f,
                xinit_dev, rho=self.opts.restoration_rho, ipm=ripm,
            )
            X_rest = X + rsol.X
            U_rest = U + rsol.U
            rest_ok = (
                rsol.success
                & jnp.all(jnp.isfinite(X_rest))
                & jnp.all(jnp.isfinite(U_rest))
            )

        return SCPIterResult(
            X=X_new,
            U=U_new,
            delta_vec=sls.y,
            persist=sls.persist,
            primal_infeasibility=primal_infeas,
            cost=sls.cost_nominal + cost_nlp,
            cost_QP=sls.cost_nominal,
            sls=sls,
            success=sls.success,
            X_rest=X_rest,
            U_rest=U_rest,
            rest_ok=rest_ok,
        )

    def _warm_shift(self, X, U):
        """Shift trajectories one step (reference reset_warm_start:512-518)."""
        N = self.N
        X_new = jnp.concatenate(
            [X[1:], self.m.ddyn(X[N], U[N - 1])[None]], axis=0
        )
        U_new = jnp.concatenate([U[1:], U[N - 1 :]], axis=0)
        return X_new, U_new

    # ------------------------------------------------------------------
    # Public API (reference SCP_SLS methods)
    # ------------------------------------------------------------------
    def solve_nominal_trajectory(self, x0):
        """Nominal initialization via SQP (replaces IPOPT, SCP_SLS_jit.py:161).

        The hard-constrained SQP can hit an infeasible subproblem from a
        cold start on aggressive initial states (IPOPT survives these with
        its internal feasibility restoration); fall back to the always-
        feasible soft-slack SQP and accept its solution when the slacks
        vanish (then it IS the hard optimum).
        """
        x0 = jnp.asarray(x0, self.dtype)
        sol = sqp_solve(
            self.m, self.N, self.Q, self.R, self.Qf, x0, opts=self.opts.sqp,
        )
        if bool(sol.success):
            self._X, self._U = sol.X, sol.U
            if self.opts.verbose:
                print(f"SCP-SLS: nominal init converged, cost {float(sol.cost):.6e}")
            return True

        from robust_nonlinear_mpc_tpu.solvers.soft_nlp import soft_nlp_solve

        soft = soft_nlp_solve(
            self.m, self.N, self.Q, self.R, self.Qf, x0,
            rho_soft=1e6, rho_soft_l1=1e6,
        )
        max_slack = float(
            jnp.maximum(jnp.max(soft.gamma), jnp.max(soft.gamma_f))
        )
        if bool(soft.success):
            # polish: re-run the hard SQP from the (near-)feasible soft point
            hard = sqp_solve(
                self.m, self.N, self.Q, self.R, self.Qf, x0,
                X_init=soft.X, U_init=soft.U, opts=self.opts.sqp,
            )
            if bool(hard.success):
                self._X, self._U = hard.X, hard.U
                if self.opts.verbose:
                    print(
                        "SCP-SLS: nominal init via soft+polish, "
                        f"cost {float(hard.cost):.6e}"
                    )
                return True
            if max_slack < 1e-3:
                self._X, self._U = soft.X, soft.U
                if self.opts.verbose:
                    print(
                        "SCP-SLS: nominal init via soft fallback "
                        f"(residual slacks {max_slack:.2e}), "
                        f"cost {float(soft.cost_nominal):.6e}"
                    )
                return True
        if self.opts.verbose:
            print(
                "SCP-SLS: nominal trajectory initialization failed "
                f"(soft slacks {max_slack:.2e})"
            )
        return False

    def solve(self, x0):
        x0 = jnp.asarray(x0, self.dtype).reshape(-1)
        t_start = time.perf_counter()

        if self._X is None:
            if not self.solve_nominal_trajectory(x0):
                return {"success": False}

        rti = self.opts.rti
        run_until_converged = not (rti is not None and rti > 0)
        max_iters = self.opts.max_iter_scp if run_until_converged else int(rti)

        last_success = False
        iterations = 0
        res = None
        if self.opts.verbose:
            print(
                f"{'it (SCP)':>10} {'Δ primal':>10} {'cost nom.':>10} "
                f"{'p. infeas.':>10} {'SOCP it':>8}"
            )
        for ii in range(max_iters):
            iterations = ii
            res = self._iter_jit(self._X, self._U, x0, self._persist)
            last_success = bool(res.success)
            if not last_success:
                if (
                    self.opts.feasibility_restoration
                    and res.rest_ok is not None
                    and bool(res.rest_ok)
                ):
                    # feasibility restoration: continue SCP from the
                    # soft-slacked iterate instead of aborting (the
                    # capability the reference lacks at its own abort
                    # event, fast_SLS_jit.py:302-312). The restored step
                    # never satisfies the convergence branch by itself.
                    self._X, self._U = res.X_rest, res.U_rest
                    if self.opts.verbose:
                        print(f"{ii:>10} feasibility restoration step")
                    continue
                break
            damp = float(self.opts.scp_stall_damping)
            if damp > 0.0 and ii >= int(self.opts.stall_damping_after):
                # stall damping — keep in sync with the batched drivers
                # (sim/closed_loop.py until-convergence acceptance)
                self._X = self._X + damp * (res.X - self._X)
                self._U = self._U + damp * (res.U - self._U)
            else:
                self._X, self._U = res.X, res.U
            self._persist = res.persist
            delta = float(jnp.max(jnp.abs(res.delta_vec)))
            if self.save_it_data:
                self.it_data[ii] = {"cost": float(res.cost), "delta": delta}
            if self.opts.verbose:
                print(
                    f"{ii:>10} {delta:>10.2e} {float(res.cost):>10.2e} "
                    f"{float(res.primal_infeasibility):>10.2e} "
                    f"{int(res.sls.iteration_number):>8}"
                )

            if run_until_converged and float(jnp.max(jnp.abs(res.delta_vec))) < self.opts.epsilon_convergence:
                if self.opts.verbose:
                    print(f"SCP-SLS: converged in {ii} iterations")
                if self.opts.refine_on_convergence:
                    ref = sqp_solve(
                        self.m, self.N, self.Q, self.R, self.Qf, x0,
                        X_init=self._X, U_init=self._U, opts=self.opts.sqp,
                    )
                    # reference prints and DISCARDS the refinement (:129-133)
                    print(
                        f"Refinement SQP: success = {bool(ref.success)}, "
                        f"cost = {float(ref.cost):.6e}"
                    )
                return self._package(res, iterations, True, t_start)

        success = last_success if not run_until_converged else False
        if run_until_converged and self.opts.verbose:
            print(f"SCP did not converge in {iterations} iterations")
        return self._package(res, iterations, success, t_start,
                             failed_iterate=not last_success)

    def _package(self, res: SCPIterResult | None, iterations, success, t_start,
                 failed_iterate: bool = False):
        jax.block_until_ready(res.X if res is not None else jnp.zeros(0))
        t_ms = (time.perf_counter() - t_start) * 1e3
        if res is None:
            return {"success": False, "iterations": iterations, "t_solve_ms": t_ms}
        sls = res.sls
        # on a FAILED iteration, report the last ACCEPTED iterate as the
        # primal — the reference never updates current_iteration_scp on
        # socp_step failure (SCP_SLS_jit.py:96-99,426-430), and the batched
        # while_loop path (sim/closed_loop.make_mpc_step) keeps the last
        # accepted state the same way; run_closed_loop applies primal_u[:,0]
        # as u0, so packaging the failed iterate would fly an unvetted input
        X_out, U_out = (self._X, self._U) if failed_iterate else (res.X, res.U)

        # On a failed iterate the sls quantities (duals, K, Phi, backoffs)
        # belong to the REJECTED iterate — the reference never produces a
        # mixed accepted-primal/rejected-tube state (current_iteration_scp
        # retains last-accepted values for everything). We don't persist the
        # last accepted sls tensors host-side, so mark them invalid with NaN
        # (the same "no tube available" sentinel the batched path uses,
        # sim/closed_loop.py) rather than ship an unvetted tube.
        def _sls_field(x):
            a = np.asarray(x)
            if failed_iterate and np.issubdtype(a.dtype, np.floating):
                return np.full_like(a, np.nan)
            return a

        out = {
            "success": bool(success),
            "iterations": int(iterations),
            "primal_x": np.asarray(X_out).T,          # (nx, N+1) reference layout
            "primal_u": np.asarray(U_out).T,          # (nu, N)
            "primal_vec": np.asarray(pack_primal(X_out, U_out)),
            "delta_vec": np.asarray(res.delta_vec),
            "dual_mu": _sls_field(sls.lam).T,         # (ni, N)
            "dual_mu_f": _sls_field(sls.lam_f),
            "dual_eta": _sls_field(sls.eta),
            "dual_eta_f": _sls_field(sls.eta_f),
            "K": _sls_field(sls.K),
            "Phi_x": _sls_field(sls.Phi_x),
            "Phi_u": _sls_field(sls.Phi_u),
            "beta": _sls_field(sls.beta),
            "beta_f": _sls_field(sls.beta_f),
            "backoff": _sls_field(sls.backoff),
            "backoff_f": _sls_field(sls.backoff_f),
            "backoff_x": _sls_field(sls.backoff_x),   # (N+1, nx)
            "backoff_u": _sls_field(sls.backoff_u),   # (N, nu)
            "cost_QP": float(res.cost_QP),
            "cost": float(res.cost),
            "cost_tube": float(sls.cost_tube),
            "primal_infeasibility": float(res.primal_infeasibility),
            "SOCP_steps": int(sls.iteration_number),
            "qp_iters": int(sls.qp_iters),
            "qp_kkt": float(sls.qp_kkt),
            "it_data": dict(self.it_data),
            # timings: the iteration is one fused XLA program; per-stage
            # splits are available via profile_solve(). Legacy keys report
            # the fused total under t_qp and zero elsewhere.
            "t_solve_ms": t_ms,
            "t_jac_ms": 0.0,
            "t_qp_ms": t_ms,
            "t_backward_ms": 0.0,
        }
        return out

    def solve_profiled(self, x0):
        """Like solve() but runs the pipeline stage-by-stage with
        block_until_ready barriers to produce genuine per-stage timings
        (t_jac_ms / t_qp_ms / t_backward_ms — the reference's three
        instrumented spans, SCP_SLS_jit.py:268, qp_jit.py:392, 
        fast_SLS_jit.py:504). Only supports rti = 1 / fast_sls_rti_steps = 1
        (the rocket RTI headline config); falls back to solve() otherwise.
        """
        if not (self.opts.rti == 1 and self.opts.fast_sls_rti_steps == 1):
            return self.solve(x0)
        import time as _time

        from robust_nonlinear_mpc_tpu.ops.qp_ipm import QPData, solve_qp
        from robust_nonlinear_mpc_tpu.ops.sls_kernels import (
            backoff_from_phi,
            evaluate_dual_eta,
            propagate,
        )
        from robust_nonlinear_mpc_tpu.solvers.fast_sls import select_sls_kernels

        # profile the same backward kernel solve() runs (sls_block option)
        backward_solve, _ = select_sls_kernels(self.opts.sls_block)

        x0 = jnp.asarray(x0, self.dtype).reshape(-1)
        if self._X is None:
            if not self.solve_nominal_trajectory(x0):
                return {"success": False}
        m, N = self.m, self.N
        stat = self.prob.stat
        X, U = self._X, self._U

        if not hasattr(self, "_prof_fns"):
            Gmat = jnp.concatenate([stat.Gx, stat.Gu], axis=1)

            def jac_stage(X, U, x0):
                A, B, c, qx, qu, g_res, gf_res, _ = (
                    self.assemble_deviation_problem(X, U, x0)
                )
                return A, B, c, g_res, gf_res, qx, qu

            def qp_stage(A, B, c, qx, qu, h, hf, xinit):
                return solve_qp(
                    stat,
                    QPData(A=A, B=B, c=c, qx=qx, qu=qu, h=h, hf=hf, xinit=xinit),
                    self.opts.ipm,
                )

            def bwd_stage(A, B, lam, lam_f, beta, beta_f):
                eta, eta_f = evaluate_dual_eta(
                    lam, lam_f, beta, beta_f, self.opts.epsilon_backoff
                )
                _, K = backward_solve(A, B, Gmat, stat.Gf, eta, eta_f, self.prob.regs)
                return eta, eta_f, K

            def tighten_stage(A, B, K):
                Phi_x, Phi_u = propagate(A, B, self.prob.E, K)
                return backoff_from_phi(
                    Phi_x, Phi_u, stat.Gx, stat.Gu, stat.Gf,
                    self.opts.epsilon_backoff,
                )

            self._prof_fns = (
                jax.jit(jac_stage), jax.jit(qp_stage),
                jax.jit(bwd_stage), jax.jit(tighten_stage),
            )
        jac_f, qp_f, bwd_f, tighten_f = self._prof_fns

        def timed(f, *a):
            t0 = _time.perf_counter()
            out = f(*a)
            jax.block_until_ready(out)
            return out, (_time.perf_counter() - t0) * 1e3

        (A, B, c, g_res, gf_res, qx, qu), t_jac = timed(jac_f, X, U, x0)
        xinit = x0 - X[0]
        sol1, t_qp1 = timed(qp_f, A, B, c, qx, qu, g_res, gf_res, xinit)
        beta0 = jnp.full((N, N, m.ni), self.opts.epsilon_backoff, self.dtype)
        betaf0 = jnp.full((N + 1, m.ni_f), self.opts.epsilon_backoff, self.dtype)
        (eta, eta_f, K), t_bwd = timed(bwd_f, A, B, sol1.lam, sol1.lam_f, beta0, betaf0)
        (beta, beta_f, backoff, backoff_f), t_tighten = timed(tighten_f, A, B, K)
        sol2, t_qp2 = timed(
            qp_f, A, B, c, qx, qu, g_res - backoff, gf_res - backoff_f, xinit
        )

        self._X = X + sol2.X
        self._U = U + sol2.U
        out = {
            "success": bool(sol1.success & sol2.success),
            "primal_x": np.asarray(self._X).T,
            "primal_u": np.asarray(self._U).T,
            "backoff": np.asarray(backoff),
            "backoff_f": np.asarray(backoff_f),
            "backoff_x": np.concatenate(
                [np.asarray(backoff)[:, : m.nx], np.asarray(backoff_f)[None, : m.nx]]
            ),
            "backoff_u": np.asarray(backoff)[:, m.nx : m.nx + m.nu],
            "t_jac_ms": t_jac,
            "t_qp_ms": t_qp1 + t_qp2,
            "t_backward_ms": t_bwd,
            "t_tighten_ms": t_tighten,
        }
        return out

    def set_rti_steps(self, steps):
        """Reference fast_SLS.set_rti_steps parity (fast_SLS_jit.py:243):
        None or <= 0 disables the inner cap (until-convergence mode)."""
        steps = 0 if steps is None or int(steps) <= 0 else int(steps)
        self.opts = self.opts._replace(fast_sls_rti_steps=steps)

    def set_fast_sls_rti_steps(self, steps):
        """Reference SCP_SLS.set_fast_sls_rti_steps parity (SCP_SLS_jit.py:394)."""
        self.set_rti_steps(steps)

    def reset_warm_start(self):
        """Shift x/u one step and wipe the SLS iteration state, but keep the
        convergence memory — reference parity: reset_solver_to_zeros clears
        current_iteration but never _prev_primal_vec (reference :500-551,
        fast_SLS_jit.py:424-442,583-599)."""
        if self._X is None:
            return
        self._X, self._U = self._shift_jit(self._X, self._U)
        m = self.m
        old = self._persist
        self._persist = FastSLSPersist.init(
            self.N, m.nx, m.nu, m.ni, m.ni_f, m.nw, self.dtype,
            keep_prev=old.prev_primal,
        )._replace(have_prev=old.have_prev)
        if self.opts.recycle_eta:
            # dual-recycling mode: eta IS the recycled state — it must
            # survive the warm shift, stage-shifted to stay aligned with the
            # advanced horizon (fast_sls.warm_shift_persist)
            shifted = warm_shift_persist(old)
            self._persist = self._persist._replace(
                eta=shifted.eta, eta_f=shifted.eta_f
            )
            if self.opts.recycle_warm_qp:
                self._persist = self._persist._replace(qp_warm=shifted.qp_warm)
        self.it_data = {}

    def reset(self):
        self._X = None
        self._U = None
        m = self.m
        self._persist = FastSLSPersist.init(
            self.N, m.nx, m.nu, m.ni, m.ni_f, m.nw, self.dtype
        )
        self.it_data = {}

    def generate_lqr_controller(self):
        """Infinite-horizon LQR at the origin (reference :624-659).

        Uses scipy's DARE on host — a build/analysis utility, not a TPU path.
        Like the reference, overwrites self.Qf with the DARE solution (the
        already-built problem arrays are NOT rebuilt — reference parity).
        """
        from scipy.linalg import solve_discrete_are

        nx, nu = self.m.nx, self.m.nu
        x0 = jnp.zeros(nx, self.dtype)
        u0 = jnp.zeros(nu, self.dtype)
        A, B = self.m.linearize(x0, u0)
        A = np.asarray(A)
        B = np.asarray(B)
        P = solve_discrete_are(A, B, self.Q, self.R)
        K = np.linalg.solve(self.R + B.T @ P @ B, B.T @ P @ A)
        self.K = K
        self.Qf = P
        return {
            "K": K,
            "P": P,
            "A": A,
            "B": B,
            "controller": lambda x: -K @ np.asarray(x),
        }

    def eval_deviation_mismatch(self, e, d):
        """Linearized-vs-true deviation rollout check (reference :661-720).

        e: (nx, N+1) state deviations, d: (nu, N) input deviations
        (reference layouts).
        """
        assert self._X is not None, "no nominal trajectory available"
        N, nx, nu = self.N, self.m.nx, self.m.nu
        e = jnp.asarray(e, self.dtype).T  # (N+1, nx)
        d = jnp.asarray(d, self.dtype).T  # (N, nu)
        X, U = self._X, self._U
        A, B, c = self.m.linearize_traj(X, U)

        f_nom = jax.vmap(self.m.ddyn)(X[:N], U)
        r = f_nom - X[1:]
        pred = (
            jnp.einsum("kij,kj->ki", A, e[:N])
            + jnp.einsum("kij,kj->ki", B, d)
            + r
        )
        f_roll = jax.vmap(self.m.ddyn)(X[:N] + e[:N], U + d)
        roll = f_roll - X[1:]
        mismatch = roll - pred
        return {
            "mismatch": np.asarray(mismatch).T,
            "pred": np.asarray(pred).T,
            "roll": np.asarray(roll).T,
            "r": np.asarray(r).T,
            "norms": np.asarray(jnp.linalg.norm(mismatch, axis=1)),
        }
