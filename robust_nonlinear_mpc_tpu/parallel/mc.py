"""Sharded Monte-Carlo closed-loop rollouts and tube-violation statistics.

This is the scaling configuration from BASELINE.json ("Monte-Carlo tube
validation: 10k+ batched disturbance-realization rollouts per system across
pod slice"): scenario batches are sharded over a `jax.sharding.Mesh` with
`shard_map`; per-shard rollouts run the fully-jitted closed loop
(sim/closed_loop.build_batched_closed_loop) and cross-device statistics
(violation counts, worst margins) reduce with `jax.lax.psum`/`pmax` over ICI.
Individual MPC solves never communicate — scaling is embarrassingly parallel,
the collectives only aggregate validation statistics.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from robust_nonlinear_mpc_tpu.parallel.mesh import SCENARIO_AXIS
from robust_nonlinear_mpc_tpu.sim.closed_loop import build_batched_closed_loop


class MCStats(NamedTuple):
    """Cross-device Monte-Carlo aggregate.

    Solver failure and constraint violation are separate events: a failed
    solve carries no guarantee and its trajectory may be non-finite, so the
    cost/margin aggregates mask by per-lane success (all steps succeeded AND
    trajectory finite) and the failed-lane count is reported alongside —
    no NaN can reach any field of a shipped artifact.
    """

    n_scenarios: jax.Array       # total scenarios across all devices
    n_violations: jax.Array      # scenarios with any constraint violation
    worst_margin: jax.Array      # max constraint value over SUCCESSFUL lanes
    mean_cost: jax.Array         # mean closed-loop cost over SUCCESSFUL lanes
    n_failed_lanes: jax.Array    # lanes with any failed step / non-finite state


def lane_reductions(logs, G, g, Q, R):
    """Per-lane success mask, worst constraint margin, and quadratic cost.

    Pure (no collectives) so it is unit-testable against NaN-poisoned logs:
    lane_ok requires every step's solve to succeed AND the realized
    trajectory to be finite; non-finite margins are masked to -inf so a
    failed lane can neither count as a violation nor poison the max.
    """
    finite = jnp.all(jnp.isfinite(logs.state_trajectory), axis=(1, 2)) & \
        jnp.all(jnp.isfinite(logs.input_trajectory), axis=(1, 2))
    lane_ok = jnp.all(logs.success, axis=1) & finite      # (B_local,)
    z = jnp.concatenate(
        [logs.state_trajectory[:, :-1], logs.input_trajectory], axis=-1
    )
    margins = jnp.einsum("ri,bti->btr", G, z) - g
    margins = jnp.where(jnp.isfinite(margins), margins, -jnp.inf)
    worst = jnp.max(margins, axis=(1, 2))                 # (B_local,)
    cost = (
        jnp.einsum("bti,ij,btj->b", logs.state_trajectory, Q, logs.state_trajectory)
        + jnp.einsum("bti,ij,btj->b", logs.input_trajectory, R, logs.input_trajectory)
    )
    return lane_ok, worst, cost


def make_sharded_mc(solver, sim_steps: int, mesh):
    """Build a jitted, mesh-sharded Monte-Carlo evaluator.

    Returns fn(x0s (B, nx), Ws (B, T, nw)) -> (ClosedLoopLog sharded, MCStats
    replicated). B must be divisible by the mesh size.
    """
    m = solver.m
    rollout = build_batched_closed_loop(solver, sim_steps)
    G = jnp.asarray(m.G, solver.dtype)
    g = jnp.asarray(m.g, solver.dtype)
    Q = jnp.asarray(solver.Q, solver.dtype)
    R = jnp.asarray(solver.R, solver.dtype)

    def local_eval(x0s, Ws):
        logs = jax.vmap(rollout)(x0s, Ws)
        lane_ok, worst, cost = lane_reductions(logs, G, g, Q, R)
        violated = (worst > 0).sum()
        n_ok = jax.lax.psum(lane_ok.sum(), SCENARIO_AXIS)
        stats = MCStats(
            n_scenarios=jax.lax.psum(x0s.shape[0], SCENARIO_AXIS),
            n_violations=jax.lax.psum(violated, SCENARIO_AXIS),
            worst_margin=jax.lax.pmax(
                jnp.max(jnp.where(lane_ok, worst, -jnp.inf)), SCENARIO_AXIS
            ),
            mean_cost=jax.lax.psum(
                jnp.sum(jnp.where(lane_ok, cost, 0.0)), SCENARIO_AXIS
            ),
            n_failed_lanes=jax.lax.psum((~lane_ok).sum(), SCENARIO_AXIS),
        )
        stats = stats._replace(
            mean_cost=stats.mean_cost / jnp.maximum(n_ok, 1)
        )
        return logs, stats

    sharded = shard_map(
        local_eval,
        mesh=mesh,
        in_specs=(P(SCENARIO_AXIS), P(SCENARIO_AXIS)),
        out_specs=(P(SCENARIO_AXIS), P()),
        # the solver's inner scans initialize carries from replicated
        # constants that become device-varying; skip the VMA consistency
        # check (results are validated against unsharded vmap in tests)
        check_vma=False,
    )
    return jax.jit(sharded)


def run_monte_carlo(solver, sim_steps, x0s, Ws, mesh):
    fn = make_sharded_mc(solver, sim_steps, mesh)
    x0s = jax.device_put(x0s, NamedSharding(mesh, P(SCENARIO_AXIS)))
    Ws = jax.device_put(Ws, NamedSharding(mesh, P(SCENARIO_AXIS)))
    return fn(x0s, Ws)
