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
    n_scenarios: jax.Array       # total scenarios across all devices
    n_violations: jax.Array      # scenarios with any constraint violation
    worst_margin: jax.Array      # max over scenarios of max constraint value
    mean_cost: jax.Array         # mean closed-loop quadratic cost


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
        # closed-loop constraint margins G [x; u] - g per step
        z = jnp.concatenate(
            [logs.state_trajectory[:, :-1], logs.input_trajectory], axis=-1
        )
        margins = jnp.einsum("ri,bti->btr", G, z) - g
        worst = jnp.max(margins, axis=(1, 2))             # (B_local,)
        violated = (worst > 0).sum()
        cost = jnp.sum(
            jnp.einsum("bti,ij,btj->b", logs.state_trajectory, Q, logs.state_trajectory)
            + jnp.einsum("bti,ij,btj->b", logs.input_trajectory, R, logs.input_trajectory)
        )
        stats = MCStats(
            n_scenarios=jax.lax.psum(x0s.shape[0], SCENARIO_AXIS),
            n_violations=jax.lax.psum(violated, SCENARIO_AXIS),
            worst_margin=jax.lax.pmax(jnp.max(worst), SCENARIO_AXIS),
            mean_cost=jax.lax.psum(cost, SCENARIO_AXIS),
        )
        stats = stats._replace(mean_cost=stats.mean_cost / stats.n_scenarios)
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
