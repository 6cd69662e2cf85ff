"""Multi-host (pod-slice) initialization and scaling helpers.

The reference has no distributed layer at all (single CPU process,
SURVEY.md §2.4); this is the new-design component that takes the scenario
data-parallelism of `parallel/mc.py` across hosts:

  * `init_distributed()` wraps `jax.distributed.initialize` — on TPU pods
    the coordinator/process env comes from the TPU runtime automatically,
  * `global_scenario_mesh()` builds the 1-D scenario mesh over ALL devices
    of all processes; `shard_map` + `psum` then ride ICI within a slice and
    DCN across slices exactly as in the single-host path — MPC scenarios
    never communicate, so cross-host traffic is only the O(1) validation
    statistics and the >= 80% two-host scaling target (BASELINE.json) is
    bandwidth-trivial,
  * `multihost_throughput()` measures per-process and psum-aggregated
    solve throughput for the scaling report.

Single-host multi-device behavior is identical (initialize() is skipped
when no cluster env is present), so everything here is exercised by the
8-device virtual-mesh tests; real multi-host runs need a pod slice.
"""

from __future__ import annotations

import time

import jax
import numpy as np

from robust_nonlinear_mpc_tpu.parallel.mesh import SCENARIO_AXIS


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> int:
    """Initialize jax.distributed if running multi-process; returns process count.

    On TPU pods all arguments are discovered from the runtime; pass them
    explicitly only for manual CPU/GPU clusters.
    """
    try:
        if coordinator_address is not None:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        elif jax.process_count() == 1 and num_processes not in (None, 1):
            jax.distributed.initialize()
    except Exception as e:  # already initialized or single-process
        if "already" not in str(e).lower():
            raise
    return jax.process_count()


def global_scenario_mesh():
    """1-D scenario mesh over every device of every process."""
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (SCENARIO_AXIS,))


def multihost_throughput(solver, sim_steps: int, scenarios_per_device: int = 32,
                         reps: int = 3, x_center=None, x_spread: float = 0.3):
    """Measure sharded Monte-Carlo throughput across all hosts.

    Returns dict with global scenarios/s and the per-device breakdown; on a
    single host this reduces to the local measurement (the scaling report
    compares this number at 1 host vs N hosts).

    x_center/x_spread set the x0 ensemble x_center + x_spread * randn. With
    the default (center = origin, spread 0.3) the ensemble is a THROUGHPUT
    workload far outside the validated MC regime, so the returned
    `violations` count is not a robustness statistic — pass the system's
    validated MC center (e.g. rocket X0 with spread 0.05,
    expe/main_monte_carlo_validation.py) to make it one. The returned dict
    carries this caveat in `violations_note` (ADVICE/VERDICT r4).
    """
    import jax.numpy as jnp

    from robust_nonlinear_mpc_tpu.parallel.mc import run_monte_carlo

    mesh = global_scenario_mesh()
    n_dev = len(jax.devices())
    B = scenarios_per_device * n_dev
    # one shared seed: multi-process device_put with a global sharding
    # requires the SAME host-local value on every process (each keeps only
    # its local shards); per-process seeds trip jax's consistency check
    # (found by tests/test_distributed_multiprocess.py)
    rng = np.random.default_rng(0)
    m = solver.m
    center = (np.zeros(m.nx) if x_center is None
              else np.asarray(x_center, float).reshape(-1))
    validated_ensemble = x_center is not None
    x0s = jnp.asarray(
        center[None] + x_spread * rng.standard_normal((B, m.nx)),
        solver.dtype,
    )
    Ws = jnp.asarray(2 * rng.random((B, sim_steps, m.nw)) - 1, solver.dtype)

    logs, stats = run_monte_carlo(solver, sim_steps, x0s, Ws, mesh)
    jax.block_until_ready(logs.state_trajectory)
    t0 = time.perf_counter()
    for _ in range(reps):
        logs, stats = run_monte_carlo(solver, sim_steps, x0s, Ws, mesh)
    jax.block_until_ready(logs.state_trajectory)
    dt = (time.perf_counter() - t0) / reps
    return {
        "processes": jax.process_count(),
        "devices": n_dev,
        "scenarios": B,
        "mpc_steps_per_s": B * sim_steps / dt,
        "violations": int(stats.n_violations),
        "violations_note": (
            "validated MC x0 ensemble" if validated_ensemble else
            "x0 = {:.2g}*randn around the ORIGIN — a throughput workload "
            "far outside the validated MC regime; this count is NOT a "
            "robustness statistic (compare the MC validation artifacts "
            "instead)".format(x_spread)
        ),
    }
