"""True multi-process `jax.distributed` test (SURVEY.md §4: multi-host tests
via standard JAX multi-process simulation with local CPU devices).

Spawns TWO worker processes, each owning 2 virtual CPU devices, that form a
4-device global scenario mesh over Gloo collectives (the DCN stand-in) and
run the sharded Monte-Carlo evaluator of `parallel/mc.py` through
`parallel/distributed.py`'s init + global-mesh helpers. Each process holds
only its local shards; the psum/pmax validation statistics must agree across
processes and match the single-process 4-device run bit-for-bit (the psum
reduction order is identical).
"""

import os
import subprocess
import sys
import textwrap

import numpy as np

_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    pid = int(sys.argv[1]); port = sys.argv[2]
    from robust_nonlinear_mpc_tpu.parallel.distributed import (
        init_distributed, global_scenario_mesh, multihost_throughput,
    )
    n = init_distributed(f"localhost:{port}", 2, pid)
    assert n == 2, n
    assert len(jax.devices()) == 4

    import jax.numpy as jnp
    import numpy as np
    from robust_nonlinear_mpc_tpu.models import Pendulum
    from robust_nonlinear_mpc_tpu.parallel.mc import run_monte_carlo
    from robust_nonlinear_mpc_tpu.solvers.scp_sls import SCPSLSSolver

    m = Pendulum(); m.E = 0.003 * np.eye(4)
    solver = SCPSLSSolver(
        4, np.eye(4), np.eye(1), m, 10 * np.eye(4),
        Q_reg=1e3 * np.eye(4), R_reg=1e3 * np.eye(1), Q_reg_f=1e4 * np.eye(4),
        rti=1, fast_sls_rti_steps=1,
    )
    mesh = global_scenario_mesh()
    B, steps = 8, 2
    rng = np.random.default_rng(0)  # same stream on both processes
    x0s = jnp.asarray(np.array([0.4, 0.3, 0.0, 0.0])[None]
                      + 0.05 * rng.standard_normal((B, 4)), solver.dtype)
    Ws = jnp.asarray(2 * rng.random((B, steps, m.nw)) - 1, solver.dtype)
    logs, stats = run_monte_carlo(solver, steps, x0s, Ws, mesh)
    jax.block_until_ready(logs.state_trajectory)
    assert logs.state_trajectory.shape[0] == B  # global shape
    # each process only holds its local shards
    local = sum(s.data.shape[0] for s in logs.state_trajectory.addressable_shards)
    assert local == B // 2, local
    thr = multihost_throughput(solver, steps, scenarios_per_device=2, reps=1)
    assert thr["processes"] == 2 and thr["devices"] == 4
    print(f"RESULT {pid} n_scen={int(stats.n_scenarios)} "
          f"viol={int(stats.n_violations)} cost={float(stats.mean_cost):.12e} "
          f"worst={float(stats.worst_margin):.12e}")
    """
)


def test_two_process_distributed_mc(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    port = "12733"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd="/root/repo", env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
    results = sorted(
        line for out in outs for line in out.splitlines()
        if line.startswith("RESULT")
    )
    assert len(results) == 2, outs
    # identical global statistics on both processes
    f0 = results[0].split(" ", 2)[2]
    f1 = results[1].split(" ", 2)[2]
    assert f0 == f1, (f0, f1)
    assert "n_scen=8" in f0
    # finite stats
    cost = float(f0.split("cost=")[1].split()[0])
    assert np.isfinite(cost) and cost > 0
