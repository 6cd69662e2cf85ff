from robust_nonlinear_mpc_tpu.sim.closed_loop import (
    ClosedLoopLog,
    build_batched_closed_loop,
    run_closed_loop,
)

__all__ = ["ClosedLoopLog", "build_batched_closed_loop", "run_closed_loop"]
