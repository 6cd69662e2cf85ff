from robust_nonlinear_mpc_tpu.solvers.fast_sls import (
    FastSLSOptions,
    FastSLSSolution,
    SLSProblem,
    fast_sls_solve,
)
from robust_nonlinear_mpc_tpu.solvers.scp_sls import SCPSLSOptions, SCPSLSSolver
from robust_nonlinear_mpc_tpu.solvers.sqp import SQPOptions, SQPSolution, sqp_solve

__all__ = [
    "FastSLSOptions",
    "FastSLSSolution",
    "SLSProblem",
    "fast_sls_solve",
    "SCPSLSOptions",
    "SCPSLSSolver",
    "SQPOptions",
    "SQPSolution",
    "sqp_solve",
]
