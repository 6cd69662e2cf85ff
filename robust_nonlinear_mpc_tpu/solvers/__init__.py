from robust_nonlinear_mpc_tpu.solvers.fast_sls import (
    FastSLSOptions,
    FastSLSPersist,
    FastSLSSolution,
    SLSProblem,
    fast_sls_solve,
)
from robust_nonlinear_mpc_tpu.solvers.ocp import OCP
from robust_nonlinear_mpc_tpu.solvers.qp_frontend import QP
from robust_nonlinear_mpc_tpu.solvers.scp_sls import SCPSLSOptions, SCPSLSSolver
from robust_nonlinear_mpc_tpu.solvers.soft_nlp import (
    NLPSoftSolver,
    SoftNLPSolution,
    soft_nlp_solve,
)
from robust_nonlinear_mpc_tpu.solvers.sqp import SQPOptions, SQPSolution, sqp_solve

__all__ = [
    "FastSLSOptions",
    "FastSLSPersist",
    "FastSLSSolution",
    "SLSProblem",
    "fast_sls_solve",
    "OCP",
    "QP",
    "SCPSLSOptions",
    "SCPSLSSolver",
    "NLPSoftSolver",
    "SoftNLPSolution",
    "soft_nlp_solve",
    "SQPOptions",
    "SQPSolution",
    "sqp_solve",
]
