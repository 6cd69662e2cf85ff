"""robust_nonlinear_mpc_tpu — a TPU-native robust nonlinear MPC framework.

A brand-new JAX/XLA/Pallas implementation of "Guaranteed Robust Nonlinear MPC
via Disturbance Feedback" (SCP over System Level Synthesis), with the same
capabilities as the reference CPU codebase (`antoineleeman/robust-nonlinear-mpc`):

  * pure-JAX dynamics models (cart-pole pendulum, 6-DOF quadrotor, thrust-
    vectored rocket "rockETH") with RK4/Euler discretization and polytopic
    constraints                                     (reference: dyn/)
  * a batched horizon-structured QP solver — primal-dual interior point with a
    Riccati (block-tridiagonal) KKT factorization    (reference: solver/qp_jit.py + OSQP)
  * fast-SLS disturbance-feedback synthesis: per-column backward Riccati,
    system-response propagation Phi_x/Phi_u, constraint-tightening backoffs
                                                     (reference: solver/fast_SLS_jit.py)
  * the SCP outer loop with RTI mode and warm starting
                                                     (reference: solver/SCP_SLS_jit.py)
  * an SQP nominal/soft-constrained solver replacing IPOPT
                                                     (reference: solver/nlp.py, nlp_soft_constraints.py)
  * closed-loop simulation harnesses, Monte-Carlo batched rollouts, and
    multi-chip scaling via jax.sharding              (reference: expe/)

Everything is functional (pure functions over pytrees), statically shaped, and
batched by construction via `jax.vmap`; multi-device scaling uses
`jax.sharding.Mesh` + `shard_map`.
"""

__version__ = "0.1.0"

from robust_nonlinear_mpc_tpu.models import Pendulum, Quadrotor, Rocket
from robust_nonlinear_mpc_tpu.solvers.scp_sls import SCPSLSSolver, SCPSLSOptions

__all__ = [
    "Pendulum",
    "Quadrotor",
    "Rocket",
    "SCPSLSSolver",
    "SCPSLSOptions",
    "__version__",
]
