from robust_nonlinear_mpc_tpu.models.base import (
    Model,
    box_polytope,
    terminal_box_polytope,
)
from robust_nonlinear_mpc_tpu.models.integrator import Integrator
from robust_nonlinear_mpc_tpu.models.linear import LTI, LTI_OF, LTV, LTV_OF
from robust_nonlinear_mpc_tpu.models.pendulum import Pendulum
from robust_nonlinear_mpc_tpu.models.quadrotor import Quadrotor
from robust_nonlinear_mpc_tpu.models.rocket import Rocket

__all__ = [
    "Model",
    "Integrator",
    "box_polytope",
    "terminal_box_polytope",
    "LTI",
    "LTV",
    "LTI_OF",
    "LTV_OF",
    "Pendulum",
    "Quadrotor",
    "Rocket",
]
