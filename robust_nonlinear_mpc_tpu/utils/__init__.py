from robust_nonlinear_mpc_tpu.utils.numerics import mm, mv, sym
from robust_nonlinear_mpc_tpu.utils.quaternion import (
    euler_to_quaternion,
    quaternion_to_euler,
)

__all__ = ["mm", "mv", "sym", "euler_to_quaternion", "quaternion_to_euler"]
