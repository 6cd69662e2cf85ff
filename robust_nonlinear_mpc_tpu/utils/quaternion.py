"""Quaternion <-> Euler conversions, [w, x, y, z] convention.

Behavioral parity with the reference's `util/euler_to_quaternion.py:3` and
`util/quaternion_to_euler.py:3` (ZYX Euler angles), written for JAX arrays so
they can live inside jitted simulation loops.
"""

from __future__ import annotations

import jax.numpy as jnp


def euler_to_quaternion(roll, pitch, yaw):
    """ZYX Euler angles -> unit quaternion [w, x, y, z]."""
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)

    w = cr * cp * cy + sr * sp * sy
    x = sr * cp * cy - cr * sp * sy
    y = cr * sp * cy + sr * cp * sy
    z = cr * cp * sy - sr * sp * cy
    return jnp.stack([w, x, y, z], axis=-1)


def quaternion_to_euler(q):
    """Unit quaternion [w, x, y, z] -> ZYX Euler angles (roll, pitch, yaw)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]

    sinr_cosp = 2.0 * (w * x + y * z)
    cosr_cosp = 1.0 - 2.0 * (x * x + y * y)
    roll = jnp.arctan2(sinr_cosp, cosr_cosp)

    sinp = jnp.clip(2.0 * (w * y - z * x), -1.0, 1.0)
    pitch = jnp.arcsin(sinp)

    siny_cosp = 2.0 * (w * z + x * y)
    cosy_cosp = 1.0 - 2.0 * (y * y + z * z)
    yaw = jnp.arctan2(siny_cosp, cosy_cosp)
    return jnp.stack([roll, pitch, yaw], axis=-1)


def rotation_matrix_from_quaternion(q):
    """Body->world rotation matrix from quaternion [w, x, y, z].

    Same algebraic formulation the reference models use
    (reference: dyn/rocket.py:195-208, dyn/quadrotor.py:125-138).
    """
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * qy**2 - 2 * qz**2
    r01 = 2 * qx * qy - 2 * qz * qw
    r02 = 2 * qx * qz + 2 * qy * qw
    r10 = 2 * qx * qy + 2 * qz * qw
    r11 = 1 - 2 * qx**2 - 2 * qz**2
    r12 = 2 * qy * qz - 2 * qx * qw
    r20 = 2 * qx * qz - 2 * qy * qw
    r21 = 2 * qy * qz + 2 * qx * qw
    r22 = 1 - 2 * qx**2 - 2 * qy**2
    row0 = jnp.stack([r00, r01, r02], axis=-1)
    row1 = jnp.stack([r10, r11, r12], axis=-1)
    row2 = jnp.stack([r20, r21, r22], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def quaternion_derivative(q, omega):
    """Quaternion kinematics q_dot = 0.5 * Omega(omega) * q, q = [w, x, y, z].

    (reference: dyn/quadrotor.py:145-153, dyn/rocket.py:213-223)
    """
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    wx, wy, wz = omega[..., 0], omega[..., 1], omega[..., 2]
    dw = 0.5 * (-wx * qx - wy * qy - wz * qz)
    dx = 0.5 * (wx * qw + wz * qy - wy * qz)
    dy = 0.5 * (wy * qw - wz * qx + wx * qz)
    dz = 0.5 * (wz * qw + wy * qx - wx * qy)
    return jnp.stack([dw, dx, dy, dz], axis=-1)
