"""Model dynamics validation: equilibria, jacobians vs finite differences,
quaternion invariants, RK4 discretization order."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robust_nonlinear_mpc_tpu.models import LTI, LTV, Pendulum, Quadrotor, Rocket
from robust_nonlinear_mpc_tpu.utils.quaternion import (
    euler_to_quaternion,
    quaternion_to_euler,
    rotation_matrix_from_quaternion,
)

MODELS = [Pendulum, Quadrotor, Rocket]


def _rand_xu(m, seed=0, scale=0.3):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(scale * rng.standard_normal(m.nx))
    u = jnp.asarray(scale * rng.standard_normal(m.nu))
    return x, u


@pytest.mark.parametrize("cls", MODELS)
def test_jacobians_match_finite_differences(cls):
    m = cls()
    x, u = _rand_xu(m, seed=1)
    A, B = m.linearize(x, u)
    f0 = np.asarray(m.ddyn(x, u))
    epsd = 1e-6
    A_fd = np.zeros((m.nx, m.nx))
    for i in range(m.nx):
        dx = jnp.zeros(m.nx).at[i].set(epsd)
        A_fd[:, i] = (np.asarray(m.ddyn(x + dx, u)) - np.asarray(m.ddyn(x - dx, u))) / (
            2 * epsd
        )
    B_fd = np.zeros((m.nx, m.nu))
    for i in range(m.nu):
        du = jnp.zeros(m.nu).at[i].set(epsd)
        B_fd[:, i] = (np.asarray(m.ddyn(x, u + du)) - np.asarray(m.ddyn(x, u - du))) / (
            2 * epsd
        )
    np.testing.assert_allclose(np.asarray(A), A_fd, atol=1e-6)
    np.testing.assert_allclose(np.asarray(B), B_fd, atol=1e-6)
    assert not np.any(np.isnan(f0))


@pytest.mark.parametrize("cls", MODELS)
def test_dimensions_and_constraints(cls):
    m = cls()
    assert m.G.shape == (m.ni, m.nx + m.nu)
    assert m.g.shape == (m.ni,)
    assert m.Gf.shape == (m.ni_f, m.nx)
    assert m.gf.shape == (m.ni_f,)
    assert m.E.shape == (m.nx, m.nw)
    # zero state/input is strictly inside the polytopes for all three systems
    assert np.all(m.g > 0) or cls is Quadrotor  # quad has u >= 0 rows with g = 0
    assert np.all(m.gf > 0)


def test_pendulum_equilibrium():
    m = Pendulum()
    z = jnp.zeros(m.nx)
    np.testing.assert_allclose(np.asarray(m.ode(z, jnp.zeros(1))), 0.0, atol=1e-12)
    # inverted pendulum: theta = pi is also an equilibrium
    x = jnp.zeros(4).at[2].set(jnp.pi)
    np.testing.assert_allclose(np.asarray(m.ode(x, jnp.zeros(1))), 0.0, atol=1e-12)


def test_quadrotor_hover_equilibrium():
    m = Quadrotor()
    x = jnp.asarray(m.neutral_state)
    u = jnp.asarray(m.neutral_input)
    np.testing.assert_allclose(np.asarray(m.ode(x, u)), 0.0, atol=1e-12)


def test_rocket_origin_equilibrium():
    """At the origin the +11.3796 hover offset exactly cancels gravity
    (reference rocket.py:173: mass*g = 1.16*9.81 = 11.3796)."""
    m = Rocket()
    z17, z4 = jnp.zeros(17), jnp.zeros(4)
    xdot = np.asarray(m.ode(z17, z4))
    np.testing.assert_allclose(xdot, 0.0, atol=1e-10)
    # gimbal linkage is zero at zero servo angle
    assert abs(float(m.compute_gimbal_angle(0.0, 0.0))) < 1e-12


def test_rocket_torque_state_is_lag_only():
    """torque_x (state 14) feeds the actuator lag but not the rotational
    dynamics (reference rocket.py:226-229 uses only thrust x cog offset)."""
    m = Rocket()
    x, u = _rand_xu(m, seed=3)
    x2 = x.at[14].add(0.5)
    d1 = np.asarray(m.ode(x, u))
    d2 = np.asarray(m.ode(x2, u))
    # only the torque-lag row (index 14) may differ
    diff = np.abs(d1 - d2)
    assert diff[14] > 1e-3
    diff[14] = 0
    np.testing.assert_allclose(diff, 0.0, atol=1e-12)


def test_quaternion_norm_invariant():
    """d/dt |q|^2 = 0 under quaternion kinematics."""
    for cls in (Quadrotor, Rocket):
        m = cls()
        x, u = _rand_xu(m, seed=2, scale=0.4)
        q = x[6:10]
        qdot = m.ode(x, u)[6:10]
        assert abs(float(jnp.dot(q, qdot))) < 1e-12


def test_rk4_vs_fine_euler():
    """RK4 at dt must agree with many-step Euler to O(dt)."""
    m = Pendulum()
    x, u = _rand_xu(m, seed=4, scale=0.5)
    x_rk4 = np.asarray(m.ddyn(x, u, h=0.05))
    xs = x
    n_sub = 2000
    for _ in range(n_sub):
        xs = xs + (0.05 / n_sub) * m.ode(xs, u)
    np.testing.assert_allclose(x_rk4, np.asarray(xs), atol=1e-4)
    # euler mode matches the closed form
    m.discretization_method = "euler"
    np.testing.assert_allclose(
        np.asarray(m.ddyn(x, u, h=0.05)),
        np.asarray(x + 0.05 * m.ode(x, u)),
        atol=1e-14,
    )


def test_rotation_matrix_orthonormal():
    q = euler_to_quaternion(jnp.asarray(0.3), jnp.asarray(-0.2), jnp.asarray(1.1))
    R = np.asarray(rotation_matrix_from_quaternion(q))
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-12)


def test_quaternion_euler_roundtrip():
    angles = jnp.asarray([0.4, -0.7, 2.1])
    q = euler_to_quaternion(angles[0], angles[1], angles[2])
    back = quaternion_to_euler(q)
    np.testing.assert_allclose(np.asarray(back), np.asarray(angles), atol=1e-12)


def test_ltv_placeholder_wrapping():
    m = Rocket()
    ltv = LTV(m, 7)
    assert ltv.A_stack.shape == (7, 17, 17)
    assert np.all(ltv.A_stack == 1.0)  # placeholder ones (reference LTV.py:28-32)
    assert ltv.ni == m.ni and ltv.ni_f == m.ni_f


def test_lti_container():
    A = np.array([[1.0, 0.1], [0.0, 1.0]])
    B = np.array([[0.0], [0.1]])
    E = 0.1 * np.eye(2)
    lti = LTI(A, B, E)
    x = jnp.asarray([1.0, 2.0])
    u = jnp.asarray([3.0])
    np.testing.assert_allclose(np.asarray(lti.ddyn(x, u)), A @ np.asarray(x) + B @ np.asarray(u))


def test_integrator_model():
    from robust_nonlinear_mpc_tpu.models import Integrator

    m = Integrator(order=3, dt=0.1)
    x = jnp.asarray([1.0, 2.0, 3.0])
    u = jnp.asarray([4.0])
    np.testing.assert_allclose(np.asarray(m.ode(x, u)), [2.0, 3.0, 4.0])
    A, B = m.linearize(x, u)
    # discrete chain of integrators: A upper-triangular with dt powers
    np.testing.assert_allclose(np.asarray(A)[0, 1], 0.1, atol=1e-12)
    assert m.G.shape == (8, 4)


def test_integrator_mpc_end_to_end():
    from robust_nonlinear_mpc_tpu.models import Integrator
    from robust_nonlinear_mpc_tpu.solvers.scp_sls import SCPSLSSolver

    m = Integrator(order=2, dt=0.1, u_max=2.0)
    solver = SCPSLSSolver(
        10, np.eye(2), np.eye(1), m, 10 * np.eye(2),
        Q_reg=1e2 * np.eye(2), R_reg=1e2 * np.eye(1), Q_reg_f=1e3 * np.eye(2),
        rti=1, fast_sls_rti_steps=1,
    )
    sol = solver.solve(np.array([2.0, 0.0]))
    assert sol["success"]
    assert np.max(np.abs(sol["primal_u"])) <= 2.0 + 1e-8
