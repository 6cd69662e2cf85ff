"""Pure-NumPy ports of the reference plant models for the oracle pipeline.

Physics, constants, bounds, and E matrices are behavioral transcriptions of
`/root/reference/dyn/{model,pendulum,quadrotor,rocket}.py` (the capability
being replicated). Everything is written complex-step-safe so the oracle can
compute machine-precision Jacobians

    A = dF/dx  via  Im(F(x + i*h*e_j, u)) / h,   h = 1e-30

without any autodiff framework — fully independent of the JAX models in
`robust_nonlinear_mpc_tpu/models/` that they are used to cross-check.
"""

from __future__ import annotations

import numpy as np

_CS_H = 1e-30  # complex-step size: exact to f64 roundoff for analytic f


class OracleModel:
    """RK4/Euler discretization + complex-step linearization.

    Mirrors `dyn/model.py:15-34` (RK4 default) and provides the (A, B)
    Jacobians the reference obtains from CasADi (`SCP_SLS_jit.py:199-218`).
    """

    discretization_method = "rk4"

    def ddyn(self, x, u, h=0.05):
        ode = self.ode
        if self.discretization_method == "euler":
            return x + h * ode(x, u)
        k1 = ode(x, u)
        k2 = ode(x + 0.5 * h * k1, u)
        k3 = ode(x + 0.5 * h * k2, u)
        k4 = ode(x + h * k3, u)
        return x + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)

    def linearize(self, x, u, h=0.05):
        """Return A = d ddyn/dx, B = d ddyn/du at (x, u) by complex step."""
        x = np.asarray(x, float).ravel()
        u = np.asarray(u, float).ravel()
        nx, nu = x.size, u.size
        A = np.zeros((nx, nx))
        B = np.zeros((nx, nu))
        xc = x.astype(complex)
        uc = u.astype(complex)
        for j in range(nx):
            xp = xc.copy()
            xp[j] += 1j * _CS_H
            A[:, j] = self.ddyn(xp, uc, h).imag / _CS_H
        for j in range(nu):
            up = uc.copy()
            up[j] += 1j * _CS_H
            B[:, j] = self.ddyn(xc, up, h).imag / _CS_H
        return A, B


class OraclePendulum(OracleModel):
    """Cart-pole, `dyn/pendulum.py:7-44`: nx=4, nu=1, box |x|<=10, |u|<=5."""

    def __init__(self):
        self.nx, self.nu, self.dt = 4, 1, 0.05
        self.G = np.vstack([np.eye(5), -np.eye(5)])
        x_max = np.full(4, 10.0)
        u_max = np.array([5.0])
        self.g = np.concatenate([x_max, u_max, x_max, u_max])
        self.ni = 10
        self.Gf = np.vstack([np.eye(4), -np.eye(4)])
        self.gf = np.concatenate([x_max, x_max])
        self.ni_f = 8
        self.E = 0.1 * np.eye(4)
        self.nw = 4

    def replace_constraints(self, x_max, x_min, u_max, u_min, x_max_f, x_min_f):
        # `dyn/pendulum.py:146-148` semantics: asymmetric boxes
        self.g = np.concatenate([x_max, u_max, -x_min, -u_min])
        self.gf = np.concatenate([x_max_f, -x_min_f])

    def ode(self, X, u):
        x_dot, theta, theta_dot = X[1], X[2], X[3]
        uu = u[0]
        m1, m2, l, g = 1.0, 0.1, 0.5, 9.81
        st, ct = np.sin(theta), np.cos(theta)
        den = m1 + m2 * (1 - ct**2)
        x_ddot = (uu + m2 * l * theta_dot**2 * st - m2 * g * st * ct) / den
        theta_ddot = (-uu * ct - m2 * l * theta_dot**2 * st * ct
                      + (m1 + m2) * g * st) / (l * den)
        out = np.zeros(4, dtype=np.result_type(X, u))
        out[0], out[1], out[2], out[3] = x_dot, x_ddot, theta_dot, theta_ddot
        return out


def _quat_rotation_matrix(qw, qx, qy, qz):
    """Body->world rotation, the explicit 9-entry form shared by
    `dyn/quadrotor.py:122-137` and `dyn/rocket.py:190-204`."""
    dt = np.result_type(qw, qx, qy, qz)
    R = np.empty((3, 3), dtype=dt)
    R[0, 0] = 1 - 2 * qy**2 - 2 * qz**2
    R[0, 1] = 2 * qx * qy - 2 * qz * qw
    R[0, 2] = 2 * qx * qz + 2 * qy * qw
    R[1, 0] = 2 * qx * qy + 2 * qz * qw
    R[1, 1] = 1 - 2 * qx**2 - 2 * qz**2
    R[1, 2] = 2 * qy * qz - 2 * qx * qw
    R[2, 0] = 2 * qx * qz - 2 * qy * qw
    R[2, 1] = 2 * qy * qz + 2 * qx * qw
    R[2, 2] = 1 - 2 * qx**2 - 2 * qy**2
    return R


def _quat_kinematics(qw, qx, qy, qz, wx, wy, wz):
    """q_dot = 0.5 * Omega(w) q with q = [w,x,y,z] (`quadrotor.py:146-153`)."""
    dt = np.result_type(qw, wx)
    qd = np.empty(4, dtype=dt)
    qd[0] = 0.5 * (-wx * qx - wy * qy - wz * qz)
    qd[1] = 0.5 * (wx * qw + wz * qy - wy * qz)
    qd[2] = 0.5 * (wy * qw - wz * qx + wx * qz)
    qd[3] = 0.5 * (wz * qw + wy * qx - wx * qy)
    return qd


class OracleQuadrotor(OracleModel):
    """6-DOF quadrotor, `dyn/quadrotor.py:6-175`: nx=13, nu=4 rotor thrusts."""

    def __init__(self):
        self.nx, self.nu, self.dt = 13, 4, 0.05
        self.params = dict(m=1.0, g=9.81, l=0.15, Jx=0.02, Jy=0.02, Jz=0.04,
                           kM=0.01)
        x_ub = np.array([20, 20, 20, 10, 10, 10, 1.5, 1.5, 1.5, 1.5,
                         20, 20, 20], float)
        x_lb = -x_ub
        u_ub = np.full(4, 20.0)
        u_lb = np.zeros(4)
        n = self.nx + self.nu
        self.G = np.vstack([np.eye(n), -np.eye(n)])
        self.g = np.concatenate([x_ub, u_ub, -x_lb, -u_lb])
        self.ni = 2 * n
        self.Gf = np.vstack([np.eye(self.nx), -np.eye(self.nx)])
        self.gf = np.concatenate([x_ub, -x_lb])
        self.ni_f = 2 * self.nx
        self.E = np.diag([0.05, 0.05, 0.05, 0.1, 0.1, 0.1,
                          0.02, 0.02, 0.02, 0.01, 0.2, 0.2, 0.2])
        self.nw = self.nx

    def ode(self, X, u):
        p = self.params
        m, g, l, kM = p["m"], p["g"], p["l"], p["kM"]
        Jx, Jy, Jz = p["Jx"], p["Jy"], p["Jz"]
        v = X[3:6]
        qw, qx, qy, qz = X[6], X[7], X[8], X[9]
        wx, wy, wz = X[10], X[11], X[12]
        f1, f2, f3, f4 = u[0], u[1], u[2], u[3]

        Fz = f1 + f2 + f3 + f4
        R = _quat_rotation_matrix(qw, qx, qy, qz)
        a = (1.0 / m) * (R @ np.array([0, 0, 1], float)) * Fz
        dt = np.result_type(X, u)
        acc = np.array([a[0], a[1], a[2] - g], dtype=dt)

        qd = _quat_kinematics(qw, qx, qy, qz, wx, wy, wz)

        tau = np.array([l * (f2 - f4), l * (f3 - f1),
                        kM * (f1 - f2 + f3 - f4)], dtype=dt)
        Jw = np.array([Jx * wx, Jy * wy, Jz * wz], dtype=dt)
        w_cross_Jw = np.array([wy * Jw[2] - wz * Jw[1],
                               wz * Jw[0] - wx * Jw[2],
                               wx * Jw[1] - wy * Jw[0]], dtype=dt)
        wd = (tau - w_cross_Jw) / np.array([Jx, Jy, Jz])

        return np.concatenate([v, acc, qd, wd])


class OracleRocket(OracleModel):
    """Thrust-vectored rocket ("rockETH"), `dyn/rocket.py:13-254`: nx=17, nu=4.

    Quirks preserved: +11.3796 hover offset on thrust state AND input
    (:173,179); torque_x is an actuator state that never enters the
    rotational dynamics (:226-229 use only the gimbal thrust torque); the
    torque lag reuses the *thrust* time constant (:233).
    """

    HOVER = 11.3796

    def __init__(self):
        self.nx, self.nu, self.dt = 17, 4, 0.05
        self.params = dict(
            mass=1.16, gravity_constant=9.81,
            inertia_xx=0.00210, inertia_yy=0.10000, inertia_zz=0.10000,
            thrust_cog_offset=0.42000,
            thrust_magnitude_time_constant=0.06000,
            servo_angle_time_constant=0.10,
            gimbal_a=5.0, gimbal_b=35.2, gimbal_c=33.0, gimbal_d=28.0,
            gimbal_e=35.2,
        )
        MAXQ = 1.5
        x_ub = np.array([10, 10, 10, 1, 1, 1, MAXQ, MAXQ, MAXQ, MAXQ,
                         2, 2, 2, 50, 2, 1, 1], float)
        x_lb = -x_ub
        u_ub = np.array([50, 2, 1, 1], float)
        u_lb = -u_ub
        n = self.nx + self.nu
        self.G = np.vstack([np.eye(n), -np.eye(n)])
        self.g = np.concatenate([x_ub, u_ub, -x_lb, -u_lb])
        self.ni = 2 * n
        self.Gf = np.vstack([np.eye(self.nx), -np.eye(self.nx)])
        self.gf = np.concatenate([x_ub, -x_lb])
        self.ni_f = 2 * self.nx
        sigma_theta = np.deg2rad(2.0)
        q_vec_std = 0.5 * sigma_theta
        q_w_std = 0.1 * q_vec_std
        self.E = np.diag([0.03, 0.03, 0.03, 0.08, 0.08, 0.08,
                          q_vec_std, q_vec_std, q_vec_std, q_w_std,
                          0.10, 0.10, 0.10, 0.8, 0.2, 0.04, 0.04])
        self.nw = self.nx

    def _gimbal_angle(self, servo_angle, tilt_axis_angle):
        # closed-form four-bar linkage, `dyn/rocket.py:246-254`
        p = self.params
        leg1 = p["gimbal_d"] + p["gimbal_a"] * np.cos(servo_angle)
        leg2 = p["gimbal_e"] - p["gimbal_a"] * np.sin(servo_angle)
        circ = p["gimbal_b"] ** 2 - p["gimbal_c"] ** 2 - leg1**2 - leg2**2
        cosv = 2 * p["gimbal_c"] * np.cos(tilt_axis_angle) * leg2
        offs = -2 * p["gimbal_c"] * leg1
        disc = offs**2 + cosv**2 - circ**2
        return 2 * np.arctan((cosv - np.sqrt(disc)) / (circ + offs))

    def ode(self, X, u):
        p = self.params
        v = X[0:6][3:6]
        qw, qx, qy, qz = X[6], X[7], X[8], X[9]
        wx, wy, wz = X[10], X[11], X[12]
        thrust_mag = X[13] + self.HOVER
        torque_x = X[14]
        sa1, sa2 = X[15], X[16]
        thrust_in = u[0] + self.HOVER
        torque_in, sa1_in, sa2_in = u[1], u[2], u[3]

        gim1 = self._gimbal_angle(sa1, 0.0)
        gim2 = self._gimbal_angle(sa2, gim1)
        dt = np.result_type(X, u)
        B_thrust = np.array([
            -thrust_mag * np.sin(gim1) * np.cos(gim2),
            thrust_mag * np.sin(gim2),
            thrust_mag * np.cos(gim1) * np.cos(gim2),
        ], dtype=dt)

        R = _quat_rotation_matrix(qw, qx, qy, qz)
        acc = (R @ B_thrust) / p["mass"]
        acc = np.array([acc[0], acc[1], acc[2] - p["gravity_constant"]],
                       dtype=dt)

        qd = _quat_kinematics(qw, qx, qy, qz, wx, wy, wz)

        # torque from thrust applied below the cog: cross([0,0,-d], F_b)
        d = p["thrust_cog_offset"]
        tau = np.array([d * B_thrust[1], -d * B_thrust[0],
                        np.zeros((), dtype=dt)], dtype=dt)
        Jx, Jy, Jz = p["inertia_xx"], p["inertia_yy"], p["inertia_zz"]
        Jw = np.array([Jx * wx, Jy * wy, Jz * wz], dtype=dt)
        w_cross_Jw = np.array([wy * Jw[2] - wz * Jw[1],
                               wz * Jw[0] - wx * Jw[2],
                               wx * Jw[1] - wy * Jw[0]], dtype=dt)
        wd = (tau - w_cross_Jw) / np.array([Jx, Jy, Jz])

        thrust_dot = (thrust_in - thrust_mag) / p["thrust_magnitude_time_constant"]
        torque_dot = (torque_in - torque_x) / p["thrust_magnitude_time_constant"]
        sa1_dot = (sa1_in - sa1) / p["servo_angle_time_constant"]
        sa2_dot = (sa2_in - sa2) / p["servo_angle_time_constant"]

        return np.concatenate([
            v, acc, qd, wd,
            np.array([thrust_dot, torque_dot, sa1_dot, sa2_dot], dtype=dt),
        ])
