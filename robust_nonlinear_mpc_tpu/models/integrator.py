"""Chain-of-integrators model.

The reference's codegen scripts import `dyn.integrator.Integrator`
(generate_osqp_{rockETH,quadrotor}.py) but the module is missing from the
snapshot (SURVEY.md §2.2); this provides the intended capability: a simple
n-th order integrator benchmark system with box constraints — the standard
sanity model for horizon solvers.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from robust_nonlinear_mpc_tpu.models.base import (
    Model,
    box_polytope,
    terminal_box_polytope,
)


class Integrator(Model):
    """x^(n) = u: state [x, x', ..., x^(n-1)], single input."""

    def __init__(self, order: int = 2, x_max: float = 10.0, u_max: float = 1.0,
                 dt: float = 0.1):
        self.order = int(order)
        self.nx = self.order
        self.nu = 1
        self.nw = self.nx
        self.dt = float(dt)

        x_ub = np.full(self.nx, float(x_max))
        u_ub = np.array([float(u_max)])
        self.G, self.g = box_polytope(x_ub, -x_ub, u_ub, -u_ub)
        self.ni = 2 * (self.nx + self.nu)
        self.Gf, self.gf = terminal_box_polytope(x_ub, -x_ub)
        self.ni_f = 2 * self.nx

        self.E = 0.05 * np.eye(self.nx)

    def ode(self, x, u):
        # xdot_i = x_{i+1}, xdot_{n-1} = u
        shifted = jnp.concatenate([x[..., 1:], u[..., :1]], axis=-1)
        return shifted
