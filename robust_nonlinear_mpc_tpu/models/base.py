"""Model base class: continuous-time ODE + discretization + constraint data.

Behavioral parity with the reference's `dyn/model.py` (`Model.ddyn:15` RK4 /
Euler discretization, `remove_constraints:36`), re-designed for JAX:

  * `ode(x, u)` is a pure function of JAX arrays (replaces CasADi SX graphs),
  * `ddyn(x, u)` is jit/vmap-friendly (static dt, static method),
  * `linearize(x, u)` uses `jax.jacfwd` on the discrete dynamics (replaces
    CasADi `ca.jacobian`, reference `solver/SCP_SLS_jit.py:199-218`),
  * constraint polytopes G [x;u] <= g, Gf x <= gf and the disturbance scaling
    E are plain numpy arrays (static problem data lifted into device arrays by
    the solvers).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class Model:
    """Nonlinear control-affine-ish model with polytopic constraints.

    Subclasses must set: nx, nu, nw, ni, ni_f, dt, G, g, Gf, gf, E and
    implement `ode(x, u) -> xdot`.
    """

    nx: int
    nu: int
    nw: int
    ni: int
    ni_f: int
    dt: float
    discretization_method: str = "rk4"

    G: np.ndarray
    g: np.ndarray
    Gf: np.ndarray
    gf: np.ndarray
    E: np.ndarray

    def ode(self, x: jax.Array, u: jax.Array) -> jax.Array:
        raise NotImplementedError

    def ddyn(self, x: jax.Array, u: jax.Array, h: float | None = None) -> jax.Array:
        """Discrete-time dynamics x+ = f(x, u): RK4 (default) or Euler.

        (reference: dyn/model.py:15-34)
        """
        if h is None:
            h = self.dt
        x = jnp.asarray(x)
        u = jnp.asarray(u)
        if self.discretization_method == "euler":
            return x + h * self.ode(x, u)
        k1 = self.ode(x, u)
        k2 = self.ode(x + 0.5 * h * k1, u)
        k3 = self.ode(x + 0.5 * h * k2, u)
        k4 = self.ode(x + h * k3, u)
        return x + (h / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)

    # ------------------------------------------------------------------
    # Linearization (replaces the CasADi jacobian factory,
    # reference solver/SCP_SLS_jit.py:190-228)
    # ------------------------------------------------------------------
    def linearize(self, x: jax.Array, u: jax.Array):
        """Return (A, B) = (d f/d x, d f/d u) of the discrete dynamics."""
        A = jax.jacfwd(self.ddyn, argnums=0)(x, u)
        B = jax.jacfwd(self.ddyn, argnums=1)(x, u)
        return A, B

    def linearize_traj(self, X: jax.Array, U: jax.Array):
        """Vmapped linearization along a trajectory.

        X: (N+1, nx) nominal states, U: (N, nu) nominal inputs.
        Returns A (N, nx, nx), B (N, nx, nu), c (N, nx) where
        c_k = f(x_k, u_k) - x_{k+1} is the dynamics defect
        (reference: SCP_SLS_jit.py:218 `c_offset = fS - xpS`).
        """
        N = U.shape[0]
        Xk, Uk, Xp = X[:N], U, X[1 : N + 1]

        def one(xk, uk, xp):
            # one primal evaluation + one linearization shared by all
            # nx + nu tangents (jacfwd(argnums=0) + jacfwd(argnums=1) +
            # a separate primal call would evaluate/trace ddyn three times)
            f, jvp = jax.linearize(self.ddyn, xk, uk)
            zx, zu = jnp.zeros_like(xk), jnp.zeros_like(uk)
            eye_x = jnp.eye(xk.shape[0], dtype=xk.dtype)
            eye_u = jnp.eye(uk.shape[0], dtype=uk.dtype)
            A = jax.vmap(lambda e: jvp(e, zu))(eye_x).T
            B = jax.vmap(lambda e: jvp(zx, e))(eye_u).T
            return A, B, f - xp

        return jax.vmap(one)(Xk, Uk, Xp)

    # ------------------------------------------------------------------
    # Constraint editing (reference: dyn/model.py:36-45, dyn/pendulum.py:146)
    # ------------------------------------------------------------------
    def remove_constraints(self) -> None:
        self.G = np.zeros((0, self.nx + self.nu))
        self.g = np.zeros((0,))
        self.Gf = np.zeros((0, self.nx))
        self.gf = np.zeros((0,))
        self.ni = 0
        self.ni_f = 0


def box_polytope(x_ub, x_lb, u_ub, u_lb):
    """Build stage polytope G [x;u] <= g from box bounds.

    Rows ordered [upper bounds; negated lower bounds], matching the reference
    convention G = [I; -I], g = [ub; -lb] (e.g. dyn/rocket.py:129-130).
    """
    x_ub = np.asarray(x_ub, dtype=float)
    x_lb = np.asarray(x_lb, dtype=float)
    u_ub = np.asarray(u_ub, dtype=float)
    u_lb = np.asarray(u_lb, dtype=float)
    n = x_ub.size + u_ub.size
    G = np.vstack([np.eye(n), -np.eye(n)])
    g = np.concatenate([x_ub, u_ub, -x_lb, -u_lb])
    return G, g


def terminal_box_polytope(x_ub, x_lb):
    """Terminal polytope Gf x <= gf from box bounds (dyn/rocket.py:137-138)."""
    x_ub = np.asarray(x_ub, dtype=float)
    x_lb = np.asarray(x_lb, dtype=float)
    n = x_ub.size
    Gf = np.vstack([np.eye(n), -np.eye(n)])
    gf = np.concatenate([x_ub, -x_lb])
    return Gf, gf
