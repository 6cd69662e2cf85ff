"""Oracle-model cross-checks: the reference-port NumPy plants must agree
with the framework's JAX plants to machine precision (same physics
transcribed twice from `/root/reference/dyn/*.py`), and the oracle's
complex-step Jacobians must match jacfwd — this anchors the independence
argument of tests/test_reference_parity.py at the model layer.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reference_port.models import (
    OraclePendulum,
    OracleQuadrotor,
    OracleRocket,
)
from robust_nonlinear_mpc_tpu.models import Pendulum, Quadrotor, Rocket

PAIRS = [
    (OraclePendulum, Pendulum),
    (OracleQuadrotor, Quadrotor),
    (OracleRocket, Rocket),
]


@pytest.mark.parametrize("Oracle,Framework", PAIRS,
                         ids=["pendulum", "quadrotor", "rocket"])
def test_static_data_and_dynamics_match(Oracle, Framework):
    om, fm = Oracle(), Framework()
    for attr in ["G", "g", "Gf", "gf", "E"]:
        a = np.asarray(getattr(om, attr), float)
        b = np.asarray(getattr(fm, attr), float)
        assert a.shape == b.shape
        np.testing.assert_array_equal(a, b)
    assert (om.nx, om.nu, om.ni, om.ni_f) == (fm.nx, fm.nu, fm.ni, fm.ni_f)

    rng = np.random.default_rng(7)
    for _ in range(3):
        x = rng.normal(size=om.nx) * 0.3
        u = rng.normal(size=om.nu) * 0.3
        fo = om.ddyn(x, u)
        ff = np.asarray(fm.ddyn(jnp.asarray(x), jnp.asarray(u)))
        assert np.abs(fo - ff).max() < 1e-12

        A_o, B_o = om.linearize(x, u)
        A_f = np.asarray(jax.jacfwd(
            lambda xx: fm.ddyn(xx, jnp.asarray(u)))(jnp.asarray(x)))
        B_f = np.asarray(jax.jacfwd(
            lambda uu: fm.ddyn(jnp.asarray(x), uu))(jnp.asarray(u)))
        assert np.abs(A_o - A_f).max() < 1e-10
        assert np.abs(B_o - B_f).max() < 1e-10
