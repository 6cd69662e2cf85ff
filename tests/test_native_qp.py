"""Native C++ QP backend vs the JAX Riccati-IPM kernel."""

import numpy as np
import pytest

from robust_nonlinear_mpc_tpu.native import available, qp_solve_native
from robust_nonlinear_mpc_tpu.ops.qp_ipm import IPMOptions, solve_qp

from tests.helpers import random_qp

pytestmark = pytest.mark.skipif(not available(), reason="g++ toolchain unavailable")


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_matches_jax(seed):
    stat, data = random_qp(seed=seed)
    jsol = solve_qp(stat, data, IPMOptions(max_iter=50, tol=1e-10))
    nsol = qp_solve_native(stat, data, max_iter=50, tol=1e-10)
    assert bool(jsol.success) and nsol["success"], (
        float(jsol.kkt_res), nsol["kkt_res"])
    np.testing.assert_allclose(nsol["X"], np.asarray(jsol.X), atol=1e-7)
    np.testing.assert_allclose(nsol["U"], np.asarray(jsol.U), atol=1e-7)
    np.testing.assert_allclose(nsol["lam"], np.asarray(jsol.lam), atol=1e-6)
    np.testing.assert_allclose(nsol["cost"], float(jsol.cost), rtol=1e-9)


def test_native_tight_constraints():
    import jax.numpy as jnp

    stat, data = random_qp(seed=7, feasible_margin=-0.05)
    data = data._replace(h=jnp.maximum(data.h, 0.05), hf=jnp.maximum(data.hf, 0.05))
    jsol = solve_qp(stat, data, IPMOptions(max_iter=50, tol=1e-10))
    nsol = qp_solve_native(stat, data)
    assert nsol["success"]
    np.testing.assert_allclose(nsol["U"], np.asarray(jsol.U), atol=1e-6)
