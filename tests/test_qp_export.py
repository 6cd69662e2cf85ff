"""QP export: the densified matrices must agree with the structured solve."""

import numpy as np

from robust_nonlinear_mpc_tpu.ops.packing import pack_primal
from robust_nonlinear_mpc_tpu.ops.qp_export import densify, export_quadprog
from robust_nonlinear_mpc_tpu.ops.qp_ipm import IPMOptions, solve_qp

from tests.helpers import random_qp


def test_densify_consistent_with_solution(tmp_path):
    stat, data = random_qp(seed=3)
    sol = solve_qp(stat, data, IPMOptions(max_iter=50, tol=1e-10))
    assert bool(sol.success)
    d = densify(stat, data)
    y = np.asarray(pack_primal(sol.X, sol.U))
    # equality residual at the solution vanishes
    assert np.max(np.abs(d["Aeq"] @ y - d["beq"])) < 1e-7
    # inequalities hold
    assert np.max(d["A"] @ y - d["b"]) < 1e-7
    # quadprog objective 1/2 y'Hy + f'y equals the structured cost
    obj = 0.5 * y @ d["H"] @ y + d["f"] @ y
    np.testing.assert_allclose(obj, float(sol.cost), rtol=1e-9, atol=1e-9)

    path = export_quadprog(stat, data, sol, out_dir=str(tmp_path))
    from scipy.io import loadmat

    back = loadmat(path)
    np.testing.assert_allclose(back["H"], d["H"])
    assert "x_traj" in back
