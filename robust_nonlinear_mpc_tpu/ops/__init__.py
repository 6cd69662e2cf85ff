from robust_nonlinear_mpc_tpu.ops.packing import pack_primal, unpack_primal
from robust_nonlinear_mpc_tpu.ops.qp_export import densify, export_quadprog
from robust_nonlinear_mpc_tpu.ops.qp_ipm import (
    CondensedKKT,
    IPMOptions,
    condense,
    QPData,
    QPSolution,
    QPStatics,
    solve_qp,
)
from robust_nonlinear_mpc_tpu.ops.sls_kernels import (
    SLSRegs,
    backoff_from_phi,
    backward_solve,
    evaluate_dual_eta,
    propagate,
    response_streaming,
    riccati_step,
    tensor_to_matrix,
    matrix_to_tensor,
    tube_cost,
)

__all__ = [
    "pack_primal",
    "densify",
    "export_quadprog",
    "unpack_primal",
    "CondensedKKT",
    "condense",
    "IPMOptions",
    "QPData",
    "QPSolution",
    "QPStatics",
    "solve_qp",
    "SLSRegs",
    "backoff_from_phi",
    "backward_solve",
    "evaluate_dual_eta",
    "propagate",
    "response_streaming",
    "riccati_step",
    "tensor_to_matrix",
    "matrix_to_tensor",
    "tube_cost",
]
