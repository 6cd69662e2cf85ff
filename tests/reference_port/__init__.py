"""Full-stack pure-NumPy/scipy transliteration of the reference pipeline.

This package is the *executable reference oracle* (VERDICT.md round-1 item 1):
a deliberately-naive, loop-based re-implementation of the reference's
SCP-SLS stack (`/root/reference/solver/{SCP_SLS_jit,fast_SLS_jit,qp_jit,nlp}.py`)
with the reference's quirks included, using

  * a dense f64 Mehrotra interior-point QP (full-KKT `numpy.linalg` solves —
    structurally independent of the framework's Riccati-KKT IPM) in place of
    OSQP at eps = 1e-9 (`qp_jit.py:295-306`),
  * `scipy.optimize.minimize(method="trust-constr")` on the multiple-shooting
    NLP in place of IPOPT (`nlp.py:158-217`),
  * plain Python loops transliterating the numba kernels
    (`fast_SLS_jit.py:43-188`).

The closed-loop parity tests (tests/test_reference_parity.py) run the three
seeded reference experiments through BOTH this oracle and the framework's
CPU-f64 path and require the applied input sequences to agree to 1e-4 —
the BASELINE.json acceptance criterion, replacing the self-referential
golden regressions as the behavioral anchor.
"""
