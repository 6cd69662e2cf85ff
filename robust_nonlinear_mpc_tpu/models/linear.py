"""Linear model containers: LTI, LTV, and output-feedback variants.

Parity with the reference `dyn/LTI.py`, `dyn/LTV.py`, `dyn/LTI_OF.py`,
`dyn/LTV_OF.py`. The LTV container wraps a nonlinear model's dimensions and
constraint data with per-stage (A, B, E, g) arrays; like the reference
(`dyn/LTV.py:28-32`), a freshly-wrapped LTV carries placeholder all-ones
matrices until the first linearization update.

TPU-first difference: per-stage data are stacked (N, ...) arrays rather than
Python lists of matrices, so they drop straight into `lax.scan`/`vmap`.
"""

from __future__ import annotations

import numpy as np

from robust_nonlinear_mpc_tpu.models.base import Model
from robust_nonlinear_mpc_tpu.utils.numerics import mv


class LTI(Model):
    """x+ = A x + B u + E w (reference dyn/LTI.py:4)."""

    def __init__(self, A, B, E, G=None, g=None, Gf=None, gf=None):
        A = np.asarray(A, float)
        B = np.asarray(B, float)
        E = np.asarray(E, float)
        self.A, self.B, self.E = A, B, E
        self.nx = A.shape[0]
        self.nu = B.shape[1]
        self.nw = E.shape[1]
        self.dt = 1.0
        self.G = np.zeros((0, self.nx + self.nu)) if G is None else np.asarray(G, float)
        self.g = np.zeros((0,)) if g is None else np.asarray(g, float).reshape(-1)
        self.Gf = np.zeros((0, self.nx)) if Gf is None else np.asarray(Gf, float)
        self.gf = np.zeros((0,)) if gf is None else np.asarray(gf, float).reshape(-1)
        self.ni = self.G.shape[0]
        self.ni_f = self.Gf.shape[0]

    def ddyn(self, x, u, h=None):
        return mv(self.A, x) + mv(self.B, u)


class LTV(Model):
    """Per-stage linear dynamics wrapping a (nonlinear) model's dims/constraints.

    (reference dyn/LTV.py:17-32; placeholder ones until `update_model`)
    """

    def __init__(self, m: Model, N: int):
        self.N = N
        self.nx, self.nu, self.nw = m.nx, m.nu, m.nw
        self.G, self.ni = m.G, m.ni
        self.Gf, self.gf, self.ni_f = m.Gf, m.gf, m.ni_f
        self.dt = m.dt
        self.A_stack = np.ones((N, self.nx, self.nx))
        self.B_stack = np.ones((N, self.nx, self.nu))
        self.E_stack = np.ones((N + 1, self.nx, self.nw))
        self.g_stack = np.ones((N, self.ni))
        self.gf_vec = np.ones(self.ni_f)

    def ddyn(self, x, u, k: int = 0):
        return mv(self.A_stack[k], x) + mv(self.B_stack[k], u)

    def update_model(self, A_stack, B_stack, E_stack, g_stack, gf_vec=None):
        self.A_stack = np.asarray(A_stack, float)
        self.B_stack = np.asarray(B_stack, float)
        self.E_stack = np.asarray(E_stack, float)
        self.g_stack = np.asarray(g_stack, float)
        if gf_vec is not None:
            self.gf_vec = np.asarray(gf_vec, float)


class LTI_OF(LTI):
    """Output-feedback LTI: adds measurement C and noise F (dyn/LTI_OF.py:7).

    Scaffolding parity: no solver in the reference snapshot consumes these
    (SURVEY.md §2.1); kept for API-surface completeness.
    """

    def __init__(self, A, B, E, C, F, **kw):
        super().__init__(A, B, E, **kw)
        self.C = np.asarray(C, float)
        self.F = np.asarray(F, float)
        self.ny = self.C.shape[0]
        self.nv = self.F.shape[1]


class LTV_OF(LTV):
    """Output-feedback LTV with per-stage C/F stacks (dyn/LTV_OF.py:7)."""

    def __init__(self, m: Model, N: int, ny: int | None = None, nv: int | None = None):
        super().__init__(m, N)
        self.ny = ny if ny is not None else m.nx
        self.nv = nv if nv is not None else m.nx
        self.C_stack = np.ones((N + 1, self.ny, self.nx))
        self.F_stack = np.ones((N + 1, self.ny, self.nv))
