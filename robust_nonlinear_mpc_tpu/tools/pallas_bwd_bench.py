"""TPU standalone microbench: Pallas batch-on-lanes backward vs XLA kernels.

Reproduces the numbers in ops/pallas_sls.py's STATUS note. Run on TPU:
    python -m robust_nonlinear_mpc_tpu.tools.pallas_bwd_bench [--pieces]
--pieces times the curvature-assembly prologue GEMMs separately.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from robust_nonlinear_mpc_tpu.utils.platform import enable_compile_cache

enable_compile_cache()

from robust_nonlinear_mpc_tpu.ops.sls_kernels import (
    SLSRegs, backward_solve_blocked,
)
from robust_nonlinear_mpc_tpu.ops.pallas_sls import _backward_K_batched


def timeit(f, *args, reps=20):
    out = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    Bc, N, nx, nu, ni, ni_f = 512, 15, 17, 4, 42, 34
    rng = np.random.default_rng(0)
    f32 = jnp.float32
    A = jnp.asarray(0.95 * np.eye(nx) + 0.02 * rng.standard_normal((Bc, N, nx, nx)), f32)
    B = jnp.asarray(0.1 * rng.standard_normal((Bc, N, nx, nu)), f32)
    G = jnp.asarray(rng.standard_normal((ni, nx + nu)), f32)
    Gf = jnp.asarray(rng.standard_normal((ni_f, nx)), f32)
    eta = np.abs(rng.standard_normal((Bc, N, N, ni))).astype(np.float32)
    for k in range(N):
        eta[:, k, k + 1:] = 0.0
    eta = jnp.asarray(eta)
    eta_f = jnp.asarray(np.abs(rng.standard_normal((Bc, N + 1, ni_f))), f32)
    regs = SLSRegs(jnp.eye(nx, dtype=f32) * 2.0, jnp.eye(nu, dtype=f32) * 1.5,
                   jnp.eye(nx, dtype=f32) * 3.0)

    xla = jax.jit(jax.vmap(
        lambda a, b, e, ef: backward_solve_blocked(
            a, b, G, Gf, e, ef, regs, block=2)[1]
    ))
    pls = jax.jit(lambda a, b, e, ef: _backward_K_batched(
        a, b, G, Gf, e, ef, regs, b_tile=128))

    K_x = xla(A, B, eta, eta_f)
    K_p = pls(A, B, eta, eta_f)
    err = float(jnp.max(jnp.abs(K_x - K_p)) / jnp.max(jnp.abs(K_x)))
    t_x = timeit(xla, A, B, eta, eta_f)
    t_p = timeit(pls, A, B, eta, eta_f)
    print(f"XLA blocked(2): {t_x:.3f} ms   Pallas lanes: {t_p:.3f} ms   "
          f"speedup {t_x / t_p:.2f}x   rel err {err:.2e}")


def profile_pieces():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from robust_nonlinear_mpc_tpu.ops.sls_kernels import SLSRegs

    Bc, N, nx, nu, ni, ni_f = 512, 15, 17, 4, 42, 34
    J = N + 1
    rng = np.random.default_rng(0)
    f32 = jnp.float32
    eta = jnp.asarray(np.abs(rng.standard_normal((Bc, N, J, ni))), f32)
    eta_f = jnp.asarray(np.abs(rng.standard_normal((Bc, J, ni_f))), f32)
    Gx = jnp.asarray(rng.standard_normal((ni, nx)), f32)
    Gu = jnp.asarray(rng.standard_normal((ni, nu)), f32)
    Gf = jnp.asarray(rng.standard_normal((ni_f, nx)), f32)
    GGx = Gx[:, :, None] * Gx[:, None, :]
    GGu = Gu[:, :, None] * Gu[:, None, :]
    GGf = Gf[:, :, None] * Gf[:, None, :]
    hp = jax.lax.Precision.HIGHEST

    @jax.jit
    def prologue(eta, eta_f):
        Cxx = jnp.einsum("bkjr,rac->kajcb", eta, GGx, precision=hp)
        Cuu = jnp.einsum("bkjr,ruv->kujvb", eta, GGu, precision=hp)
        SN = jnp.einsum("bjr,rac->ajcb", eta_f, GGf, precision=hp)
        return Cxx, Cuu, SN

    @jax.jit
    def prologue_gemm_only(eta, eta_f):
        # same contraction as a plain GEMM, natural output layout
        C = jnp.matmul(eta.reshape(-1, ni), GGx.reshape(ni, -1), precision=hp)
        return C

    print(f"prologue (transposed-layout einsums): {timeit(prologue, eta, eta_f):.3f} ms")
    print(f"prologue (plain GEMM only):           {timeit(prologue_gemm_only, eta, eta_f):.3f} ms")


if __name__ == "__main__":
    import sys
    if "--pieces" in sys.argv:
        profile_pieces()
    else:
        main()
