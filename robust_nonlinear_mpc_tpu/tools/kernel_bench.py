"""Standalone timing of the SLS kernel variants at the bench shapes.

Compares the GEMM-folded kernels against the triangular column-blocked
variants (backward_solve_blocked / response_streaming_blocked) at the rocket
bench configuration (N=15, nx=17, nu=4, ni=42, ni_f=34, nw=17, B=256, f32).
Each variant is a separate jitted program (one remote compile each on this
environment — restrict with RNM_KERNEL_VARIANTS).

Run: python -m robust_nonlinear_mpc_tpu.tools.kernel_bench
Env: RNM_BENCH_BATCH (256), RNM_BENCH_REPS (30),
     RNM_KERNEL_BLOCKS (comma list of block sizes, default "8,4"),
     RNM_KERNEL_VARIANTS (comma list, e.g. "bwd_folded,bwd_blocked8";
     unknown names raise; the response variants always cost one extra
     backward compile to produce the shared K input)
"""

from __future__ import annotations

import functools
import json
import os
import time


def main():
    import jax

    from robust_nonlinear_mpc_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    from robust_nonlinear_mpc_tpu.ops.sls_kernels import (
        SLSRegs,
        backward_solve_blocked,
        backward_solve_folded,
        response_streaming_blocked,
        response_streaming_folded,
    )
    from robust_nonlinear_mpc_tpu.utils.platform import env_int

    N, nx, nu, ni, ni_f, nw = 15, 17, 4, 42, 34, 17
    B = env_int("RNM_BENCH_BATCH", 256)
    reps = env_int("RNM_BENCH_REPS", 30)
    only = {s.strip() for s in os.environ.get("RNM_KERNEL_VARIANTS", "").split(",") if s.strip()}
    dtype = jnp.zeros(0).dtype

    rng = np.random.default_rng(0)
    A = jnp.asarray(0.9 * rng.standard_normal((B, N, nx, nx)) / np.sqrt(nx), dtype)
    Bm = jnp.asarray(rng.standard_normal((B, N, nx, nu)), dtype)
    E = jnp.asarray(0.05 * rng.standard_normal((B, N + 1, nx, nw)), dtype)
    G = jnp.asarray(rng.standard_normal((ni, nx + nu)), dtype)
    Gf = jnp.asarray(rng.standard_normal((ni_f, nx)), dtype)
    eta = jnp.asarray(np.abs(rng.standard_normal((B, N, N, ni))), dtype)
    eta_f = jnp.asarray(np.abs(rng.standard_normal((B, N + 1, ni_f))), dtype)
    regs = SLSRegs(
        jnp.asarray(1e4 * np.eye(nx), dtype),
        jnp.asarray(1e4 * np.eye(nu), dtype),
        jnp.asarray(1e4 * np.eye(nx), dtype),
    )
    eps = 1e-10

    def bwd(fn):
        return jax.jit(jax.vmap(lambda a, b, e, ef: fn(a, b, G, Gf, e, ef, regs)[1]))

    def resp(fn):
        return jax.jit(
            jax.vmap(lambda a, b, e, k: fn(a, b, e, k, G[:, :nx], G[:, nx:], Gf, regs, eps))
        )

    blocks = [
        int(b) for b in os.environ.get("RNM_KERNEL_BLOCKS", "8,4").split(",")
    ]
    variants = {"bwd_folded": (bwd(backward_solve_folded), (A, Bm, eta, eta_f))}
    for blk in blocks:
        variants[f"bwd_blocked{blk}"] = (
            bwd(functools.partial(backward_solve_blocked, block=blk)),
            (A, Bm, eta, eta_f),
        )
    need_resp = not only or any(n.startswith("resp_") for n in only)
    if need_resp:
        # shared K input for the response variants — produced by a backward
        # variant that is already selected, so the restriction saves compiles
        src = "bwd_folded"
        sel_bwd = [n for n in sorted(only) if n.startswith("bwd_")]
        if only and sel_bwd:
            src = sel_bwd[0]
        K = variants[src][0](A, Bm, eta, eta_f)
        jax.block_until_ready(K)
        variants["resp_folded"] = (
            resp(response_streaming_folded), (A, Bm, E, K)
        )
        for blk in blocks:
            variants[f"resp_blocked{blk}"] = (
                resp(functools.partial(response_streaming_blocked, block=blk)),
                (A, Bm, E, K),
            )

    if only:
        unknown = only - set(variants)
        if unknown:
            raise SystemExit(
                f"RNM_KERNEL_VARIANTS: unknown {sorted(unknown)}; "
                f"available: {sorted(variants)} (blocked sizes come from "
                f"RNM_KERNEL_BLOCKS)"
            )
    times = {}
    for name, (fn, args) in variants.items():
        if only and name not in only:
            continue
        out = fn(*args)  # compile
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        times[name] = round((time.perf_counter() - t0) / reps * 1e3, 3)

    print(json.dumps({
        "metric": "sls_kernel_variants_ms",
        "batch": B, "reps": reps, "device": str(jax.devices()[0]),
        "dtype": str(dtype), "times_ms": times,
    }))


if __name__ == "__main__":
    main()
