"""HBM-traffic profile of the bench MPC step (VERDICT r4 item 4).

The r4 roofline row inferred "near HBM saturation" from
  bytes_per_solve (XLA cost analysis) x solves_per_s ~= 568 GB/s ~= 70% of
  v5e's ~819 GB/s.
That arithmetic conflates two different quantities. XLA's per-op
"bytes accessed" sums operand+result bytes over EVERY HLO op in the module
— including ops whose operands live in VMEM/registers after fusion — so it
is an upper bound on instruction-level data movement, not a measurement of
HBM traffic. The traffic that actually crosses HBM per dispatch is bounded
below by the program's *boundary*: argument buffers read + output buffers
written (+ any temp spills, which memory_analysis reports separately).

This tool separates the three quantities for the EXACT bench program
(imports bench.build_workload — same flags, same shapes, same cache):

  1. cost-analysis bytes/flops (the r4 number, reproduced for comparison);
  2. boundary bytes: sum of argument sizes + output sizes per dispatch,
     from the compiled executable's memory_analysis (plus temp/generated
     sizes = the true HBM working set);
  3. a donation A/B: jit(..., donate_argnums=0) lets XLA alias the carried
     pytree's input and output buffers, eliminating the carry's write-copy
     — if the bench were boundary-bandwidth-bound this would show up as
     throughput; if it is dispatch/VPU-bound it will not.

Emits one JSON record (artifacts/hbm_profile.json) with both
interpretations and the measured A/B so BASELINE.md can cite a number that
means what it says.

Run: python -m robust_nonlinear_mpc_tpu.tools.hbm_profile [--reps 10]
"""

import argparse
import json
import os
import time


def _tree_bytes(tree):
    import math

    import jax

    return sum(
        math.prod(a.shape) * a.dtype.itemsize
        for a in jax.tree_util.tree_leaves(tree)
        if hasattr(a, "shape") and hasattr(a, "dtype")
    )


def _timed_loop(step, carry, w_seq, n_warm, n_rep, donate=False):
    """Replicates bench.py's timed loop; with donate the carry buffers are
    consumed each call, so we must not reuse a donated buffer."""
    import jax
    import time as _t

    for i in range(max(1, n_warm)):
        carry, _ = step(carry, w_seq[i])
    jax.block_until_ready(carry[0])
    t0 = _t.perf_counter()
    for i in range(n_rep):
        carry, _ = step(carry, w_seq[max(1, n_warm) + i])
    jax.block_until_ready(carry[0])
    return _t.perf_counter() - t0, carry


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--ab-rounds", type=int, default=3,
                    help="alternating A/B rounds (interleaved to cancel "
                    "tunnel drift)")
    ap.add_argument("--out", default="artifacts/hbm_profile.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench

    wl = bench.build_workload()
    B, n_rep, n_warm = wl.B, args.reps, wl.n_warm
    step_j = wl.step_j
    carry, w_seq = wl.carry, wl.w_seq
    if w_seq.shape[0] < max(1, n_warm) + n_rep:
        raise SystemExit("--reps exceeds the workload's w_seq length")

    rec = {
        "batch": B,
        "device": str(jax.devices()[0]),
        "horizon_N": wl.solver.N,
    }

    # ---- 1/2: compiled-program accounting --------------------------------
    lowered = step_j.lower(carry, w_seq[0])
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    flops = float(ca.get("flops", 0.0))
    bytes_accessed = float(ca.get("bytes accessed", 0.0))
    rec["cost_analysis"] = {
        "flops_per_solve": flops / B if flops else None,
        "bytes_accessed_per_solve": bytes_accessed / B if bytes_accessed else None,
        "note": (
            "per-HLO-op operand+result sum; counts fused VMEM-resident "
            "intermediates — an upper bound on data movement, NOT HBM "
            "traffic (the r4 roofline row's 18.29 MB/solve is this number)"
        ),
    }

    ma = None
    try:
        ma = compiled.memory_analysis()
    except Exception:
        pass
    arg_bytes = _tree_bytes((carry, w_seq[0]))
    # outputs: carry' (same treedef/shapes as carry) + the per-step log tuple
    out_shapes = jax.eval_shape(lambda c, w: step_j(c, w), carry, w_seq[0])
    out_bytes = _tree_bytes(jax.tree_util.tree_leaves(out_shapes))
    boundary = {
        "argument_bytes": arg_bytes,
        "output_bytes": out_bytes,
        "boundary_bytes_per_solve": (arg_bytes + out_bytes) / B,
        "note": (
            "buffers that must cross the program edge per dispatch "
            "(args read + outputs written); the floor of true HBM traffic "
            "— compute-loop rereads of the N(N+1)/2 SLS triangle stream "
            "from VMEM when fused"
        ),
    }
    if ma is not None:
        for k in ("argument_size_in_bytes", "output_size_in_bytes",
                  "temp_size_in_bytes", "generated_code_size_in_bytes",
                  "alias_size_in_bytes"):
            try:
                boundary[f"xla_{k}"] = int(getattr(ma, k))
            except Exception:
                pass
    rec["boundary"] = boundary

    # ---- 3: donation A/B --------------------------------------------------
    # Interleaved rounds: the remote-TPU tunnel drifts session-to-session;
    # alternating measurements put both arms in the same window.
    step_don = jax.jit(jax.vmap(wl.mpc_step), donate_argnums=(0,))
    # warm both programs' compiles before timing anything
    c2, _ = step_j(carry, w_seq[0])
    jax.block_until_ready(c2[0])
    dcarry = jax.tree_util.tree_map(jnp.copy, carry)
    dcarry, _ = step_don(dcarry, w_seq[0])
    jax.block_until_ready(dcarry[0])

    base_ts, don_ts = [], []
    for _ in range(args.ab_rounds):
        t, _c = _timed_loop(step_j, carry, w_seq, n_warm, n_rep)
        base_ts.append(t)
        dcarry0 = jax.tree_util.tree_map(jnp.copy, carry)
        t, dcarry0 = _timed_loop(
            step_don, dcarry0, w_seq, n_warm, n_rep, donate=True
        )
        don_ts.append(t)
    solves = B * n_rep
    base = max(solves / t for t in base_ts)
    don = max(solves / t for t in don_ts)
    rec["donation_ab"] = {
        "baseline_solves_per_s": round(base, 1),
        "donated_solves_per_s": round(don, 1),
        "speedup": round(don / base, 4),
        "rounds": args.ab_rounds,
        "reps_per_round": n_rep,
        "note": (
            "donate_argnums=(0,) aliases the carried pytree in/out — "
            "removes the carry write-copy at the program edge; a "
            "bandwidth-bound program would speed up by ~carry-bytes/"
            "total-traffic, a dispatch/VPU-bound one by ~0"
        ),
    }

    # implied bandwidths at the measured baseline throughput
    rec["implied_bw"] = {
        "cost_analysis_GBps": round(bytes_accessed / B * base / 1e9, 1)
        if bytes_accessed else None,
        "boundary_GBps": round((arg_bytes + out_bytes) / B * base / 1e9, 2),
        "v5e_hbm_GBps": 819.0,
    }

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
