"""Sharded-greedy AMG above toy size (VERDICT r3 item 7).

Round 3's largest sharded-greedy evidence was a 2,304-node FEM graph
(tests/test_parallel_amg.py); the unstructured-sharding claim needs
exercising at >= 1e5 nodes. This study builds a ~108,900-node Delaunay
FEM graph Laplacian, runs `smoothed_aggregation(mesh=...)` on the
8-device virtual CPU mesh (ragged-SELL column-shard carriers on every
greedy level above dense_cutoff), solves, and records:

- level sizes / formats (which levels actually sharded),
- setup wall-time (aggregation + Galerkin + carrier pack),
- fine-level sharded SpMV vs the float64 oracle,
- ONE V-cycle application vs the unsharded hierarchy's (bitwise-same
  aggregates, so the outputs must agree to fp32 tolerance).

A full jitted CG solve is deliberately NOT run at this size on the CPU
mesh: interpret-mode Pallas unrolls each grid step into the traced
graph, and the while-loop CG body at 1e5 nodes crossed 15 min of XLA
CPU compile before being killed — a CPU-backend artifact (compiled
Mosaic on TPU has no such unroll), not a property of the sharded path;
the V-cycle apply is the same device code minus the while loop.

Companion law: at 262144^2/d~8e-4 (bench/scale.py's cliff row) the
quantum-floor prediction is 15.5 GB packed even after the SELL-sigma
sort (37.2 GB unsorted) — single-chip infeasible BY LAW, which is
exactly why the sharded path is load-bearing; this study is the
correctness grounding for that pointer at 47x the r3 size.

Run: ``python scripts/scale_sharded_study.py [--side 330] [--json PATH]``
(CPU; forces an 8-device virtual mesh if none present).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--side", type=int, default=330)
    p.add_argument("--json", default="data/scale_sharded_330.json")
    args = p.parse_args(argv)

    import os
    os.environ.setdefault(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from tpusparse.amg import smoothed_aggregation
    from tpusparse.testing import generators

    side = args.side
    t0 = time.perf_counter()
    c = generators.mesh_csr(side, side, seed=4)
    t_gen = time.perf_counter() - t0
    n = c.shape[0]
    print(f"FEM graph Laplacian: {n:,} nodes, {c.nnz:,} nnz "
          f"({t_gen:.1f}s)", file=sys.stderr)
    assert n >= 100_000, n

    mesh = Mesh(np.array(jax.devices()[:8]), ("n",))
    t0 = time.perf_counter()
    sh = smoothed_aggregation(c, dense_cutoff=2048, mesh=mesh)
    t_setup_sh = time.perf_counter() - t0
    levels = [(lev.n, lev.fmt) for lev in sh.levels]
    print(f"sharded setup {t_setup_sh:.1f}s; levels {levels}",
          file=sys.stderr)
    assert any(fmt == "rsell-shard" for _, fmt in levels), levels

    b = np.random.default_rng(1).uniform(-1, 1, n).astype(np.float32)

    # fine-level sharded SpMV vs the float64 oracle
    sp = c.to_scipy().astype(np.float64)
    t0 = time.perf_counter()
    y_sh = np.asarray(sh.levels[0].a.spmv(jnp.asarray(b)))
    t_spmv = time.perf_counter() - t0          # includes the compile
    y_ref = sp.T @ b.astype(np.float64)        # op convention: y = A^T v
    spmv_err = float(np.max(np.abs(y_sh - y_ref)))

    # one V-cycle application vs the unsharded hierarchy's
    t0 = time.perf_counter()
    h0 = smoothed_aggregation(c, dense_cutoff=2048)
    t_setup_un = time.perf_counter() - t0
    v_sh = np.asarray(sh(jnp.asarray(b)))
    v_un = np.asarray(h0(jnp.asarray(b)))
    scale = max(float(np.max(np.abs(v_un))), 1e-30)
    vcycle_rel = float(np.max(np.abs(v_sh - v_un))) / scale

    rec = dict(
        n=int(n), nnz=int(c.nnz), devices=8,
        levels=[(int(a), f) for a, f in levels],
        theta_resolved=float(sh.theta),
        setup_sharded_s=round(t_setup_sh, 1),
        setup_unsharded_s=round(t_setup_un, 1),
        spmv_err_vs_f64=float(f"{spmv_err:.3e}"),
        spmv_first_call_s=round(t_spmv, 1),
        vcycle_rel_err_vs_unsharded=float(f"{vcycle_rel:.3e}"),
        op_complexity=round(sh.operator_complexity, 3),
    )
    assert spmv_err <= 1e-3, rec               # the library tolerance
    assert vcycle_rel <= 1e-4, rec   # same aggregates; carriers (and so
    # fp32 reduction orders) differ between the sharded and unsharded builds
    with open(args.json, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
