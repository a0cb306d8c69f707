"""The 262144^2 quantum-floor cliff config, sharded (VERDICT r4 item 4).

BENCH_scale.json records the cliff: the default GB-scale config (262144^2
powerlaw d=2e-3, 57.3 M nnz) touches 99.2% of its 4.19 M 128^2 tiles, so
every slot format floors at ~5120 B per touched tile — 15.5 GB predicted,
past the single-chip operand budget, and the scale bench records the law
instead of OOMing, pointing at the multi-chip partitions. This study
PROVES that pointer: the same generator config packed as contiguous
ragged-SELL column shards (`rsell_shard_pack(..., 'contiguous')` — at
262k columns the demand-sort unpermute plan's one-hot masks would be
O(n^2/128) = 512 GB, so the AMG carrier mode is the only viable one)
over the 8-device virtual CPU mesh:

- per-device bytes ~ predicted/D (the sharding defeats the cliff law);
- sharded SpMV correct vs the float64 scipy oracle (interpret-mode
  Pallas on the CPU mesh — same kernels, same shard_map as hardware).

Record: data/scale_cliff_sharded.json. Run (CPU, ~30-60 min, ~40 GB RAM):
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  PYTHONPATH=/root/repo python scripts/scale_cliff_sharded_study.py
"""

from __future__ import annotations

import json
import time

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np               # noqa: E402


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=262144)
    p.add_argument("--density", type=float, default=2e-3)
    p.add_argument("--out", default="data/scale_cliff_sharded.json")
    args = p.parse_args(argv)

    from tpusparse.formats.auto import matrix_stats_csr, predicted_bytes, \
        route                     # noqa: E402
    from tpusparse.formats.rsell import rsell_shard_pack  # noqa: E402
    from tpusparse.parallel import make_mesh              # noqa: E402
    from tpusparse.parallel.sparse import rsell_spmm_sharded  # noqa: E402
    from tpusparse.testing import generators              # noqa: E402

    if len(jax.devices()) < 8:
        raise SystemExit("need XLA_FLAGS=--xla_force_host_platform_"
                         "device_count=8")

    m, density, seed, d = args.m, args.density, 42, 8
    rec = {"m": m, "density": density, "devices": d}
    t0 = time.perf_counter()
    csr = generators.random_sparse_csr(m, m, density, seed=seed,
                                       distribution="powerlaw")
    rec["nnz"] = int(csr.nnz)
    rec["gen_s"] = round(time.perf_counter() - t0, 1)
    print(f"gen {csr.nnz:,} nnz in {rec['gen_s']}s", flush=True)

    t0 = time.perf_counter()
    stats = matrix_stats_csr(csr)
    routed = route(m, m, stats)
    pred = predicted_bytes(m, m, stats, routed, csr=csr)
    rec["routed"] = routed
    rec["predicted_gb"] = round(pred / 1e9, 2)
    rec["stats_s"] = round(time.perf_counter() - t0, 1)
    print(f"routed {routed}, predicted {pred/1e9:.2f} GB "
          f"(cliff: > single-chip operand budget)", flush=True)

    t0 = time.perf_counter()
    sh = rsell_shard_pack(csr, d, assignment="contiguous")
    rec["pack_s"] = round(time.perf_counter() - t0, 1)
    per_dev = [int(c) * 8 * 128 * 5 for c in np.asarray(sh.counts)]
    rec["chunks_per_shard"] = [int(c) for c in np.asarray(sh.counts)]
    rec["gb_per_shard"] = [round(b / 1e9, 3) for b in per_dev]
    rec["gb_per_shard_max"] = round(max(per_dev) / 1e9, 3)
    rec["pred_over_d_gb"] = round(pred / d / 1e9, 3)
    rec["balance"] = round(max(per_dev) / (sum(per_dev) / d), 3)
    print(f"packed {rec['pack_s']}s; per-shard GB {rec['gb_per_shard']} "
          f"(max {rec['gb_per_shard_max']} vs pred/D "
          f"{rec['pred_over_d_gb']}, balance {rec['balance']})", flush=True)

    mesh = make_mesh({"n": d})
    x = generators.random_sparse_vector(m, density=0.5, seed=7)
    t0 = time.perf_counter()
    y = np.asarray(rsell_spmm_sharded(sh, x, mesh), np.float64)
    rec["spmv_wall_s"] = round(time.perf_counter() - t0, 1)
    print(f"sharded spmv (interpret) {rec['spmv_wall_s']}s", flush=True)

    # float64 oracle straight from the CSR triplets: the stored structure
    # is CSR of A.T (formats/csr.py), so stored rows index y of y = x @ A
    yd = np.zeros(m, np.float64)
    rows = np.repeat(np.arange(m), csr.row_nnz)
    np.add.at(yd, rows,
              csr.values.astype(np.float64)
              * x.astype(np.float64)[csr.col_idx])
    err = float(np.max(np.abs(y[:m] - yd)))
    scale_ref = float(np.max(np.abs(yd))) or 1.0
    rec["max_abs_err"] = err
    rec["rel_err"] = err / scale_ref
    print(f"max|err| {err:.3e} (rel {rec['rel_err']:.3e})", flush=True)
    assert err <= 1e-3 * max(1.0, scale_ref), err

    from tpusparse.bench.runner import run_id
    rec["run"] = run_id()
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print("recorded " + args.out, flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
