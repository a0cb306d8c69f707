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

- per-device bytes ~ unsorted-floor/D (the sharding defeats the cliff);
- the 262144^2 shard pack verified against the float64 oracle by a
  VECTORIZED NUMPY DECODE of every shard's chunk stream (np.nonzero over
  the 37 GB of slot arrays + one np.add.at) — running the Pallas
  interpret path at this size is infeasible: the 8-device shard_map
  both duplicates the pack per CPU "device" AND traces one jaxpr
  equation per chunk x op (the first attempt was OOM-killed at 124 GB
  RSS, r5); the decode validates the pack/assignment layer exactly,
  while the kernel/mesh layer is validated end-to-end at the largest
  interpret-feasible size in the same quantum-floor regime (--mesh-m,
  default 16384^2, same d) as a second record row.

Record: data/scale_cliff_sharded.json. Run (CPU, ~40-60 min, ~50 GB RAM):
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
    p.add_argument("--mesh-m", type=int, default=16384,
                   help="size for the end-to-end interpret mesh run "
                        "(0 = skip)")
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
    # the routed prediction prices the SORTED pack; 'contiguous' shards
    # skip the demand sort (no n-scale unpermute plan), so the honest
    # per-shard comparison target is the UNSORTED slot-tile floor
    pred_unsorted = int(stats.get("slot_tile_bytes") or pred)
    rec["routed"] = routed
    rec["predicted_gb"] = round(pred / 1e9, 2)
    rec["predicted_unsorted_gb"] = round(pred_unsorted / 1e9, 2)
    rec["stats_s"] = round(time.perf_counter() - t0, 1)
    print(f"routed {routed}, predicted {pred/1e9:.2f} GB sorted / "
          f"{pred_unsorted/1e9:.2f} GB unsorted "
          f"(cliff: > single-chip operand budget)", flush=True)

    t0 = time.perf_counter()
    sh = rsell_shard_pack(csr, d, assignment="contiguous")
    rec["pack_s"] = round(time.perf_counter() - t0, 1)
    per_dev = [int(c) * 8 * 128 * 5 for c in np.asarray(sh.counts)]
    rec["chunks_per_shard"] = [int(c) for c in np.asarray(sh.counts)]
    rec["gb_per_shard"] = [round(b / 1e9, 3) for b in per_dev]
    rec["gb_per_shard_max"] = round(max(per_dev) / 1e9, 3)
    rec["pred_over_d_gb"] = round(pred_unsorted / d / 1e9, 3)
    rec["balance"] = round(max(per_dev) / (sum(per_dev) / d), 3)
    print(f"packed {rec['pack_s']}s; per-shard GB {rec['gb_per_shard']} "
          f"(max {rec['gb_per_shard_max']} vs pred/D "
          f"{rec['pred_over_d_gb']}, balance {rec['balance']})", flush=True)

    # vectorized numpy decode of every shard's chunk stream (float64):
    # y[shard_col_base + cj*128 + lane] += val * x[ct*128 + idx]
    x = generators.random_sparse_vector(m, density=0.5, seed=7)
    x64 = np.zeros(sh.padded[0], np.float64)
    x64[:m] = x.astype(np.float64)
    nb_loc = sh.group_map.shape[1]
    cps = nb_loc * 128
    t0 = time.perf_counter()
    y = np.zeros(d * cps, np.float64)
    for dev in range(d):
        vals_d = np.asarray(sh.vals[dev])
        k, s, lane = np.nonzero(vals_d)
        cjk = np.asarray(sh.cj[dev])[k].astype(np.int64)
        ctk = np.asarray(sh.ct[dev])[k].astype(np.int64)
        src = x64[ctk * 128 + np.asarray(sh.idx[dev])[k, s, lane]]
        np.add.at(y, dev * cps + cjk * 128 + lane,
                  vals_d[k, s, lane].astype(np.float64) * src)
        del vals_d, k, s, lane, cjk, ctk, src
    rec["decode_wall_s"] = round(time.perf_counter() - t0, 1)
    print(f"numpy shard decode {rec['decode_wall_s']}s", flush=True)

    # float64 oracle straight from the CSR triplets: the stored structure
    # is CSR of A.T (formats/csr.py), so stored rows index y of y = x @ A
    yd = np.zeros(m, np.float64)
    rows = np.repeat(np.arange(m), csr.row_nnz)
    np.add.at(yd, rows,
              csr.values.astype(np.float64)
              * x.astype(np.float64)[csr.col_idx])
    err = float(np.max(np.abs(y[:m] - yd)))
    scale_ref = float(np.max(np.abs(yd))) or 1.0
    rec["pack_decode_max_abs_err"] = err
    rec["pack_decode_rel_err"] = err / scale_ref
    print(f"pack-decode max|err| {err:.3e} (rel "
          f"{rec['pack_decode_rel_err']:.3e})", flush=True)
    assert err <= 1e-6 * max(1.0, scale_ref), err   # float64 decode
    del csr, sh, y, yd, x64

    from tpusparse.bench.runner import run_id
    rec["run"] = run_id()
    recs = [rec]

    if args.mesh_m:
        # end-to-end interpret mesh execution, same regime, feasible size
        m2 = args.mesh_m
        csr2 = generators.random_sparse_csr(m2, m2, density, seed=seed,
                                            distribution="powerlaw")
        sh2 = rsell_shard_pack(csr2, d, assignment="contiguous")
        mesh = make_mesh({"n": d})
        x2 = generators.random_sparse_vector(m2, density=0.5, seed=7)
        t0 = time.perf_counter()
        y2 = np.asarray(rsell_spmm_sharded(sh2, x2, mesh), np.float64)
        wall = round(time.perf_counter() - t0, 1)
        yd2 = np.zeros(m2, np.float64)
        rows2 = np.repeat(np.arange(m2), csr2.row_nnz)
        np.add.at(yd2, rows2, csr2.values.astype(np.float64)
                  * x2.astype(np.float64)[csr2.col_idx])
        err2 = float(np.max(np.abs(y2[:m2] - yd2)))
        sref2 = float(np.max(np.abs(yd2))) or 1.0
        rec2 = {"m": m2, "density": density, "devices": d,
                "nnz": int(csr2.nnz), "kind": "mesh_interpret",
                "spmv_wall_s": wall, "max_abs_err": err2,
                "rel_err": err2 / sref2, "run": run_id()}
        print(f"mesh interpret {m2}^2: wall {wall}s, max|err| "
              f"{err2:.3e}", flush=True)
        assert err2 <= 1e-3 * max(1.0, sref2), err2
        recs.append(rec2)

    with open(args.out, "w") as f:
        json.dump(recs, f, indent=1)
    print("recorded " + args.out, flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
