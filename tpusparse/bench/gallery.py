"""Real-topology workload gallery + router-regret benchmark.

The round-2 verdict's top finding: every routing threshold (the d=0.65
crossover, the DIA 0.4-fill rule, the RSELL skew rule) was calibrated on
4 i.i.d. synthetic generators — exactly the masks real topologies violate.
This module runs EVERY competitive format plus the ``auto_format`` router
on a gallery of offline-reproducible realistic workloads (R-MAT graphs,
Delaunay FEM meshes, 3D stencils, anisotropic diffusion, bands with
defects, N:M / block-pruned weights) and records, per workload:

- each format's measured device time (slope method, real chip),
- which format the router picked,
- the regret: routed time vs the best measured format.

Results append to a JSON file (one record per (workload, batch), stamped
with a run id) so long runs chunk across timeouts; ``render`` turns the
JSON into the BENCH.md §gallery table. The reference has nothing like
this — its data layer is one unseeded i.i.d. distribution
(tester.cpp:103-121); the gallery is the routing layer earning trust on
matrices the library's own generators didn't tune for.

Excluded rows, on purpose (documented non-competitive everywhere):
``ell_xla`` (correctness cross-check path, ~1000x off roofline by design)
and ``bell_pallas`` (bitmap format measured VPU-bound at 15% roofline,
demoted to design notes in r1).

Run: ``python -m tpusparse.bench.gallery --workloads rmat-s13-ef16 ...``
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Any, Callable

import numpy as np

from tpusparse.bench.roofline import format_bytes, roofline_fraction
from tpusparse.bench.runner import device_time
from tpusparse.testing import generators

_DENSE_CAP_BYTES = 320 << 20   # upload budget for dense baselines (~2 min
                               # over the ~MB/s axon tunnel at 8192^2 fp32)


def run_id() -> str:
    from tpusparse.bench.runner import run_id as _rid

    return _rid()


# --------------------------------------------------------------------------
# Workloads: name -> builder() -> (A, note). A is CsrMatrix (never
# densified) or a dense ndarray for the weight-pruning families.
# --------------------------------------------------------------------------

def _w(builder: Callable[[], Any], note: str) -> dict[str, Any]:
    return dict(build=builder, note=note)


WORKLOADS: dict[str, dict[str, Any]] = {
    # graphs: hubs + locality (Graph500 R-MAT parameters)
    "rmat-s13-ef16": _w(lambda: generators.rmat_csr(13, 16, seed=1),
                        "8192^2 R-MAT graph, ~128k edges: hub columns drive "
                        "global SELL width, the skew-router case"),
    "rmat-s13-ef64": _w(lambda: generators.rmat_csr(13, 64, seed=2),
                        "denser 8192^2 R-MAT (~500k edges)"),
    "rmat-s12-sym": _w(lambda: generators.rmat_csr(12, 24, seed=3,
                                                   symmetric=True),
                       "4096^2 symmetrized R-MAT (undirected graph)"),
    # FEM / mesh
    "mesh2d-96": _w(lambda: generators.mesh_csr(96, 96, seed=4),
                    "9216-node Delaunay FEM graph Laplacian (deg 4-9)"),
    "mesh2d-256": _w(lambda: generators.mesh_csr(256, 256, seed=5),
                     "65536-node Delaunay FEM graph Laplacian"),
    # lattice stencils (the DIA cases)
    "stencil3d-7pt-48": _w(lambda: generators.stencil_csr((48, 48, 48)),
                           "110592-unknown 3D 7-point Poisson"),
    "stencil3d-27pt-32": _w(lambda: generators.stencil_csr((32, 32, 32),
                                                           points=27),
                            "32768-unknown 3D 27-point (wide-band DIA)"),
    "aniso2d-eps100": _w(lambda: generators.stencil_csr((512, 512),
                                                        eps=100.0,
                                                        eps_axis=1),
                         "262144-unknown anisotropic diffusion, eps=100"),
    "stencil2d-64": _w(lambda: generators.stencil_csr((64, 64)),
                       "4096-unknown 2D 5-point Poisson: the one stencil "
                       "small enough for a measured dense baseline — the "
                       "direct DIA-vs-dense row (incl. batched SpMM)"),
    # perturbed banded (must NOT route to pure DIA)
    "banded-defects-8192": _w(
        lambda: generators.banded_defects_csr(8192, bandwidth=32,
                                              defect_density=1e-3, seed=6),
        "8192^2, 65-diagonal band + 0.1% long-range defects: defects spray "
        "O(n) diagonals at negligible nnz"),
    # pruned-weight families (dense ndarrays)
    "nm-2of4-4096": _w(lambda: generators.nm_pruned_matrix(4096, 4096,
                                                           2, 4, seed=7),
                       "4096^2 2:4 semi-structured pruned weights (d=0.5)"),
    "nm-1of4-4096": _w(lambda: generators.nm_pruned_matrix(4096, 4096,
                                                           1, 4, seed=8),
                       "4096^2 1:4 pruned weights (d=0.25)"),
    "blockpruned-4096": _w(
        lambda: generators.block_pruned_matrix(4096, 4096, block=128,
                                               keep_frac=0.3, fill=0.5,
                                               seed=9),
        "4096^2 block-pruned: 30% of 128^2 tiles kept at 50% fill"),
}


# --------------------------------------------------------------------------
# Format candidates
# --------------------------------------------------------------------------

def _fmt_run(f, x):
    return f.spmv(x) if x.ndim == 1 else f.spmm(x)


def _plan_run(f, x):
    plan = f._full_plan()
    return f.spmv(x, plan=plan) if x.ndim == 1 else f.spmm(x, plan=plan)


def candidates(csr, stats: dict[str, Any], *, batch: int = 1,
               dense_cap: int = _DENSE_CAP_BYTES) -> list[dict[str, Any]]:
    """Applicable (name, prepare, run) entries for one workload. Gates keep
    the gallery physical: DIA only when the diagonal count is storable,
    dense/ASP only when the dense array fits the upload budget, SELL only
    when hub columns don't blow its global-width padding past 6x the
    best nnz-proportional format (it would measure minutes, not compete)."""
    from tpusparse.formats.binned import BinnedSellMatrix
    from tpusparse.formats.bsr import BsrMatrix
    from tpusparse.formats.rsell import RsellMatrix
    from tpusparse.formats.sell import SellMatrix
    from tpusparse.formats.tcsr import TcsrMatrix
    from tpusparse.kernels.dense import dense_xla

    m, n = csr.shape
    dense_bytes = m * n * 4
    out: list[dict[str, Any]] = []
    if dense_bytes <= dense_cap:
        out.append(dict(name="dense_xla",
                        prepare=lambda c: np.ascontiguousarray(c.to_dense()),
                        run=lambda f, x: dense_xla(f, x)))
    # flat SELL pads every column to the global width; a hub column of
    # degree ~n makes that bytes-catastrophic, not just slow
    from tpusparse.utils import round_up
    est_sell = (-(-n // 128)) * (-(-m // 128)) * \
        round_up(max(stats["w_global"], 8), 8) * 128 * 5
    if est_sell <= 6 * max(5 * stats["nnz"], 1 << 20):
        out.append(dict(name="sell",
                        prepare=lambda c: SellMatrix.from_csr(c),
                        run=_fmt_run))
    out.append(dict(name="binned",
                    prepare=lambda c: BinnedSellMatrix.from_csr(c),
                    run=_fmt_run))
    out.append(dict(name="rsell",
                    prepare=lambda c: RsellMatrix.from_csr(c),
                    run=_fmt_run))
    out.append(dict(name="tcsr",
                    prepare=lambda c: TcsrMatrix.from_csr(
                        c, expect_batch=batch),
                    run=_fmt_run))
    out.append(dict(name="bsr",
                    prepare=lambda c: BsrMatrix.from_csr(c),
                    run=_fmt_run))
    if 0 < stats["n_diags"] <= 512:
        from tpusparse.formats.dia import DiaMatrix

        out.append(dict(name="dia",
                        prepare=lambda c: DiaMatrix.from_csr(c),
                        run=_fmt_run))
    if dense_bytes <= dense_cap and stats["density"] > 0.15:
        from tpusparse.kernels.asp_spmv import AspMatrix

        out.append(dict(name="asp",
                        prepare=lambda c: AspMatrix.from_csr(c),
                        run=_plan_run))
    return out


def route_name(csr, stats: dict[str, Any], batch: int = 1) -> str:
    """What ``auto_format`` would pick, WITHOUT packing it."""
    from tpusparse.formats.auto import route

    m, n = csr.shape
    return route(m, n, stats, expect_batch=batch)


# --------------------------------------------------------------------------
# Measurement + persistence
# --------------------------------------------------------------------------

def run_workload(name: str, *, batch: int = 1, json_path: str | None = None,
                 stamp: str | None = None, verbose: bool = True,
                 x_seed: int = 0, trials: int = 1) -> dict[str, Any]:
    """Measure every applicable format on one gallery workload; append the
    record to ``json_path``. X is dense (serving-style activations).

    ``trials``: independent slope-method measurements per format; the
    recorded ``us`` is the MEDIAN and ``us_min``/``us_max``/``spread_pct``
    record the trial spread, so no router-regret verdict rests on a single
    trial of a sub-30 us kernel under the chip's ±10-20% contention jitter
    (VERDICT r3 weak #4). The roofline denominator counts the format's
    streamed bytes PLUS the X-read/Y-write traffic — negligible on dense-ish
    4096^2 packs but the SAME magnitude as the diagonals on banded/stencil
    operators, where counting format bytes alone understated the fraction
    by ~2x (VERDICT r3 weak #3)."""
    from tpusparse.formats.csr import CsrMatrix
    from tpusparse.formats.auto import matrix_stats_csr

    spec = WORKLOADS[name]
    a = spec["build"]()
    if not isinstance(a, CsrMatrix):
        a = CsrMatrix.from_dense(np.asarray(a))
    stats = matrix_stats_csr(a)
    m, n = a.shape
    rng = np.random.default_rng(x_seed ^ 0xA11)
    x = rng.uniform(-1.0, 1.0, size=(batch, m)).astype(np.float32)
    if batch == 1:
        x = x[0]
    io_bytes = batch * (m + n) * 4          # X read + Y write per call
    routed = route_name(a, stats, batch)
    rows: dict[str, dict[str, Any]] = {}
    for e in candidates(a, stats, batch=batch):
        t0 = time.perf_counter()
        fmt = e["prepare"](a)
        pack_s = time.perf_counter() - t0
        nbytes = format_bytes(fmt)
        if nbytes > 1.8e9:
            # bytes-catastrophic pack (e.g. flat/binned SELL window padding
            # on a stencil): it cannot win — 1.8 GB at roofline is ~2.2 ms
            # against nnz-proportional formats at ~10 us — and its replica
            # pool would not fit HBM. Record the disqualification.
            rows[e["name"]] = dict(us=None, mb=round(nbytes / 1e6, 1),
                                   roofline=None,
                                   pack_s=round(pack_s, 2),
                                   skipped="bytes")
            if verbose:
                print(f"  {name}/{e['name']}: SKIPPED "
                      f"({nbytes/1e9:.1f} GB pack)", file=sys.stderr)
            del fmt
            continue
        step_bytes = nbytes + io_bytes
        secs = []
        for _ in range(max(1, trials)):
            r = device_time(e["run"], fmt, x, name=f"{name}/{e['name']}",
                            bytes_moved=step_bytes, nnz=a.nnz)
            if roofline_fraction(step_bytes, r.seconds) > 2.0:
                # unphysical (>2x spec HBM BW): the small-span slope
                # artifact (BENCH.md metrology note) — remeasure once with
                # a 2x longer chain; keep whichever is physical
                r2 = device_time(e["run"], fmt, x,
                                 name=f"{name}/{e['name']}",
                                 bytes_moved=step_bytes, nnz=a.nnz,
                                 k2=1152, estimator="median")
                if r2.seconds > r.seconds:
                    r = r2
            secs.append(r.seconds)
            if verbose:
                print(f"  {r} | pack {pack_s:.1f}s", file=sys.stderr)
        med = float(np.median(secs))
        frac = roofline_fraction(step_bytes, med)
        row = dict(us=round(med * 1e6, 1),
                   mb=round(nbytes / 1e6, 1),
                   io_mb=round(io_bytes / 1e6, 2),
                   roofline=round(frac, 3),
                   pack_s=round(pack_s, 2))
        if len(secs) > 1:
            row["trials"] = len(secs)
            row["us_min"] = round(min(secs) * 1e6, 1)
            row["us_max"] = round(max(secs) * 1e6, 1)
            row["spread_pct"] = round(
                100 * (max(secs) - min(secs)) / med, 1)
        if frac > 1.0:
            # physically impossible reading — stamp it as the documented
            # slope/jitter artifact IN the record, not just in prose.
            # slope_artifact is the canonical boolean verify_docs checks;
            # "artifact" carries the human note
            row["slope_artifact"] = True
            row["artifact"] = "slope-jitter (>1.0 roofline is unphysical)"
        rows[e["name"]] = row
        del fmt
    timed = {k: v for k, v in rows.items() if v["us"] is not None}
    best = min(timed, key=lambda k: timed[k]["us"])
    # 0.1 us floor: a clamped/unphysical row must not zero the denominator
    regret = timed[routed]["us"] / max(timed[best]["us"], 0.1) - 1.0 \
        if routed in timed else float("nan")
    rec = dict(run=stamp or run_id(), workload=name, batch=batch,
               m=m, n=n, nnz=a.nnz, density=round(stats["density"], 6),
               note=spec["note"], routed=routed, best=best,
               regret_pct=round(100 * regret, 1), rows=rows)
    if json_path:
        _append(json_path, rec)
    if verbose:
        print(f"{name} B={batch}: routed={routed} best={best} "
              f"regret={rec['regret_pct']}%", file=sys.stderr)
    return rec


def _append(path: str, rec: dict[str, Any]) -> None:
    recs = load(path)
    # replace an earlier record of the same (workload, batch): reruns win
    recs = [r for r in recs
            if (r["workload"], r["batch"]) != (rec["workload"], rec["batch"])]
    recs.append(rec)
    with open(path, "w") as f:
        json.dump(recs, f, indent=1)


def load(path: str) -> list[dict[str, Any]]:
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return json.load(f)


def render(json_path: str, out=sys.stdout) -> None:
    """BENCH.md §gallery markdown from the accumulated records."""
    recs = load(json_path)
    if not recs:
        print("(no gallery records yet)", file=out)
        return
    runs = sorted({r["run"] for r in recs})
    print(f"(runs: {', '.join(runs)})\n", file=out)
    print("| workload | nnz | d | routed | best | regret | routed us | "
          "best us | dense us |", file=out)
    print("|---|---|---|---|---|---|---|---|---|", file=out)
    for r in sorted(recs, key=lambda r: (r["workload"], r["batch"])):
        rows = r["rows"]
        dense = rows.get("dense_xla", {}).get("us")
        routed_us = rows.get(r["routed"], {}).get("us", float("nan"))
        wl = r["workload"] + (f" (B={r['batch']})" if r["batch"] != 1 else "")
        print(f"| {wl} | {r['nnz']:,} | {r['density']:.2g} | {r['routed']} "
              f"| {r['best']} | {r['regret_pct']}% | {routed_us} | "
              f"{rows[r['best']]['us']} | {dense if dense else '-'} |",
              file=out)
    bad = [r for r in recs if r["regret_pct"] > 10.0]
    n = len(recs)
    print(f"\nRouter regret <= 10% on {n - len(bad)}/{n} workloads."
          + (" Misroutes: " + ", ".join(
              f"{r['workload']} ({r['routed']} vs {r['best']}, "
              f"+{r['regret_pct']}%)" for r in bad) if bad else ""),
          file=out)


def main(argv: list[str] | None = None) -> int:
    import argparse

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--workloads", default="all",
                   help="comma list or 'all' (see --list)")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--trials", type=int, default=1,
                   help="slope-method measurements per format; the "
                        "recorded us is the median (>=5 for sub-30 us "
                        "rows per the measurement protocol)")
    p.add_argument("--json", default="BENCH_gallery.json")
    p.add_argument("--list", action="store_true")
    p.add_argument("--render", action="store_true",
                   help="print the markdown table from --json and exit")
    args = p.parse_args(argv)
    if args.list:
        for k, v in WORKLOADS.items():
            print(f"{k:24s} {v['note']}")
        return 0
    if args.render:
        render(args.json)
        return 0
    names = list(WORKLOADS) if args.workloads == "all" \
        else args.workloads.split(",")
    stamp = run_id()
    for name in names:
        run_workload(name, batch=args.batch, json_path=args.json,
                     stamp=stamp, trials=args.trials)
    render(args.json)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
