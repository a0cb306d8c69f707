"""Regenerate BENCH.md §gallery's regret table from BENCH_gallery.json.

The doc table is a VIEW of the record: regenerating it mechanically
(instead of hand-editing 21 rows after each re-measure) keeps the prose
incapable of drifting from the artifact — the failure class VERDICT
r3/r4 flagged. Rows sort by (workload, batch); the dense column shows
dense_xla when measured, '-' where the gallery gated it out.

Usage: python scripts/gallery_table.py [BENCH_gallery.json]
"""

from __future__ import annotations

import json
import sys


def fmt_us(v):
    return "-" if v is None else f"{v:.1f}"


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    path = argv[0] if argv else "BENCH_gallery.json"
    recs = json.load(open(path))
    recs.sort(key=lambda r: (r["workload"], r.get("batch", 1)))
    print("| workload | nnz | d | routed | best | regret | routed us |"
          " best us | dense us | trials |")
    print("|---|---|---|---|---|---|---|---|---|---|")
    for r in recs:
        b = r.get("batch", 1)
        name = r["workload"] + (f" (B={b})" if b != 1 else "")
        rows = r["rows"]
        routed = rows.get(r["routed"], {})
        best = rows.get(r["best"], {})
        dense = rows.get("dense_xla", {})
        regret = r.get("regret_pct", 0.0)
        trials = routed.get("trials") or 1
        print(f"| {name} | {r['nnz']:,} | {r['density']:.2g} "
              f"| {r['routed']} | {r['best']} | {regret:.1f}% "
              f"| {fmt_us(routed.get('us'))} | {fmt_us(best.get('us'))} "
              f"| {fmt_us(dense.get('us'))} | {trials} |")
    n_ok = sum(1 for r in recs if r.get("regret_pct", 0) <= 10.0)
    print(f"\nRegret <= 10% on {n_ok}/{len(recs)} (workload, batch) rows.")
    singles = [f"{r['workload']} B={r.get('batch',1)}" for r in recs
               if (r['rows'].get(r['routed'], {}).get('trials') or 1) < 2]
    if singles:
        print(f"Single-trial routed rows remaining: {', '.join(singles)}.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
