"""Per-row floor laws for the gallery's sub-0.7-roofline rows (VERDICT r3
item 3): for each routed format, compute the two measured hardware floors
and show where the measured time sits between them.

- bytes floor: streamed MB / 819 GB/s (the roofline the %% column uses);
- gather floor: slot formats decode via VPU dynamic lane-gathers at the
  measured ~205 elements/cycle (BENCH.md §floors) at ~940 MHz — slots =
  streamed bytes / 5 (4 B value + 1 B in-window index per slot element),
  PADDING INCLUDED (padded slots are gathered all the same). TCSR rows
  use the same 5 B/slot estimate (dense tiles are gather-free but cost
  4 B/elem of extra traffic instead — the floor is then a mild
  overestimate, stated as such);
- launch floor: operators under ~0.5 MB measure 1-15 us regardless of
  bytes (grid setup + DMA issue + tunnel-visible latency) — the bytes
  roofline is not a meaningful metric there.

A gather-carried row is AT its floor when measured ~ [max, sum] of the
two floors (perfect vs zero overlap of the decode with the streams).

Usage: python scripts/gallery_floors.py [BENCH_gallery.json] [--md]
"""

from __future__ import annotations

import json
import sys

BW = 819e9            # v5e HBM speed-of-light, B/s
GATHER = 205 * 0.94e9  # slot elements decoded per second (BENCH.md §floors)
GATHER_FMTS = {"rsell", "sell", "binned", "tcsr"}
LAUNCH_MB = 0.5


def floors(rec: dict) -> dict | None:
    routed = rec["routed"]
    row = rec["rows"].get(routed)
    if not row:
        return None
    mb, us = row["mb"], row["us"]
    b = rec.get("batch", 1)
    out = dict(workload=rec["workload"], batch=b, routed=routed,
               us=us, mb=mb, roofline=row.get("roofline"))
    out["bytes_us"] = mb * 1e6 / BW * 1e6
    if mb < LAUNCH_MB:
        out["law"] = "launch"
        return out
    # TCSR's tier model stores every tile DENSE at expect_batch >= 8
    # (gather work scales with B, dense-tile MXU work doesn't — the same
    # law that routes batched SpMM away from gather formats), so batched
    # tcsr rows are bytes-law rows.
    if routed in GATHER_FMTS and not (routed == "tcsr" and b > 1):
        slots = mb * 1e6 / 5.0
        # batched gather kernels decode per (slot, column): B x the work
        out["gather_us"] = slots / GATHER * 1e6 * b
        out["floor_lo"] = max(out["bytes_us"], out["gather_us"])
        out["floor_hi"] = out["bytes_us"] + out["gather_us"]
        out["law"] = "gather"
    else:
        out["law"] = "bytes"
    return out


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    md = "--md" in argv
    if md:
        argv.remove("--md")
    path = argv[0] if argv else "BENCH_gallery.json"
    recs = json.load(open(path))
    rows = [f for f in (floors(r) for r in recs) if f]
    rows.sort(key=lambda r: (r["workload"], r["batch"]))
    if md:
        print("| workload | routed | us | MB | roofline | bytes-floor us |"
              " gather-floor us | floor band us | verdict |")
        print("|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        if r["law"] == "launch":
            band, verdict = "-", "launch floor (<0.5 MB)"
            gus = "-"
        elif r["law"] == "gather":
            lo, hi = r["floor_lo"], r["floor_hi"]
            band = f"[{lo:.1f}, {hi:.1f}]"
            gus = f"{r['gather_us']:.1f}"
            if r["us"] <= hi * 1.15:
                verdict = "at combined floor"
            else:
                verdict = f"{r['us']/hi:.2f}x above floor band"
        else:
            band = f"[{r['bytes_us']:.1f}, -]"
            gus = "-"
            verdict = ("near bytes floor" if r["us"] <= r["bytes_us"] / 0.7
                       else f"{r['us']/r['bytes_us']:.2f}x bytes floor")
        name = r["workload"] + (f" (B={r['batch']})" if r["batch"] != 1
                                else "")
        if md:
            print(f"| {name} | {r['routed']} | {r['us']} | {r['mb']} | "
                  f"{r['roofline']} | {r['bytes_us']:.1f} | {gus} | "
                  f"{band} | {verdict} |")
        else:
            print(f"{name:28s} {r['routed']:7s} us={r['us']:8.1f} "
                  f"bytesfloor={r['bytes_us']:7.1f} gather={gus:>7s} "
                  f"band={band:>16s}  {verdict}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
