"""Step-geometry selection: bytes-targeting heuristic + on-device autotuner.

The reference ships hand-tuned kernel *variants* (wsp v0/v1, asp v0/1/2,
awsp v0/1/2 — each a different unroll/pipeline choice, selected by hand in
tester.cpp's registry). On TPU the analogous knob is the Pallas *step
geometry*: how many (window, column-group) tiles each grid step DMAs. The
measured model (BENCH.md, CLAUDE.md):

- each grid step pays ~0.2-0.5 us of DMA-issue overhead, so per-step blocks
  should carry >= ~1-2 MB;
- scoped VMEM is 16 MB/kernel and blocks are double-buffered, so the
  working set per step must stay well under half of that;
- contiguous window runs beat wider column fan-out at equal bytes (the r2
  retune: 64x1 = 74.5 us vs 16x4 = 77.6 us on the canonical workload).

``sell_geometry`` encodes those three rules as a shape-aware default (it
reproduces the measured-best 64x1 choice on the canonical 4096^2/d=0.5
workload and scales the step up when the format is narrow, e.g. low
density). ``autotune_sell`` refines it by measurement on the live device —
the slope-method runner (bench/runner.py) makes this safe over the async
axon tunnel — and caches the winner per (shape, w, dtype, batch) so the
sweep runs once per process.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import numpy as np

_LANES = 128
_SUB = 8

# Per-step byte targets for the vals+idx block stream (measured: steps below
# ~1 MB leave the ~0.26 us/step issue overhead visible; above ~6 MB the
# double-buffered working set crowds the 16 MB scoped VMEM).
_STEP_BYTES_LO = 1 << 20
_STEP_BYTES_HI = 6 << 20


def sell_geometry(nt: int, nb: int, w: int, *, itemsize: int = 4,
                  batch: int = 1) -> tuple[int, int]:
    """Shape-aware (windows_per_step, col_groups_per_step) for the SELL
    kernel. Pure function of the packed layout — no measurement.

    Strategy: grow the contiguous window run first (cheapest bytes — the
    x block is shared across column groups but windows stream new vals),
    capped by the VMEM budget; widen column groups only if the step is
    still under the DMA-amortization floor.
    """
    per_wg = w * _LANES * (itemsize + 1)          # vals + int8 idx, 1 win x 1 grp
    # VMEM for one step, double-buffered by Mosaic: 2x (vals+idx block +
    # x block) + out block. Keep the step's streamed block under the HI
    # target and the whole working set (which scales with batch through the
    # x and out blocks) under ~12 MB of the 16 MB scoped-VMEM default.
    tw = _snap(max(1, min(nt, _STEP_BYTES_HI // max(per_wg, 1))), nt)
    while tw > 1 and _step_vmem(tw, 1, w, itemsize, batch) > 12 << 20:
        tw = _snap(tw - 1, nt)
    jb = 1
    while (jb < nb and tw * jb * per_wg < _STEP_BYTES_LO
           and _step_vmem(tw, jb + 1, w, itemsize, batch) <= 12 << 20):
        jb += 1
    return tw, _snap(jb, nb)


def blocks_per_step(unit_bytes: int, count: int, cap: int,
                    target: int = _STEP_BYTES_LO) -> int:
    """Shared step-batching rule for the flat-block-list kernels (rsell
    chunks, bsell/bsr tiles) and AWSP's column fan-out: enough units per
    grid step to reach the ~1 MB DMA-amortization floor, capped
    (unrolled-body size / VMEM), snapped to a divisor of the padded unit
    count. The target is a FLOOR, so snapping prefers the smallest divisor
    >= want (a snap-down can drop the step back under the floor — e.g.
    want=3 on 32 column groups would give 2 and a 0.9 MB step); only when
    no divisor fits under the cap does it fall back to the largest below."""
    want = max(1, min(cap, -(-target // max(unit_bytes, 1))))
    up = [d for d in range(want, min(cap, count) + 1) if count % d == 0]
    return up[0] if up else _snap(want, count)


def _snap(req: int, limit: int) -> int:
    """Largest divisor of ``limit`` that is <= ``req`` — the effective value
    the kernel would use; returning it keeps the heuristic transparent."""
    return max(d for d in range(min(req, limit), 0, -1) if limit % d == 0)


def _step_vmem(tw: int, jb: int, w: int, itemsize: int, batch: int) -> int:
    """Double-buffered VMEM bytes for one SELL grid step."""
    block = jb * tw * w * _LANES * (itemsize + 1)
    xblk = batch * tw * _LANES * 4
    out = batch * _SUB * jb * _LANES * 4
    return 2 * (block + xblk) + out


@dataclasses.dataclass(frozen=True)
class TuneResult:
    geometry: tuple[int, int]                  # best (tw, jb)
    table: tuple[tuple[tuple[int, int], float], ...]  # ((tw, jb), seconds)

    def __str__(self) -> str:
        lines = [f"best: windows_per_step={self.geometry[0]} "
                 f"col_groups_per_step={self.geometry[1]}"]
        for (tw, jb), sec in self.table:
            mark = " <-- best" if (tw, jb) == self.geometry else ""
            lines.append(f"  {tw:>4} x {jb:<2} {sec * 1e6:8.1f} us{mark}")
        return "\n".join(lines)


# Tuned-geometry cache: process-wide dict, persisted to disk so a sweep
# survives the process (serving workloads re-pack the same layouts every
# restart). Keyed by the packed layout AND the device kind, not the matrix
# contents: two matrices with the same (nb, nt, w, dtype, batch) stream
# identical byte patterns, so one sweep serves both.
_CACHE: dict[tuple, tuple[int, int]] = {}
_DISK_LOADED = False


def _cache_path() -> str:
    import os

    return os.environ.get(
        "TPUSPARSE_TUNE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "tpusparse",
                     "tune.json"))


def _device_kind() -> str:
    try:
        import jax

        return getattr(jax.devices()[0], "device_kind", "unknown")
    except Exception:                         # backend not initializable
        return "unknown"


def _load_disk() -> None:
    global _DISK_LOADED
    if _DISK_LOADED:
        return
    _DISK_LOADED = True
    import json
    import os

    path = _cache_path()
    if not os.path.exists(path):
        return
    try:
        with open(path) as f:
            raw = json.load(f)
        for k, v in raw.items():
            kind, fam, nb, nt, w, dtype, batch = k.split("|")
            key = (fam, int(nb), int(nt), int(w), dtype, int(batch), kind)
            _CACHE.setdefault(key, (int(v[0]), int(v[1])))
    except (ValueError, OSError):
        pass                                  # stale/corrupt cache: ignore


def _save_disk() -> None:
    import json
    import os

    path = _cache_path()
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        raw = {"|".join([k[-1], k[0], *map(str, k[1:-1])]): list(v)
               for k, v in _CACHE.items()}
        with open(path, "w") as f:
            json.dump(raw, f, indent=0)
    except OSError:
        pass                                  # read-only home: cache stays
                                              # in-process only


def cache_key(vals_shape: Sequence[int], dtype: Any, batch: int) -> tuple:
    nb, nt, w, _ = vals_shape
    return ("sell", nb, nt, w, np.dtype(dtype).name, int(batch),
            _device_kind())


def lookup(key: tuple) -> tuple[int, int] | None:
    _load_disk()
    return _CACHE.get(key)


def clear_cache(disk: bool = False) -> None:
    global _DISK_LOADED
    _CACHE.clear()
    _DISK_LOADED = True                       # don't resurrect from disk
    if disk:
        import os

        try:
            os.remove(_cache_path())
        except OSError:
            pass
        _DISK_LOADED = False


def sell_candidates(nt: int, nb: int, w: int, *, itemsize: int = 4,
                    batch: int = 1) -> list[tuple[int, int]]:
    """Candidate grid: divisor-snapped window runs x small group fan-outs,
    the heuristic's own pick, and the r1 default — deduplicated, VMEM-legal.
    The kernel snaps requests to divisors, so candidates are deduped by the
    *effective* geometry to avoid timing the same compiled kernel twice."""
    snap = _snap
    raw: list[tuple[int, int]] = [sell_geometry(nt, nb, w, itemsize=itemsize,
                                                batch=batch), (64, 1), (16, 4)]
    for tw in (8, 16, 32, 64, 128, nt):
        for jb in (1, 2, 4):
            raw.append((tw, jb))
    seen: set[tuple[int, int]] = set()
    out: list[tuple[int, int]] = []
    for tw, jb in raw:
        eff = (snap(tw, nt), snap(jb, nb))
        if eff in seen:
            continue
        if _step_vmem(*eff, w, itemsize, batch) > 14 << 20:
            continue
        seen.add(eff)
        out.append(eff)
    return out


def autotune_sell(s: Any, x: Any, candidates: Sequence[tuple[int, int]]
                  | None = None, *, use_cache: bool = True,
                  k1: int = 16, k2: int | None = None,
                  reps: int = 7) -> TuneResult:
    """Measure every candidate geometry for ``s.spmv(x)`` (or ``spmm`` when
    ``x`` is 2-D) on the current default device; cache and return the winner.

    After this runs, plain ``s.spmv(x)`` / ``s.spmm(x)`` calls on any
    same-layout matrix pick up the tuned geometry automatically (the cache
    is consulted in ``SellMatrix._run``) — in this process and, via the
    disk cache, in future ones on the same device kind. Cost is dominated
    by the two chained-jit compiles per candidate (~1 min each cold over
    the axon tunnel; warm processes hit the persistent XLA cache).
    """
    import jax
    import jax.numpy as jnp

    from tpusparse.bench.runner import device_time

    batch = 1 if np.ndim(x) == 1 else np.shape(x)[0]
    # One host->device upload for the whole sweep: device_time replicates
    # its operand per call, but device_put on already-resident leaves is
    # free, and the axon tunnel moves ~MB/s (a 63 MB canonical format
    # re-uploaded per candidate would dominate the sweep).
    s = jax.tree_util.tree_map(lambda l: jax.device_put(jnp.asarray(l)), s)
    x = jax.device_put(jnp.asarray(x))
    nb, nt, w, _ = s.vals.shape
    itemsize = np.dtype(s.vals.dtype).itemsize
    if candidates is None:
        candidates = sell_candidates(nt, nb, w, itemsize=itemsize,
                                     batch=batch)
    key = cache_key(s.vals.shape, s.vals.dtype, batch)
    nbytes = s.device_bytes()
    table = []
    for geom in candidates:
        def fn(fmt, xx, _g=geom):
            out = (fmt.spmv if xx.ndim == 1 else fmt.spmm)(xx, geometry=_g)
            return out
        # k2=None lets the runner scale the chain to the format's bytes and
        # pick the jitter-appropriate estimator (see device_time docstring)
        r = device_time(fn, s, x, name=f"sell {geom[0]}x{geom[1]}",
                        k1=k1, k2=k2, reps=reps, bytes_moved=nbytes)
        table.append((geom, r.seconds))
    best = min(table, key=lambda t: t[1])[0]
    if use_cache:
        _load_disk()
        _CACHE[key] = best
        _save_disk()
    return TuneResult(geometry=best, table=tuple(table))
