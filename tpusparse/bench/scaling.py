"""Scaling-efficiency benchmark over an N-device mesh.

BASELINE.md target: >=90% weak-scaling efficiency at N>=2 hosts. The
reference has no distributed code at all (SURVEY.md §2.4), so these curves
are a new capability. On a real pod slice this measures ICI; on a single
host it runs on however many devices exist (the test env forces an 8-device
virtual CPU mesh, which validates the sharded program end-to-end and gives a
logical scaling curve — real ICI numbers require real chips).

Definitions (D = device count, T_D = per-call wall time on D devices):
- weak scaling: per-device work held constant (N grows with D);
  efficiency_D = T_1 / T_D       (ideal: 1.0 — same time, D x the work)
- strong scaling: total work held constant;
  efficiency_D = T_1 / (D * T_D) (ideal: 1.0 — D x the speedup)
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from tpusparse.parallel import make_mesh
from tpusparse.testing import generators


@dataclasses.dataclass
class ScalePoint:
    devices: int
    m: int
    n: int
    seconds: float
    efficiency: float | None = None

    def __str__(self) -> str:
        eff = "" if self.efficiency is None else \
            f" | eff {self.efficiency * 100:.0f}%"
        return (f"D={self.devices} ({self.m}x{self.n}): "
                f"{self.seconds * 1e6:.0f} us{eff}")


def _time_sharded(build: Callable[[], Any], reps: int = 5,
                  inner: int = 8) -> float:
    """Median wall time of ``inner`` chained calls of a sharded product."""
    fn = build()
    fn()  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            y = fn()
        jax.block_until_ready(y)
        # fetching a scalar is the only reliable sync over the axon tunnel
        float(jnp.sum(y))
        ts.append((time.perf_counter() - t0) / inner)
    return float(np.median(ts))


def _make_runner(a: np.ndarray, x: np.ndarray, devices, partition: str,
                 kernel: str):
    mesh = make_mesh({"n": len(devices)}, devices)

    if kernel == "sell":
        from tpusparse.formats.sell import SellMatrix
        from tpusparse.parallel.sparse import sell_spmm_sharded

        s = SellMatrix.from_dense(a)
        return lambda: sell_spmm_sharded(s, x, mesh, partition)

    from tpusparse.parallel import spmv_sharded

    return lambda: spmv_sharded(a, x, mesh=mesh, partition=partition)


def sweep_scaling(
    *,
    mode: str = "weak",                 # "weak" | "strong"
    kernel: str = "dense",              # "dense" | "sell"
    partition: str = "n",
    base_m: int = 1024,
    base_n: int = 1024,
    density: float = 0.5,
    device_counts: tuple[int, ...] | None = None,
    seed: int = 0,
    verbose: bool = True,
    reps: int = 5,
    inner: int = 8,
) -> list[ScalePoint]:
    all_devices = jax.devices()
    if device_counts is None:
        device_counts = tuple(
            d for d in (1, 2, 4, 8, 16, 32) if d <= len(all_devices))
    points: list[ScalePoint] = []
    for d in device_counts:
        if mode == "weak":
            # grow the sharded dim with D: per-device slab constant
            m, n = (base_m, base_n * d) if partition == "n" \
                else (base_m * d, base_n)
        else:
            m, n = base_m, base_n
        a = generators.random_sparse_matrix(m, n, density=density, seed=seed)
        x = generators.random_sparse_vector(m, density=density, seed=seed)
        sec = _time_sharded(
            lambda: _make_runner(a, x, all_devices[:d], partition, kernel),
            reps=reps, inner=inner)
        points.append(ScalePoint(devices=d, m=m, n=n, seconds=sec))
    t1 = points[0].seconds
    for p in points:
        p.efficiency = t1 / p.seconds if mode == "weak" \
            else t1 / (p.devices * p.seconds)
    if verbose:
        for p in points:
            print(f"[{mode}/{kernel}/{partition}] {p}")
        if all_devices[0].platform == "cpu":
            print("note: virtual CPU devices share one host's cores — "
                  "efficiency here validates the sharded program, not "
                  "hardware scaling (D devices = D x the work on the same "
                  "silicon, so weak efficiency trends toward 1/D); the "
                  ">=90% target applies on real multi-chip meshes.")
    return points
