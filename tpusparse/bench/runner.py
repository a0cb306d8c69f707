"""Device-time measurement that survives the async axon tunnel.

Replaces the reference's ``TIME_KERNEL`` cudaEvent macro (kernel.hpp:31-48).
CUDA events measure device time directly; over the async axon tunnel the only
reliable sync point is fetching a value, and per-launch RPC overhead is ~ms.
So we measure the *slope*:

    T(k)  = rtt + k * t_kernel      (k chained in-jit iterations)
    t_kernel = (T(k2) - T(k1)) / (k2 - k1)

with three safeguards:

- iterations are data-chained through ``eps = sum(y) * 1e-37`` (numerically a
  no-op in fp32, but XLA cannot fold it, so the chain cannot be hoisted);
- every iteration consumes its own operand replica, so nothing can be kept
  VMEM-resident between iterations (128 MB v5e VMEM fits a whole 64 MB
  operand — with any reuse XLA has been observed holding a replica resident
  and the slope comes out above physical HBM bandwidth);
- the iteration loop is *statically unrolled* (each replica is a distinct
  jit argument), so Pallas kernels see whole buffers — a dynamic-slice
  feeding a ``pallas_call`` would materialize an extra HBM copy and pollute
  the count.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class BenchResult:
    name: str
    seconds: float           # per-call device time
    bytes_moved: int | None = None  # format bytes actually streamed
    flops: int | None = None
    nnz: int | None = None

    @property
    def gbps(self) -> float | None:
        return None if self.bytes_moved is None else self.bytes_moved / self.seconds / 1e9

    @property
    def gflops(self) -> float | None:
        return None if self.flops is None else self.flops / self.seconds / 1e9

    @property
    def nnz_per_s(self) -> float | None:
        return None if self.nnz is None else self.nnz / self.seconds

    def __str__(self) -> str:
        parts = [f"{self.name}: {self.seconds*1e6:.1f} us"]
        if self.gbps is not None:
            parts.append(f"{self.gbps:.0f} GB/s")
        if self.gflops is not None:
            parts.append(f"{self.gflops:.1f} GFLOP/s")
        if self.nnz_per_s is not None:
            parts.append(f"{self.nnz_per_s/1e9:.2f} Gnnz/s")
        return " | ".join(parts)


def _replicate(fmt: Any, copies: int) -> list[Any]:
    """``copies`` independent device-resident replicas of a format pytree."""
    out = []
    for _ in range(copies):
        out.append(jax.tree_util.tree_map(
            lambda leaf: jax.device_put(jnp.asarray(leaf)).copy(), fmt))
    return out


def _chained(fn: Callable[[Any, Any], Any], k: int):
    """jit of k sequential fn calls, each on its own operand replica.

    One fresh replica per iteration: with *any* reuse XLA may keep a reused
    replica VMEM-resident (128 MB on v5e fits a whole 64 MB operand) and the
    measured slope comes out above the physical HBM bandwidth. Distinct
    replicas make every iteration stream from HBM unconditionally.
    """

    @jax.jit
    def run(replicas, x):
        y = fn(replicas[0], x)
        for i in range(1, k):
            eps = (jnp.sum(y) * 1e-37).astype(x.dtype)
            y = fn(replicas[i], x + eps)
        return jnp.sum(y)

    return run


def device_time(
    fn: Callable[[Any, Any], Any],
    fmt: Any,
    x: Any,
    *,
    name: str = "kernel",
    k1: int = 16,
    k2: int = 64,
    reps: int = 7,
    bytes_moved: int | None = None,
    flops: int | None = None,
    nnz: int | None = None,
) -> BenchResult:
    """Per-call device seconds for ``fn(fmt, x)`` via the slope method."""
    # one replica per iteration (see _chained); shrink k if HBM would blow up
    budget = 6_000_000_000
    if bytes_moved is not None and bytes_moved * k2 > budget:
        k2 = max(budget // bytes_moved, 6)
        k1 = max(k2 // 3, 2)
    replicas = _replicate(fmt, k2)
    x = jax.device_put(jnp.asarray(x))
    run1 = _chained(fn, k1)
    run2 = _chained(fn, k2)
    float(run1(replicas, x))  # compile + sync
    float(run2(replicas, x))
    # The pooled chip is intermittently contended and the tunnel RTT jitters
    # by ~ms; contention only ever ADDS time, so the clean estimate of each
    # total is the MIN over reps, and the slope comes from the two minima.
    t1s, t2s = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run1(replicas, x))
        t1 = time.perf_counter()
        float(run2(replicas, x))
        t2 = time.perf_counter()
        t1s.append(t1 - t0)
        t2s.append(t2 - t1)
    sec = max((min(t2s) - min(t1s)) / (k2 - k1), 1e-9)
    return BenchResult(name=name, seconds=sec, bytes_moved=bytes_moved,
                       flops=flops, nnz=nnz)
