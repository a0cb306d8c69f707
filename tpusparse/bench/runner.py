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
- iterations cycle over ``copies`` replicas of the operands so the working
  set exceeds VMEM (128 MB on v5e) and every iteration streams from HBM —
  otherwise a 64 MB matrix goes VMEM-resident and we'd measure VMEM, not HBM;
- the copy loop is *statically unrolled* (each replica is a distinct jit
  argument), so Pallas kernels see whole buffers — a dynamic-slice feeding a
  ``pallas_call`` would materialize an extra HBM copy and pollute the count.
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


def _chained(fn: Callable[[Any, Any], Any], k: int, copies: int):
    """jit of k sequential fn calls cycling over operand replicas."""

    @jax.jit
    def run(replicas, x):
        y = fn(replicas[0], x)
        for i in range(1, k):
            eps = (jnp.sum(y) * 1e-37).astype(x.dtype)
            y = fn(replicas[i % copies], x + eps)
        return jnp.sum(y)

    return run


def device_time(
    fn: Callable[[Any, Any], Any],
    fmt: Any,
    x: Any,
    *,
    name: str = "kernel",
    k1: int = 16,
    k2: int = 48,
    copies: int = 4,
    reps: int = 3,
    bytes_moved: int | None = None,
    flops: int | None = None,
    nnz: int | None = None,
) -> BenchResult:
    """Per-call device seconds for ``fn(fmt, x)`` via the slope method."""
    if bytes_moved is not None:
        # working set must exceed VMEM (128 MB on v5e) by a safe margin or
        # iterations run VMEM-resident and the slope collapses to ~0
        copies = max(copies, -(-320_000_000 // max(bytes_moved, 1)))
        copies = min(copies, 64)
    replicas = _replicate(fmt, copies)
    x = jax.device_put(jnp.asarray(x))
    run1 = _chained(fn, k1, copies)
    run2 = _chained(fn, k2, copies)
    float(run1(replicas, x))  # compile + sync
    float(run2(replicas, x))
    slopes = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run1(replicas, x))
        t1 = time.perf_counter()
        float(run2(replicas, x))
        t2 = time.perf_counter()
        slopes.append(((t2 - t1) - (t1 - t0)) / (k2 - k1))
    sec = max(float(np.median(slopes)), 1e-9)
    return BenchResult(name=name, seconds=sec, bytes_moved=bytes_moved,
                       flops=flops, nnz=nnz)
