"""Dense CPU oracle for correctness checks.

Replaces the reference's double-loop ``SgemvCPU`` (tester.cpp:36-45): the math
is ``Y[i] = sum_j X[j] * A[j, i]`` — i.e. ``Y = X @ A``. We use numpy's BLAS
path in float64 and cast down, which is a *stronger* oracle than the
reference's fp32 accumulation while staying within its 1e-3 tolerance
(tester.cpp:75).
"""

from __future__ import annotations

import numpy as np


def sgemv_cpu(x: np.ndarray, a: np.ndarray) -> np.ndarray:
    """x: (m,), a: (m, n) -> (n,)."""
    assert x.ndim == 1 and a.ndim == 2 and x.shape[0] == a.shape[0]
    return (x.astype(np.float64) @ a.astype(np.float64)).astype(a.dtype)


def sgemm_cpu(x: np.ndarray, a: np.ndarray) -> np.ndarray:
    """x: (b, m), a: (m, n) -> (b, n) — SpMM extension."""
    assert x.ndim == 2 and a.ndim == 2 and x.shape[1] == a.shape[0]
    return (x.astype(np.float64) @ a.astype(np.float64)).astype(a.dtype)
