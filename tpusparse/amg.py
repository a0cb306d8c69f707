"""Smoothed-aggregation algebraic multigrid, TPU-native.

The heaviest canonical consumer of a fast SpMV is a multigrid-preconditioned
Krylov solve: every smoother application, residual, restriction and
prolongation IS a sparse matvec, so the whole V-cycle inherits the measured
format speeds (BENCH.md). This module follows the classic smoothed
aggregation construction (Vanek/Mandel/Brezina '96) with the library's
TPU-shaped choices:

- **Setup is host-side** (numpy/scipy, float64): aggregation, tentative +
  Jacobi-smoothed prolongators, Galerkin triple products. One-time cost,
  like every converter in ``formats/``.
- **The cycle is device-side and fully jittable**: each level's operator,
  restriction ``P`` and prolongation ``Pᵀ`` are packed formats
  (``auto_format`` / ``SellMatrix.from_csr`` — no densify at any size),
  smoothing is the Chebyshev polynomial smoother (pure SpMVs — no
  Gauss-Seidel triangular sweeps, which are sequential and hostile to the
  VPU; see ``solve.chebyshev_preconditioner`` for the rationale), and the
  coarsest level is a precomputed dense inverse (one small MXU matmul).
- **Symmetric by construction** (identical polynomial pre/post smoothers
  ``p(D⁻¹A)D⁻¹ = D^{-1/2} p(D^{-1/2}AD^{-1/2}) D^{-1/2}``, Galerkin coarse
  operators, exact coarse solve), so the V-cycle is a valid ``m_inv`` for
  ``solve.cg``.

Operator convention matches the library (``fmt.spmv(v) == Aᵀ v``); AMG
requires symmetric ``A``, where that is ``A v``. The reference has no
counterpart (it stops at the kernel benchmark); this is north-star scope,
like ``solve``/``eig``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import numpy as np

import jax.numpy as jnp

from tpusparse.formats.csr import CsrMatrix
from tpusparse.solve import chebyshev_preconditioner


def _aggregate(sp, theta: float) -> tuple[np.ndarray, int]:
    """Standard aggregation (Vanek '96 3-pass) on the strength graph
    ``|a_ij| >= theta * sqrt(a_ii * a_jj)``. Returns (agg ids, n_agg)."""
    n = sp.shape[0]
    indptr, indices, data = sp.indptr, sp.indices, np.abs(sp.data)
    diag = np.abs(sp.diagonal()) + 1e-300
    # strength mask per stored entry (off-diagonal, above threshold)
    rows = np.repeat(np.arange(n), np.diff(indptr))
    strong = (indices != rows) & \
        (data >= theta * np.sqrt(diag[rows] * diag[indices]) + 1e-300)

    agg = np.full(n, -1, np.int64)
    next_id = 0
    # pass 1: seed aggregates from fully-unaggregated strong neighborhoods
    for i in range(n):
        if agg[i] != -1:
            continue
        sl = slice(indptr[i], indptr[i + 1])
        nbrs = indices[sl][strong[sl]]
        if (agg[nbrs] == -1).all():
            agg[i] = next_id
            agg[nbrs] = next_id
            next_id += 1
    # pass 2: attach leftovers to the strongest adjacent aggregate
    # (decided against the pass-1 state so attachments don't chain)
    pass1 = agg.copy()
    for i in range(n):
        if agg[i] != -1:
            continue
        sl = slice(indptr[i], indptr[i + 1])
        nbrs = indices[sl][strong[sl]]
        w = data[sl][strong[sl]]
        hit = pass1[nbrs] != -1
        if hit.any():
            agg[i] = pass1[nbrs[hit][np.argmax(w[hit])]]
    # pass 3: remaining nodes form aggregates of what's left around them
    for i in range(n):
        if agg[i] != -1:
            continue
        sl = slice(indptr[i], indptr[i + 1])
        nbrs = indices[sl][strong[sl]]
        grp = np.concatenate([[i], nbrs[agg[nbrs] == -1]])
        agg[grp] = next_id
        next_id += 1
    return agg, next_id


def _lmax_dinv_a(sp, dinv: np.ndarray, iters: int = 20,
                 seed: int = 0) -> float:
    """Power-iteration estimate of lambda_max(D^-1 A) (host, float64)."""
    rng = np.random.default_rng(seed)
    v = rng.normal(size=sp.shape[0])
    v /= np.linalg.norm(v)
    lam = 1.0
    for _ in range(iters):
        w = dinv * (sp @ v)
        lam = np.linalg.norm(w)
        if lam == 0.0:
            return 1.0
        v = w / lam
    return float(lam)


@dataclasses.dataclass
class _Level:
    apply_a: Callable          # v -> A v (packed format or dense closure)
    smooth: Callable | None    # r -> z ~ A^-1 r (Chebyshev; None = coarsest)
    restrict: Callable | None  # r_f -> r_c  (v @ P)
    prolong: Callable | None   # e_c -> e_f  (v @ P.T)
    n: int
    nnz: int
    fmt: str


class SmoothedAggregationAMG:
    """One V-cycle per ``__call__`` — a symmetric positive definite
    approximation of ``A⁻¹``, ready to drop in as ``m_inv`` for
    ``solve.cg`` (or used standalone: ``solve(b)``).

    Build with :func:`smoothed_aggregation`. Jittable: the level list is
    static, so the recursion unrolls into a fixed chain of packed-format
    SpMVs plus one coarse matmul.
    """

    def __init__(self, levels: list[_Level], coarse_inv: jnp.ndarray,
                 theta: float, degree: int):
        self.levels = levels
        self.coarse_inv = coarse_inv
        self.theta = theta
        self.degree = degree

    # -- stats ---------------------------------------------------------
    @property
    def operator_complexity(self) -> float:
        return sum(l.nnz for l in self.levels) / max(self.levels[0].nnz, 1)

    @property
    def grid_complexity(self) -> float:
        return sum(l.n for l in self.levels) / max(self.levels[0].n, 1)

    def __repr__(self) -> str:
        rows = ", ".join(f"{l.n}({l.fmt},nnz={l.nnz})" for l in self.levels)
        return (f"SmoothedAggregationAMG(levels=[{rows}], "
                f"op_cx={self.operator_complexity:.2f}, "
                f"grid_cx={self.grid_complexity:.2f}, "
                f"degree={self.degree})")

    # -- the cycle -----------------------------------------------------
    def _cycle(self, li: int, r: jnp.ndarray) -> jnp.ndarray:
        lev = self.levels[li]
        if lev.smooth is None:                       # coarsest: exact solve
            return r @ self.coarse_inv
        x = lev.smooth(r)                            # pre-smooth (zero guess)
        rc = lev.restrict(r - lev.apply_a(x))
        x = x + lev.prolong(self._cycle(li + 1, rc))
        return x + lev.smooth(r - lev.apply_a(x))    # post-smooth

    def __call__(self, r: jnp.ndarray) -> jnp.ndarray:
        return self._cycle(0, jnp.asarray(r))

    def solve(self, b, x0=None, *, tol: float = 1e-5, atol: float = 0.0,
              maxiter: int | None = None):
        """AMG-preconditioned CG on the finest operator."""
        from tpusparse.solve import cg

        return cg(self.levels[0].apply_a, jnp.asarray(b), x0, tol=tol,
                  atol=atol, maxiter=maxiter, m_inv=self)


def _pack_op(sp, dense_cutoff: int):
    """Pack a host scipy matrix as a device op ``v -> v @ sp`` + metadata."""
    m, n = sp.shape
    if max(m, n) <= dense_cutoff:
        d = jnp.asarray(sp.toarray().astype(np.float32))
        return (lambda v, _d=d: v @ _d), "dense"
    from tpusparse.formats.auto import auto_format
    from tpusparse.formats.sell import SellMatrix

    csr = CsrMatrix.from_scipy(sp.astype(np.float32))
    fmt = auto_format(csr) if m == n else SellMatrix.from_csr(csr)
    return fmt.spmv, type(fmt).__name__


def smoothed_aggregation(a, *, theta: float = 0.0, degree: int = 2,
                         ratio: float = 8.0, coarse_size: int = 400,
                         max_levels: int = 12, omega: float = 4.0 / 3.0,
                         dense_cutoff: int = 2048,
                         sym_tol: float = 1e-6) -> SmoothedAggregationAMG:
    """Build a smoothed-aggregation AMG hierarchy for symmetric ``a``.

    ``a`` — ``CsrMatrix``, scipy sparse, or dense ndarray (SPD system
    matrix). ``theta`` — strength-of-connection drop tolerance (0 keeps
    every stored off-diagonal, the standard SA default). ``degree`` —
    Chebyshev smoother degree; each V-cycle costs ~``2 * degree + 2``
    SpMVs per level. ``ratio`` — the smoother targets
    ``[lmax/ratio, 1.05 * lmax]`` of ``D⁻¹A`` (the aggressive-smoothing
    convention; coarse grids handle the rest). ``omega`` — prolongator
    Jacobi damping, ``P = (I - omega/lmax * D⁻¹A) P_tent``.
    Levels coarser than ``dense_cutoff`` switch from packed formats to
    dense device matmuls; ``coarse_size`` caps the hierarchy with a
    precomputed dense inverse.
    """
    from scipy import sparse as ssp

    if isinstance(a, CsrMatrix):
        sp = a.to_scipy().tocsr().astype(np.float64)
    elif ssp.issparse(a):
        sp = a.tocsr().astype(np.float64)
    else:
        sp = ssp.csr_matrix(np.asarray(a, np.float64))
    if sp.shape[0] != sp.shape[1]:
        raise ValueError(f"AMG needs a square matrix, got {sp.shape}")
    asym = abs(sp - sp.T)
    if asym.nnz and asym.max() > sym_tol * max(abs(sp).max(), 1e-300):
        raise ValueError("AMG requires a symmetric matrix "
                         f"(max|A - A.T| = {asym.max():.3g})")

    levels: list[_Level] = []
    while sp.shape[0] > coarse_size and len(levels) < max_levels - 1:
        n = sp.shape[0]
        diag = sp.diagonal()
        dinv_h = 1.0 / np.where(np.abs(diag) > 1e-300, diag, 1.0)
        lmax = _lmax_dinv_a(sp, dinv_h)

        agg, n_agg = _aggregate(sp, theta)
        if n_agg >= n:            # aggregation stalled (all singletons)
            break
        # tentative prolongator: unit-normalized aggregate indicators
        counts = np.bincount(agg, minlength=n_agg).astype(np.float64)
        p0 = ssp.csr_matrix(
            (1.0 / np.sqrt(counts[agg]), (np.arange(n), agg)),
            shape=(n, n_agg))
        # Jacobi smoothing: P = (I - omega/lmax D^-1 A) P0
        da = ssp.diags(dinv_h * (omega / max(lmax, 1e-30))) @ sp
        p = (p0 - da @ p0).tocsr()

        apply_a, fmt_name = _pack_op(sp, dense_cutoff)
        cheb = chebyshev_preconditioner(
            lambda v, _f=apply_a, _di=jnp.asarray(
                dinv_h.astype(np.float32)): _di * _f(v),
            1.05 * lmax, lmax / ratio, degree=degree)
        dinv_d = jnp.asarray(dinv_h.astype(np.float32))
        smooth = (lambda r, _c=cheb, _di=dinv_d: _c(_di * r))
        restrict, _ = _pack_op(p, dense_cutoff)
        prolong, _ = _pack_op(p.T.tocsr(), dense_cutoff)
        levels.append(_Level(apply_a, smooth, restrict, prolong,
                             n, sp.nnz, fmt_name))
        sp = (p.T @ sp @ p).tocsr()

    apply_a, fmt_name = _pack_op(sp, dense_cutoff)
    levels.append(_Level(apply_a, None, None, None, sp.shape[0], sp.nnz,
                         fmt_name))
    # coarse inverse, float64 on host then cast; applied as v @ inv(A)
    # (symmetric, so the row-vector convention needs no transpose)
    coarse_inv = jnp.asarray(np.linalg.inv(sp.toarray()).astype(np.float32))
    return SmoothedAggregationAMG(levels, coarse_inv, theta, degree)
