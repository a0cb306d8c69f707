"""Seeded, reproducible sparse data generators.

Gap-closing vs the reference (SURVEY.md §4): the reference draws from an
unseeded ``std::random_device`` (tester.cpp:107-108) so no run is reproducible,
and only supports one distribution — uniform(-1, 1) values with i.i.d. ~50%
Bernoulli sparsity in both A and X (tester.cpp:103-121, 151-167). We keep that
as ``distribution="uniform"`` and add skewed workloads that exercise the
binned/adaptive scheduler:

- ``powerlaw``: per-output-column nnz follows a Zipf-like law (a few very
  dense columns, a long tail of nearly-empty ones).
- ``banded``: nonzeros concentrated in a diagonal band (halo-exchange-friendly).
- ``blocks``: block-structured sparsity (BSR's best case).
"""

from __future__ import annotations

import numpy as np


def _rng(seed: int) -> np.random.Generator:
    return np.random.default_rng(seed)


def random_sparse_vector(m: int, density: float = 0.5, seed: int = 0,
                         dtype=np.float32) -> np.ndarray:
    """X: (m,) with uniform(-1,1) values, i.i.d. Bernoulli(density) support."""
    rng = _rng(seed ^ 0x5EED)
    vals = rng.uniform(-1.0, 1.0, size=m)
    mask = rng.random(m) < density
    return (vals * mask).astype(dtype)


def random_sparse_batch(batch: int, m: int, density: float = 0.5, seed: int = 0,
                        dtype=np.float32) -> np.ndarray:
    """X: (batch, m) — the SpMM extension (multi-column X, BASELINE.json)."""
    rng = _rng(seed ^ 0xBA7C4)
    vals = rng.uniform(-1.0, 1.0, size=(batch, m))
    mask = rng.random((batch, m)) < density
    return (vals * mask).astype(dtype)


def random_sparse_matrix(m: int, n: int, density: float = 0.5, seed: int = 0,
                         distribution: str = "uniform",
                         dtype=np.float32, **kw) -> np.ndarray:
    """A: (m, n) dense ndarray with the requested sparsity structure.

    Dense output on purpose: converters ingest dense (like every reference
    converter ctor takes ``float* matrix``, e.g. wsp.cpp:3) and the dense
    array doubles as the oracle operand.
    """
    rng = _rng(seed)
    vals = rng.uniform(-1.0, 1.0, size=(m, n))
    if distribution == "uniform":
        mask = rng.random((m, n)) < density
    elif distribution == "powerlaw":
        mask = _powerlaw_mask(rng, m, n, density, alpha=kw.get("alpha", 1.2))
    elif distribution == "banded":
        mask = _banded_mask(rng, m, n, density, bandwidth=kw.get("bandwidth", None))
    elif distribution == "blocks":
        mask = _block_mask(rng, m, n, density, block=kw.get("block", 128))
    else:
        raise ValueError(f"unknown distribution: {distribution!r}")
    a = vals * mask
    # Avoid exactly-zero stored values inside the support: a value that is 0.0
    # by chance would make dense<->format round-trips ambiguous.
    a = np.where(mask & (a == 0.0), 1e-3, a)
    return a.astype(dtype)


def random_sparse_csr(m: int, n: int, density: float = 0.5, seed: int = 0,
                      distribution: str = "uniform", dtype=np.float32,
                      **kw) -> "CsrMatrix":
    """A as ``CsrMatrix`` generated WITHOUT materializing the dense array —
    the no-densify ingestion fixture (a 50k x 50k matrix is 10 GB dense).

    Positions are drawn with replacement and deduplicated, so nnz lands
    slightly below ``round(m*n*density)`` (within ~density/2 relative);
    exact-count generation would need per-column rejection loops that do not
    vectorize. Supports ``uniform`` and ``powerlaw`` (column-weighted).
    """
    from tpusparse.formats.csr import CsrMatrix

    rng = _rng(seed)
    target = int(round(m * n * density))
    if distribution == "uniform":
        pos = rng.integers(0, m * n, size=target, dtype=np.int64)
        pos = np.unique(pos)
        r, mi = pos // m, pos % m                 # r = output column
    elif distribution == "powerlaw":
        ranks = np.arange(1, n + 1, dtype=np.float64)
        w = ranks ** (-kw.get("alpha", 1.2))
        # clamp: float rounding can leave cumsum[-1] just under 1.0, and a
        # draw above it would index out of bounds
        cols = rng.permutation(n)[np.minimum(np.searchsorted(
            np.cumsum(w / w.sum()), rng.random(target)), n - 1)]
        rows = rng.integers(0, m, size=target, dtype=np.int64)
        pos = np.unique(cols.astype(np.int64) * m + rows)
        r, mi = pos // m, pos % m
    else:
        raise ValueError(
            f"random_sparse_csr supports uniform/powerlaw, not "
            f"{distribution!r}")
    vals = rng.uniform(-1.0, 1.0, size=r.size).astype(dtype)
    vals[vals == 0.0] = 1e-3                      # keep support unambiguous
    row_ptr = np.zeros(n + 1, dtype=np.int32)
    np.add.at(row_ptr, r + 1, 1)
    np.cumsum(row_ptr, out=row_ptr)
    return CsrMatrix(shape=(m, n), row_ptr=row_ptr,
                     col_idx=mi.astype(np.int32), values=vals)


def _powerlaw_mask(rng, m, n, density, alpha):
    # Per output column j (columns of A are the "rows" of the contraction,
    # SURVEY.md §0), target nnz ∝ (j+1)^-alpha, scaled to hit global density.
    ranks = np.arange(1, n + 1, dtype=np.float64)
    weights = ranks ** (-alpha)
    weights *= (density * m * n) / weights.sum()
    col_nnz = np.minimum(np.round(weights).astype(np.int64), m)
    cols = rng.permutation(n)  # do not correlate density with column index
    mask = np.zeros((m, n), dtype=bool)
    for j, target in zip(cols, col_nnz):
        if target > 0:
            mask[rng.choice(m, size=target, replace=False), j] = True
    return mask


def _banded_mask(rng, m, n, density, bandwidth):
    if bandwidth is None:
        bandwidth = max(1, int(density * (m + n) / 2))
    rows = np.arange(m)[:, None]
    cols = np.arange(n)[None, :]
    diag = np.abs(rows * (n / m) - cols)
    band = diag <= bandwidth
    # within the band, thin out to hit requested density approximately
    keep = min(1.0, density * m * n / max(band.sum(), 1))
    return band & (rng.random((m, n)) < keep)


def _block_mask(rng, m, n, density, block):
    bm, bn = -(-m // block), -(-n // block)
    blocks = rng.random((bm, bn)) < density
    if density > 0 and not blocks.any():
        # small grids can draw zero active blocks, producing an all-zero
        # "test matrix" that makes correctness checks vacuous
        blocks.flat[int(rng.integers(bm * bn))] = True
    return np.kron(blocks, np.ones((block, block), dtype=bool))[:m, :n]
