"""RCM reordering (tpusparse/reorder.py): scrambled bands -> DIA."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpusparse.formats.auto import auto_format
from tpusparse.formats.csr import CsrMatrix
from tpusparse.formats.dia import DiaMatrix
from tpusparse.formats.sell import SellMatrix
from tpusparse import reorder


def _scrambled_banded(n=1024, bandwidth=6, seed=11):
    """A banded SPD-ish operator under a random node renumbering — the
    arrival state of any mesh operator with arbitrary numbering."""
    rng = np.random.default_rng(seed)
    a = np.zeros((n, n), dtype=np.float32)
    for k in range(-bandwidth, bandwidth + 1):
        d = rng.uniform(0.2, 1.0, n - abs(k)).astype(np.float32)
        a += np.diag(d if k else d + 2.0 * bandwidth, k)
    p = rng.permutation(n)
    return np.ascontiguousarray(a[np.ix_(p, p)]), a


def test_rcm_recovers_band_and_routes_to_dia():
    scrambled, _orig = _scrambled_banded()
    csr = CsrMatrix.from_dense(scrambled)
    assert reorder.bandwidth_csr(csr) > 500       # scrambled: band blown up
    csr_b, p = reorder.rcm(csr)
    assert reorder.bandwidth_csr(csr_b) <= 40     # RCM: near-original band
    assert csr_b.nnz == csr.nnz
    fmt = auto_format(csr_b)
    assert isinstance(fmt, DiaMatrix)
    # B really is A[p][:, p]
    np.testing.assert_array_equal(
        csr_b.to_dense(), scrambled[np.ix_(p, p)])


def test_two_space_spmv_matches_direct():
    scrambled, _ = _scrambled_banded(seed=12)
    csr = CsrMatrix.from_dense(scrambled)
    csr_b, p = reorder.rcm(csr)
    fmt_b = auto_format(csr_b)
    rng = np.random.default_rng(13)
    x = rng.normal(size=csr.shape[0]).astype(np.float32)
    y_direct = np.asarray(SellMatrix.from_csr(csr).spmv(jnp.asarray(x)))
    y_b = np.asarray(fmt_b.spmv(jnp.asarray(reorder.permute_vector(x, p))))
    np.testing.assert_allclose(
        reorder.unpermute_vector(y_b, p), y_direct, atol=1e-3)


def test_cg_in_permuted_space():
    """The module-docstring pattern end-to-end: solve the scrambled system
    via RCM + DIA + CG; the un-permuted solution solves the original."""
    from tpusparse.solve import cg

    scrambled, _ = _scrambled_banded(seed=14)
    sym = (scrambled + scrambled.T) / 2            # SPD for CG
    csr = CsrMatrix.from_dense(np.ascontiguousarray(sym))
    got = reorder.banded_after_rcm(csr)
    assert got is not None
    csr_b, p = got
    fmt = auto_format(csr_b)
    assert isinstance(fmt, DiaMatrix)
    rng = np.random.default_rng(15)
    z_true = rng.normal(size=csr.shape[0]).astype(np.float32)
    b = (sym.astype(np.float64) @ z_true).astype(np.float32)
    z_b, info = cg(fmt, jnp.asarray(reorder.permute_vector(b, p)), tol=1e-6)
    z = reorder.unpermute_vector(np.asarray(z_b), p)
    np.testing.assert_allclose(z, z_true, atol=5e-3)
    assert int(info["iters"]) < csr.shape[0]


def test_banded_after_rcm_rejects_uniform():
    """Uniform random sparsity has no band to recover — the helper must
    decline instead of forcing a pathological DIA pack."""
    from tpusparse.testing.generators import random_sparse_csr

    csr = random_sparse_csr(512, 512, density=0.05, seed=16)
    assert reorder.banded_after_rcm(csr) is None


def test_validation_and_inverse():
    with pytest.raises(ValueError, match="square"):
        reorder.rcm(CsrMatrix.from_dense(np.ones((4, 8), np.float32)))
    p = np.random.default_rng(17).permutation(64)
    v = np.arange(64)
    np.testing.assert_array_equal(
        reorder.unpermute_vector(reorder.permute_vector(v, p), p), v)
    np.testing.assert_array_equal(
        p[reorder.inverse_permutation(p)], np.arange(64))
