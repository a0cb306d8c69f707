"""Generator unit tests — reproducibility and distribution shape.

The reference had no tests for data generation (unseeded RNG, tester.cpp:107);
these pin the seeded contract.
"""

import numpy as np
import pytest

from tpusparse.testing import generators


def test_reproducible():
    a1 = generators.random_sparse_matrix(64, 128, density=0.5, seed=3)
    a2 = generators.random_sparse_matrix(64, 128, density=0.5, seed=3)
    np.testing.assert_array_equal(a1, a2)
    a3 = generators.random_sparse_matrix(64, 128, density=0.5, seed=4)
    assert not np.array_equal(a1, a3)


@pytest.mark.parametrize("dist", ["uniform", "powerlaw", "banded", "blocks"])
def test_density_approx(dist):
    a = generators.random_sparse_matrix(256, 256, density=0.5, seed=0,
                                        distribution=dist)
    d = (a != 0).mean()
    assert 0.2 < d < 0.8, f"{dist}: density {d}"
    assert a.dtype == np.float32


def test_powerlaw_skew():
    a = generators.random_sparse_matrix(512, 512, density=0.3, seed=1,
                                        distribution="powerlaw")
    col_nnz = (a != 0).sum(axis=0)
    # skewed: the densest decile should dominate the sparsest decile
    s = np.sort(col_nnz)
    assert s[-51:].sum() > 5 * max(s[:51].sum(), 1)


def test_vector_and_batch():
    x = generators.random_sparse_vector(256, density=0.5, seed=2)
    assert x.shape == (256,)
    xb = generators.random_sparse_batch(4, 256, density=0.5, seed=2)
    assert xb.shape == (4, 256)
    assert 0.3 < (x != 0).mean() < 0.7


# --- real-topology generators (round 3) -------------------------------------


def test_rmat_reproducible_and_skewed():
    g1 = generators.rmat_csr(9, edge_factor=16, seed=7)
    g2 = generators.rmat_csr(9, edge_factor=16, seed=7)
    np.testing.assert_array_equal(g1.col_idx, g2.col_idx)
    np.testing.assert_array_equal(g1.values, g2.values)
    assert g1.shape == (512, 512)
    deg = np.diff(g1.row_ptr)
    # hubs: max column degree far above the median (i.i.d. masks can't do this)
    assert deg.max() > 10 * max(np.median(deg), 1)


def test_rmat_symmetric_option():
    g = generators.rmat_csr(8, edge_factor=8, seed=3, symmetric=True)
    d = g.to_dense()
    np.testing.assert_array_equal(d != 0, (d != 0).T)


def test_stencil_shapes_and_spd():
    s = generators.stencil_csr((16, 16))
    d = s.to_dense().astype(np.float64)
    assert np.allclose(d, d.T)
    # SPD: diagonal dominance by construction
    assert (np.abs(d).sum(axis=1) - 2 * np.diag(d) < 1e-6).all()
    s27 = generators.stencil_csr((6, 6, 6), points=27)
    assert s27.shape == (216, 216)
    interior = 27  # an interior node couples to the full 3x3x3 box
    assert np.diff(s27.row_ptr).max() == interior


def test_stencil_anisotropic_couplings():
    a = generators.stencil_csr((8, 8), eps=100.0, eps_axis=0).to_dense()
    # along eps_axis (row-major axis 0: stride 8) couplings are -100
    assert a[0, 8] == np.float32(-100.0)
    assert a[0, 1] == np.float32(-1.0)


def test_mesh_csr_laplacian():
    m = generators.mesh_csr(16, 16, seed=1)
    d = m.to_dense().astype(np.float64)
    assert np.allclose(d, d.T)
    off = d - np.diag(np.diag(d))
    assert (off <= 0).all()                      # graph Laplacian signs
    assert np.allclose(np.diag(d) + off.sum(axis=1), 1e-3, atol=1e-6)


def test_banded_defects_breaks_pure_banding():
    b = generators.banded_defects_csr(256, bandwidth=4, defect_density=2e-3,
                                      seed=2)
    rows = np.repeat(np.arange(256), np.diff(b.row_ptr))
    diags = np.unique(rows - b.col_idx)
    assert diags.size > 2 * (2 * 4 + 1)          # defects spray diagonals
    # ... but the band carries almost all the nnz
    in_band = (np.abs(rows - b.col_idx) <= 4).mean()
    assert in_band > 0.9


def test_nm_pruned_exact_structure():
    a = generators.nm_pruned_matrix(128, 64, n_keep=2, group=4, seed=1)
    per_group = (a.reshape(32, 4, 64) != 0).sum(axis=1)
    assert (per_group == 2).all()
    a14 = generators.nm_pruned_matrix(128, 64, n_keep=1, group=4, seed=1)
    assert abs((a14 != 0).mean() - 0.25) < 1e-9


def test_block_pruned_structure():
    a = generators.block_pruned_matrix(512, 512, block=128, keep_frac=0.3,
                                       fill=0.5, seed=2)
    tiles = (a.reshape(4, 128, 4, 128) != 0).sum(axis=(1, 3))
    live = tiles > 0
    assert 0 < live.sum() < 16
    fills = tiles[live] / 128.0 / 128.0
    assert 0.35 < fills.mean() < 0.65
