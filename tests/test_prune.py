"""Pruning strategies (tpusparse/prune.py) and their packing properties."""

import numpy as np
import pytest

from tpusparse.formats.sell import SellMatrix
from tpusparse.prune import block_prune, magnitude_prune, nm_prune, summary
from tpusparse.testing import generators


@pytest.fixture(scope="module")
def dense_weight():
    rng = np.random.default_rng(71)
    # fully dense trained-like weight, some scale structure across columns
    a = rng.normal(size=(512, 384)).astype(np.float32)
    a *= rng.uniform(0.5, 2.0, size=(1, 384)).astype(np.float32)
    return a


def test_magnitude_prune_per_column(dense_weight):
    a = dense_weight
    csr = magnitude_prune(a, density=0.25, per_column=True)
    # exactly k kept per output column
    k = round(0.25 * a.shape[0])
    assert (csr.row_nnz == k).all()
    # kept entries are each column's top-k by |a| and values are exact
    d = csr.to_dense()
    for c in (0, 97, 383):
        kept = np.flatnonzero(d[:, c])
        top = np.argsort(-np.abs(a[:, c]))[:k]
        assert set(kept) == set(top)
        np.testing.assert_array_equal(d[kept, c], a[kept, c])


def test_magnitude_prune_global(dense_weight):
    a = dense_weight
    csr = magnitude_prune(a, density=0.1, per_column=False)
    k = round(0.1 * a.size)
    assert csr.nnz == k
    d = csr.to_dense()
    kept_min = np.abs(d[d != 0]).min()
    dropped_max = np.abs(a[d == 0]).max()
    assert kept_min >= dropped_max  # a true global threshold


def test_nm_prune_uniform_sell_width(dense_weight):
    a = dense_weight
    csr = nm_prune(a, 2, 4)
    # every 4-row group of every column keeps exactly 2
    d = csr.to_dense()
    per_group = (d.reshape(128, 4, 384) != 0).sum(axis=1)
    assert (per_group == 2).all()
    # -> zero SELL padding at exactly W = 128 * 2/4 = 64
    info = summary(csr)
    assert info["sell_w"] == 64
    assert info["sell_pad_frac"] == 0.0
    s = SellMatrix.from_csr(csr)
    assert s.w == 64


def test_nm_prune_validation(dense_weight):
    with pytest.raises(ValueError, match="n_keep"):
        nm_prune(dense_weight, 5, 4)
    with pytest.raises(ValueError, match="divisible"):
        nm_prune(dense_weight[:510], 2, 4)


def test_block_prune_matches_bsr_grid():
    a = generators.random_sparse_matrix(512, 512, density=0.9, seed=72)
    csr = block_prune(a, density=0.5, block_m=128, block_n=128)
    d = csr.to_dense()
    tiles = d.reshape(4, 128, 4, 128)
    live = tiles.any(axis=(1, 3))
    assert live.sum() == 8  # 50% of 16 blocks
    # kept blocks are exactly a's values there
    for i in range(4):
        for j in range(4):
            if live[i, j]:
                np.testing.assert_array_equal(
                    tiles[i, :, j, :],
                    a.reshape(4, 128, 4, 128)[i, :, j, :])
    # and they are the top-norm blocks
    norms = np.sqrt((a.reshape(4, 128, 4, 128).astype(np.float64) ** 2
                     ).sum(axis=(1, 3)))
    assert set(np.flatnonzero(live.ravel())) == set(
        np.argsort(-norms.ravel())[:8])


def test_block_prune_ragged_edge():
    a = generators.random_sparse_matrix(300, 200, density=0.8, seed=73)
    csr = block_prune(a, density=0.5, block_m=128, block_n=128)
    assert csr.shape == (300, 200)
    assert 0 < csr.nnz < np.count_nonzero(a)


def test_density_validation(dense_weight):
    for bad in (0.0, 1.5, -0.1):
        with pytest.raises(ValueError, match="density"):
            magnitude_prune(dense_weight, bad)
        with pytest.raises(ValueError, match="density"):
            block_prune(dense_weight, bad)


def test_pruned_matrix_multiplies(dense_weight):
    """End-to-end: pruned weight -> SELL -> spmv matches the masked dense."""
    import jax.numpy as jnp

    from tests.conftest import assert_close

    csr = magnitude_prune(dense_weight, density=0.25)
    s = SellMatrix.from_csr(csr)
    x = generators.random_sparse_vector(512, density=0.5, seed=74)
    ref = (np.asarray(x, np.float64)
           @ csr.to_dense().astype(np.float64)).astype(np.float32)
    assert_close(s.spmv(jnp.asarray(x)), ref, name="pruned spmv")
