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
