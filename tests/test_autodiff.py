"""Differentiable sparse linear maps (tpusparse/autodiff.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import assert_close
from tpusparse.autodiff import linear_map
from tpusparse.formats.csr import CsrMatrix
from tpusparse.formats.sell import SellMatrix
from tpusparse.testing import generators


@pytest.fixture(scope="module")
def workload():
    a = generators.random_sparse_matrix(384, 256, density=0.3, seed=11)
    x = generators.random_sparse_vector(384, density=0.5, seed=12)
    return a, x


def test_forward_matches_spmv(workload):
    a, x = workload
    f = linear_map(SellMatrix.from_dense(a))
    assert_close(f(x), (x @ a).astype(np.float32), name="autodiff fwd")


def test_grad_matches_dense(workload):
    a, x = workload
    f = linear_map(SellMatrix.from_dense(a))
    t = jnp.linspace(0.5, 1.5, a.shape[1], dtype=jnp.float32)

    def loss(xx):
        return jnp.sum(f(xx) * t)

    g = jax.grad(loss)(jnp.asarray(x))
    g_ref = a @ np.asarray(t, dtype=np.float64)    # d(sum(y*t))/dx = A t
    assert_close(g, g_ref.astype(np.float32), name="autodiff grad")


def test_grad_under_jit_spmm(workload):
    a, _ = workload
    xb = generators.random_sparse_batch(3, 384, density=0.5, seed=13)
    f = linear_map(SellMatrix.from_dense(a))

    @jax.jit
    def loss(xx):
        return jnp.sum(f(xx) ** 2)

    g = jax.grad(loss)(jnp.asarray(xb))
    y = xb.astype(np.float64) @ a.astype(np.float64)
    g_ref = 2.0 * y @ a.astype(np.float64).T
    assert_close(g, g_ref.astype(np.float32), atol=2e-3,
                 name="autodiff jit spmm grad")


def test_csr_transpose_round_trip(workload):
    a, _ = workload
    c = CsrMatrix.from_dense(a)
    ct = c.transpose()
    assert ct.shape == (a.shape[1], a.shape[0])
    np.testing.assert_array_equal(ct.to_dense(), a.T)
    np.testing.assert_array_equal(ct.transpose().to_dense(), a)


def test_no_densify_path_via_csr(workload):
    a, x = workload
    c = CsrMatrix.from_dense(a)
    f = linear_map(SellMatrix.from_csr(c), csr=c)
    g = jax.grad(lambda xx: jnp.sum(f(xx)))(jnp.asarray(x))
    assert_close(g, a.astype(np.float64).sum(axis=1).astype(np.float32),
                 name="autodiff csr grad")


def test_shape_mismatch_rejected(workload):
    a, _ = workload
    s = SellMatrix.from_dense(a)
    with pytest.raises(ValueError, match="transpose"):
        linear_map(s, fmt_t=s)
