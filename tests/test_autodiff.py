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


# ---------------------- trainable (value gradients) -----------------------


@pytest.fixture(scope="module")
def train_setup():
    from tpusparse.autodiff import trainable_linear

    a = generators.random_sparse_matrix(384, 256, density=0.25, seed=21)
    csr = CsrMatrix.from_dense(a)
    apply, vals0, mask = trainable_linear(csr)
    return a, apply, vals0, mask


def test_trainable_forward(train_setup):
    a, apply, vals0, _ = train_setup
    x = generators.random_sparse_vector(384, density=0.5, seed=22)
    assert_close(apply(vals0, x), (x @ a).astype(np.float32),
                 name="trainable fwd")


def test_trainable_both_grads_match_dense(train_setup):
    a, apply, vals0, mask = train_setup
    x = jnp.asarray(generators.random_sparse_vector(384, density=0.5,
                                                    seed=23))
    t = jnp.linspace(-1.0, 1.0, a.shape[1], dtype=jnp.float32)

    @jax.jit
    def loss(v, xx):
        return jnp.sum(apply(v, xx) * t)

    dv, dx = jax.grad(loss, argnums=(0, 1))(vals0, x)
    # dense oracle: dL/dA = outer(x, t) on the mask; dL/dx = A t
    assert_close(dx, (a.astype(np.float64)
                      @ np.asarray(t, np.float64)).astype(np.float32),
                 name="trainable dx")
    # pad slots must carry exactly zero gradient
    assert float(jnp.abs(jnp.where(mask, 0.0, dv)).max()) == 0.0
    # real slots: scatter dv back to dense coordinates and compare
    from tpusparse.formats.sell import SellMatrix

    s = SellMatrix.from_dense(a)
    da = SellMatrix(np.asarray(s.idx), np.asarray(dv), s.shape, s.padded,
                    s.w, s.nnz).to_dense()
    da_ref = np.where(a != 0, np.outer(np.asarray(x, np.float64),
                                       np.asarray(t, np.float64)), 0.0)
    assert_close(da, da_ref.astype(np.float32), name="trainable dvals")


def test_trainable_step_changes_backward_transpose(train_setup):
    """dx must see the LIVE values, not the packing-time snapshot."""
    a, apply, vals0, mask = train_setup
    x = jnp.asarray(generators.random_sparse_vector(384, density=0.5,
                                                    seed=24))
    vals2 = vals0 * 2.0
    dx1 = jax.grad(lambda xx: jnp.sum(apply(vals0, xx)))(x)
    dx2 = jax.grad(lambda xx: jnp.sum(apply(vals2, xx)))(x)
    assert_close(dx2, 2.0 * dx1, name="live transpose values")


def test_trainable_spmm_grads(train_setup):
    a, apply, vals0, mask = train_setup
    xb = jnp.asarray(generators.random_sparse_batch(3, 384, density=0.5,
                                                    seed=25))

    def loss(v, xx):
        return jnp.sum(apply(v, xx) ** 2)

    dv, dx = jax.grad(loss, argnums=(0, 1))(vals0, xb)
    y = np.asarray(xb, np.float64) @ a.astype(np.float64)
    g = 2.0 * y
    assert_close(dx, (g @ a.astype(np.float64).T).astype(np.float32),
                 atol=2e-3, name="trainable spmm dx")
    from tpusparse.formats.sell import SellMatrix

    s = SellMatrix.from_dense(a)
    da = SellMatrix(np.asarray(s.idx), np.asarray(dv), s.shape, s.padded,
                    s.w, s.nnz).to_dense()
    da_ref = np.where(a != 0, np.asarray(xb, np.float64).T @ g, 0.0)
    assert_close(da, da_ref.astype(np.float32), atol=2e-3,
                 name="trainable spmm dvals")


def test_sharded_linear_map_grads():
    from tpusparse.autodiff import linear_map_sharded
    from tpusparse.parallel.mesh import make_mesh

    mesh = make_mesh({"n": 8}, jax.devices()[:8])
    a = generators.random_sparse_matrix(1024, 2048, density=0.25, seed=31)
    c = CsrMatrix.from_dense(a)
    s = SellMatrix.from_csr(c)
    s_t = SellMatrix.from_csr(c.transpose())
    x = jnp.asarray(generators.random_sparse_vector(1024, density=0.5,
                                                    seed=32))
    for part in ["n", "m", "ring"]:
        f = linear_map_sharded(s, s_t, mesh, part)
        assert_close(f(x), (np.asarray(x, np.float64)
                            @ a.astype(np.float64)).astype(np.float32),
                     name=f"sharded fwd[{part}]")
        g = jax.grad(lambda xx: jnp.sum(f(xx)))(x)
        assert_close(g, a.astype(np.float64).sum(axis=1).astype(np.float32),
                     name=f"sharded grad[{part}]")
