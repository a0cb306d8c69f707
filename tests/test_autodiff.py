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
    apply, params, masks, resync = trainable_linear(csr)
    return a, apply, params, masks, resync


def test_trainable_forward(train_setup):
    a, apply, params, _, _ = train_setup
    x = generators.random_sparse_vector(384, density=0.5, seed=22)
    assert_close(apply(params, x), (x @ a).astype(np.float32),
                 name="trainable fwd")


def _unpack_dense(a, dv):
    from tpusparse.formats.sell import SellMatrix

    s = SellMatrix.from_dense(a)
    return SellMatrix(np.asarray(s.idx), np.asarray(dv), s.shape, s.padded,
                      s.w, s.nnz).to_dense()


def test_trainable_both_grads_match_dense(train_setup):
    a, apply, params, masks, resync = train_setup
    x = jnp.asarray(generators.random_sparse_vector(384, density=0.5,
                                                    seed=23))
    t = jnp.linspace(-1.0, 1.0, a.shape[1], dtype=jnp.float32)

    @jax.jit
    def loss(p, xx):
        return jnp.sum(apply(p, xx) * t)

    dp, dx = jax.grad(loss, argnums=(0, 1))(params, x)
    assert_close(dx, (a.astype(np.float64)
                      @ np.asarray(t, np.float64)).astype(np.float32),
                 name="trainable dx")
    # pad slots of BOTH layouts carry exactly zero gradient
    for k in ("vals", "vals_t"):
        assert float(jnp.abs(jnp.where(masks[k], 0.0, dp[k])).max()) == 0.0
    # real slots: scatter both cotangents back to dense and compare
    da_ref = np.where(a != 0, np.outer(np.asarray(x, np.float64),
                                       np.asarray(t, np.float64)), 0.0)
    assert_close(_unpack_dense(a, dp["vals"]), da_ref.astype(np.float32),
                 name="trainable dvals")
    assert_close(_unpack_dense(a.T, dp["vals_t"]),
                 da_ref.T.astype(np.float32), name="trainable dvals_t")


def test_trainable_tied_layouts_stay_consistent(train_setup):
    """Elementwise SGD keeps the twin layouts consistent to rounding;
    resync() re-ties them exactly."""
    a, apply, params, masks, resync = train_setup
    x = jnp.asarray(generators.random_sparse_vector(384, density=0.5,
                                                    seed=24))

    @jax.jit
    def step(p):
        dp = jax.grad(lambda pp: jnp.sum(apply(pp, x) ** 2))(p)
        return jax.tree_util.tree_map(lambda v, d: v - 1e-2 * d, p, dp)

    p = params
    for _ in range(3):
        p = step(p)
    d1 = _unpack_dense(a, np.asarray(p["vals"]))
    d2 = _unpack_dense(a.T, np.asarray(p["vals_t"])).T
    # copies agree to rounding (XLA may fuse the same elementwise update
    # as FMA in one layout and mul+sub in the other -> ~1 ulp/step drift)
    np.testing.assert_allclose(d1, d2, rtol=1e-5, atol=1e-7)
    # resync re-ties them exactly
    p = resync(p)
    d2 = _unpack_dense(a.T, np.asarray(p["vals_t"])).T
    np.testing.assert_array_equal(d1, d2)
    # and the backward transpose sees the LIVE values
    dx1 = jax.grad(lambda xx: jnp.sum(apply(p, xx)))(x)
    assert_close(dx1, d1.astype(np.float64).sum(axis=1).astype(np.float32),
                 name="live transpose values")


def test_trainable_spmm_grads(train_setup):
    a, apply, params, masks, resync = train_setup
    xb = jnp.asarray(generators.random_sparse_batch(3, 384, density=0.5,
                                                    seed=25))

    def loss(p, xx):
        return jnp.sum(apply(p, xx) ** 2)

    dp, dx = jax.grad(loss, argnums=(0, 1))(params, xb)
    y = np.asarray(xb, np.float64) @ a.astype(np.float64)
    g = 2.0 * y
    assert_close(dx, (g @ a.astype(np.float64).T).astype(np.float32),
                 atol=2e-3, name="trainable spmm dx")
    da_ref = np.where(a != 0, np.asarray(xb, np.float64).T @ g, 0.0)
    assert_close(_unpack_dense(a, dp["vals"]), da_ref.astype(np.float32),
                 atol=2e-3, name="trainable spmm dvals")


def test_sharded_linear_map_2d_and_bad_partition():
    from tpusparse.autodiff import linear_map_sharded
    from tpusparse.parallel.mesh import make_mesh

    a = generators.random_sparse_matrix(1024, 2048, density=0.25, seed=33)
    c = CsrMatrix.from_dense(a)
    s, s_t = SellMatrix.from_csr(c), SellMatrix.from_csr(c.transpose())
    mesh2 = make_mesh({"b": 2, "n": 4}, jax.devices()[:8])
    f = linear_map_sharded(s, s_t, mesh2, "2d")
    xb = jnp.asarray(generators.random_sparse_batch(4, 1024, density=0.5,
                                                    seed=34))
    assert_close(f(xb), (np.asarray(xb, np.float64)
                         @ a.astype(np.float64)).astype(np.float32),
                 name="sharded fwd[2d]")
    g = jax.grad(lambda xx: jnp.sum(f(xx)))(xb)
    g_ref = np.broadcast_to(a.astype(np.float64).sum(axis=1), (4, 1024))
    assert_close(g, g_ref.astype(np.float32), name="sharded grad[2d]")
    with pytest.raises(ValueError, match="partition"):
        linear_map_sharded(s, s_t, mesh2, "diagonal")


def test_linear_map_dense_fallback_guard():
    s = SellMatrix.from_dense(
        generators.random_sparse_matrix(256, 256, density=0.3, seed=35))
    s.shape = (40000, 40000)   # simulate a huge logical shape
    with pytest.raises(ValueError, match="GB"):
        linear_map(s)


def test_trainable_sharded_matches_single_chip():
    from tpusparse.autodiff import trainable_linear, trainable_linear_sharded
    from tpusparse.parallel.mesh import make_mesh

    mesh = make_mesh({"n": 8}, jax.devices()[:8])
    a = generators.random_sparse_matrix(1024, 2048, density=0.2, seed=41)
    csr = CsrMatrix.from_dense(a)
    apply_s, params_s, masks_s, _ = trainable_linear_sharded(csr, mesh)
    apply_1, params_1, _, _ = trainable_linear(csr)
    x = jnp.asarray(generators.random_sparse_vector(1024, density=0.5,
                                                    seed=42))
    assert_close(apply_s(params_s, x), apply_1(params_1, x),
                 name="sharded trainable fwd")

    def loss(ap, p):
        return lambda pp, xx: jnp.sum(ap(pp, xx) ** 2)

    dp_s, dx_s = jax.grad(loss(apply_s, params_s), argnums=(0, 1))(
        params_s, x)
    dp_1, dx_1 = jax.grad(loss(apply_1, params_1), argnums=(0, 1))(
        params_1, x)
    assert_close(dx_s, dx_1, name="sharded trainable dx")
    for k in ("vals", "vals_t"):
        assert_close(dp_s[k], dp_1[k], name=f"sharded trainable d{k}")
    # one jitted SGD step end-to-end over the mesh
    @jax.jit
    def step(p):
        dp = jax.grad(lambda pp: jnp.sum(apply_s(pp, x) ** 2))(p)
        return jax.tree_util.tree_map(lambda v, d: v - 1e-3 * d, p, dp)

    p2 = step(params_s)
    assert np.isfinite(float(jnp.sum(p2["vals"])))


def test_trainable_sharded_unsorted_csr_grads():
    """Regression: legal CSR does not guarantee within-row column order;
    the sharded constructor must sort before deriving its slot planes (it
    once rebuilt them from the caller's unsorted csr while the params came
    from the sorted one — vals grads were silently wrong by O(10))."""
    from tpusparse.autodiff import trainable_linear, trainable_linear_sharded
    from tpusparse.parallel.mesh import make_mesh

    rng = np.random.default_rng(43)
    a = generators.random_sparse_matrix(512, 1024, density=0.2, seed=44)
    csr = CsrMatrix.from_dense(a)
    ci, vals = np.array(csr.col_idx), np.array(csr.values)
    for r in range(len(csr.row_ptr) - 1):
        lo, hi = int(csr.row_ptr[r]), int(csr.row_ptr[r + 1])
        perm = rng.permutation(hi - lo)
        ci[lo:hi] = ci[lo:hi][perm]
        vals[lo:hi] = vals[lo:hi][perm]
    shuffled = CsrMatrix(shape=csr.shape, row_ptr=csr.row_ptr,
                         col_idx=ci, values=vals)
    assert not np.array_equal(ci, csr.col_idx)  # actually unsorted

    mesh = make_mesh({"n": 8}, jax.devices()[:8])
    apply_s, params_s, _, _ = trainable_linear_sharded(shuffled, mesh)
    apply_1, params_1, _, _ = trainable_linear(csr)
    x = jnp.asarray(generators.random_sparse_vector(512, density=0.5,
                                                    seed=45))

    def loss(ap):
        return lambda pp: jnp.sum(ap(pp, x) ** 2)

    assert_close(apply_s(params_s, x), apply_1(params_1, x),
                 name="unsorted sharded fwd")
    dp_s = jax.grad(loss(apply_s))(params_s)
    dp_1 = jax.grad(loss(apply_1))(params_1)
    for k in ("vals", "vals_t"):
        assert_close(dp_s[k], dp_1[k], name=f"unsorted sharded d{k}")
