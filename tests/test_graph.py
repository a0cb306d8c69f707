"""graph.normalized_adjacency + the differentiable GCN pipeline."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpusparse.formats.csr import CsrMatrix
from tpusparse.graph import normalized_adjacency
from tests.conftest import assert_close


def _sym_graph(n, density, seed, weighted=False, with_diag=False):
    rng = np.random.default_rng(seed)
    a = (rng.random((n, n)) < density).astype(np.float64)
    if weighted:
        a *= rng.random((n, n)) + 0.5
    a = np.triu(a, 1)
    a = a + a.T
    if with_diag:
        d = (rng.random(n) < 0.5) * (rng.random(n) + 0.5)
        a[np.arange(n), np.arange(n)] = d
    return a


def _oracle(a, add_self_loops=True):
    ah = a + np.eye(a.shape[0]) if add_self_loops else a.copy()
    deg = ah.sum(axis=1)
    ds = 1.0 / np.sqrt(np.where(deg > 0, deg, 1.0))
    return ds[:, None] * ah * ds[None, :]


@pytest.mark.parametrize("weighted,with_diag", [(False, False), (True, True)])
def test_normalized_adjacency_matches_oracle(weighted, with_diag):
    # with_diag: existing diagonal entries must MERGE with the self-loop,
    # not duplicate (from_coo does not sum duplicates)
    a = _sym_graph(192, 0.05, seed=0, weighted=weighted, with_diag=with_diag)
    got = normalized_adjacency(CsrMatrix.from_dense(
        a.astype(np.float32))).to_dense()
    np.testing.assert_allclose(got, _oracle(a), atol=1e-6)


def test_no_self_loops_and_isolated_nodes():
    a = _sym_graph(128, 0.04, seed=1)
    a[:, 5] = a[5, :] = 0.0                     # isolated node
    got = normalized_adjacency(
        CsrMatrix.from_dense(a.astype(np.float32)),
        add_self_loops=False).to_dense()
    np.testing.assert_allclose(got, _oracle(a, add_self_loops=False),
                               atol=1e-6)
    assert got[5].sum() == 0.0


def test_rejects_rectangular():
    c = CsrMatrix.from_coo(4, 6, np.array([0]), np.array([1]),
                           np.ones(1, np.float32))
    with pytest.raises(ValueError, match="square"):
        normalized_adjacency(c)


def test_gcn_pipeline_trains():
    # the example's pipeline end-to-end at test scale: SBM graph, auto
    # routing, linear_map propagation, 2-layer channels-first GCN
    from tpusparse.autodiff import linear_map
    from tpusparse.formats.auto import auto_format

    rng = np.random.default_rng(2)
    n, f0, hidden = 512, 16, 32
    labels = (np.arange(n) >= n // 2).astype(np.int32)
    ii, jj = np.triu_indices(n, k=1)
    same = labels[ii] == labels[jj]
    keep = rng.random(ii.size) < np.where(same, 24 / n, 2 / n)
    ii, jj = ii[keep], jj[keep]
    csr = CsrMatrix.from_coo(n, n, np.concatenate([ii, jj]),
                             np.concatenate([jj, ii]),
                             np.ones(2 * ii.size, np.float32))
    a_hat = normalized_adjacency(csr)
    fmt = auto_format(a_hat, expect_batch=hidden)
    apply_a = linear_map(fmt, csr=a_hat)

    # propagation matches the float64 oracle through the packed format
    h = (0.1 * rng.normal(size=(f0, n))
         + 0.3 * (rng.normal(size=(f0, 1)) * (2.0 * labels - 1.0))
         ).astype(np.float32)
    dense = a_hat.to_dense().astype(np.float64)
    assert_close(apply_a(jnp.asarray(h)),
                 (h.astype(np.float64) @ dense).astype(np.float32),
                 name="gcn propagate")

    y = jnp.asarray(labels)
    mask = jnp.asarray(rng.random(n) < 0.1)
    params = {
        "w1": jnp.asarray(rng.normal(size=(hidden, f0)).astype(np.float32)
                          * np.sqrt(2.0 / f0)),
        "w2": jnp.asarray(rng.normal(size=(2, hidden)).astype(np.float32)
                          * np.sqrt(2.0 / hidden)),
    }
    h = jnp.asarray(h)

    def forward(p):
        z = jax.nn.relu(p["w1"] @ apply_a(h))
        return p["w2"] @ apply_a(z)

    def loss_fn(p):
        logp = jax.nn.log_softmax(forward(p), axis=0)
        nll = -jnp.take_along_axis(logp, y[None, :], axis=0)[0]
        return jnp.where(mask, nll, 0.0).sum() / mask.sum()

    @jax.jit
    def step(p):
        loss, g = jax.value_and_grad(loss_fn)(p)
        return loss, jax.tree.map(lambda w, gg: w - 0.5 * gg, p, g)

    l0 = float(loss_fn(params))
    for _ in range(40):
        loss, params = step(params)
    acc = float((jnp.argmax(forward(params), axis=0) == y).mean())
    assert float(loss) < 0.5 * l0, (float(loss), l0)
    assert acc > 0.9, acc
