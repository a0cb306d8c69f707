"""Flax SparseLinear layer (tpusparse/nn.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytest.importorskip("flax")

from tests.conftest import assert_close
from tpusparse.nn import SparseLinear
from tpusparse.testing import generators


@pytest.fixture(scope="module")
def layer_setup():
    a = generators.random_sparse_matrix(384, 256, density=0.25, seed=51)
    layer = SparseLinear.from_dense(a, use_bias=True)()
    x = generators.random_sparse_vector(384, density=0.5, seed=52)
    variables = layer.init(jax.random.PRNGKey(0), jnp.asarray(x))
    return a, layer, variables, jnp.asarray(x)


def test_forward_matches_dense(layer_setup):
    a, layer, variables, x = layer_setup
    assert_close(layer.apply(variables, x), (np.asarray(x) @ a
                                             ).astype(np.float32),
                 name="nn fwd")


def test_param_shapes_and_masks(layer_setup):
    a, layer, variables, x = layer_setup
    p = variables["params"]
    assert set(p) == {"vals", "vals_t", "bias"}
    assert p["vals"].shape == layer.masks["vals"].shape
    assert p["vals_t"].shape == layer.masks["vals_t"].shape
    assert p["bias"].shape == (a.shape[1],)


def test_trains_under_optax(layer_setup):
    optax = pytest.importorskip("optax")

    a, layer, variables, x = layer_setup
    xs = jnp.asarray(generators.random_sparse_batch(8, 384, density=0.5,
                                                    seed=53))
    target = jnp.asarray(np.tanh(np.asarray(xs) @ a * 0.5))
    tx = optax.sgd(0.5)
    params = variables["params"]
    state = tx.init(params)

    @jax.jit
    def step(p, s):
        def loss_fn(pp):
            return jnp.mean((layer.apply({"params": pp}, xs) - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = tx.update(grads, s, p)
        return loss, optax.apply_updates(p, updates), s

    losses = []
    for _ in range(8):
        loss, params, state = step(params, state)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    # pad slots were never touched by the gradient-driven updates
    for k in ("vals", "vals_t"):
        off = jnp.where(layer.masks[k], 0.0, params[k])
        assert float(jnp.abs(off).max()) == 0.0


def test_resync_preserves_bias(layer_setup):
    """Regression: resync on the layer's param subtree must pass non-twin
    params (bias) through, not drop them — a dropped key breaks the next
    apply/optimizer step mid-training."""
    a, layer, variables, x = layer_setup
    p = dict(variables["params"])
    assert "bias" in p
    p["bias"] = p["bias"] + 1.25
    # perturb vals_t so resync has something to re-tie
    p2 = dict(p)
    p2["vals_t"] = p["vals_t"] + jnp.where(layer.masks["vals_t"], 1e-6, 0.0)
    tied = layer.resync(p2)
    assert set(tied) == set(p)
    np.testing.assert_array_equal(np.asarray(tied["bias"]),
                                  np.asarray(p["bias"]))
    np.testing.assert_array_equal(np.asarray(tied["vals_t"]),
                                  np.asarray(p["vals_t"]))
    y = layer.apply({"params": tied}, x)   # still applies cleanly
    assert np.isfinite(np.asarray(y)).all()


def test_activation_and_instantiation_guard():
    a = generators.random_sparse_matrix(256, 256, density=0.3, seed=54)
    layer = SparseLinear.from_dense(a, activation=jax.nn.relu)()
    x = jnp.asarray(generators.random_sparse_vector(256, density=0.5,
                                                    seed=55))
    v = layer.init(jax.random.PRNGKey(0), x)
    y = np.asarray(layer.apply(v, x))
    assert (y >= 0).all()
    with pytest.raises(TypeError, match="from_csr"):
        SparseLinear()
