"""Flax SparseLinear layer (tpusparse/nn.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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
    import optax

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
