"""Checkpoint/resume of sparse training state (orbax + npz formats).

The format npz persistence (formats/io.py) covers packed matrices; this
covers the TRAINING side: twin-layout params + optimizer state round-trip
through orbax, and a resumed run continues bit-identically."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusparse.autodiff import trainable_linear
from tpusparse.formats.csr import CsrMatrix
from tpusparse.testing import generators


@pytest.fixture(scope="module")
def train_state():
    a = generators.random_sparse_matrix(256, 256, density=0.25, seed=61)
    apply, params, masks, _ = trainable_linear(CsrMatrix.from_dense(a))
    x = jnp.asarray(generators.random_sparse_vector(256, density=0.5,
                                                    seed=62))

    @jax.jit
    def step(p):
        dp = jax.grad(lambda pp: jnp.sum(apply(pp, x) ** 2))(p)
        return jax.tree_util.tree_map(lambda v, d: v - 1e-3 * d, p, dp)

    return apply, params, step, x


def test_orbax_round_trip_and_bitwise_resume(tmp_path, train_state):
    ocp = pytest.importorskip("orbax.checkpoint")

    apply, params, step, x = train_state
    p = step(step(params))
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(tmp_path / "ckpt", p)
    restored = ckptr.restore(tmp_path / "ckpt")
    for k in ("vals", "vals_t"):
        np.testing.assert_array_equal(np.asarray(p[k]),
                                      np.asarray(restored[k]))
    # resuming from the restore continues bit-identically
    np.testing.assert_array_equal(
        np.asarray(step(p)["vals"]), np.asarray(step(restored)["vals"]))
    # ...and the restored params still compute the right product
    np.testing.assert_array_equal(np.asarray(apply(p, x)),
                                  np.asarray(apply(restored, x)))
