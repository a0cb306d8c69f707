"""Sparse-weight training: exact gradients through the packed SELL layout.

The standard pruned-training regime: the sparsity MASK is frozen, the
surviving values train. ``trainable_linear`` packs the matrix once and
returns an ``apply(vals, x)`` whose VJP is exact in both arguments —
``d/dvals`` is a closed-form in-window gather (masked, so pad slots get
exactly zero gradient) and ``d/dx`` runs through a transpose-packed layout
fed by the LIVE values. A whole training step jits; the forward/backward
both move format bytes, not dense bytes.

Run: python examples/07_sparse_training.py [--cpu]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

from tpusparse import trainable_linear
from tpusparse.formats.csr import CsrMatrix
from tpusparse.testing import generators


def main():
    m, n = 1024, 512
    rng = np.random.default_rng(0)
    a0 = generators.random_sparse_matrix(m, n, density=0.1, seed=0)
    apply, params, masks, resync = trainable_linear(CsrMatrix.from_dense(a0))
    mask = masks["vals"]
    print(f"trainable slots: {int(mask.sum())} of {mask.size} "
          f"({mask.mean() * 100:.0f}% — the rest are layout padding; "
          f"the transpose twin doubles value memory)")

    # regression target from a hidden dense teacher
    teacher = rng.standard_normal((m, n)).astype(np.float32) * 0.1
    xs = generators.random_sparse_batch(32, m, density=0.5, seed=1)
    ys = jnp.asarray(xs @ teacher)
    xs = jnp.asarray(xs)

    @jax.jit
    def step(p, lr):
        def loss_fn(pp):
            return jnp.mean((apply(pp, xs) - ys) ** 2)

        loss, dp = jax.value_and_grad(loss_fn)(p)
        return loss, jax.tree_util.tree_map(lambda v, d: v - lr * d, p, dp)

    for i in range(60):
        loss, params = step(params, jnp.float32(2.0))
        if i % 15 == 0 or i == 59:
            print(f"step {i:3d}: mse {float(loss):.5f}")
    params = resync(params)   # kill ulp drift between the twin layouts

    # gradient-driven updates can never touch pad slots
    off_mask = float(jnp.abs(jnp.where(mask, 0.0, params["vals"])).max())
    print(f"max |pad slot| after training: {off_mask:.1e} (exactly 0.0)")
    assert off_mask == 0.0


if __name__ == "__main__":
    main()
