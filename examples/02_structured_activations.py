"""AWSP: weight + activation sparsity with a precomputed window-group plan.

A serving system with a fixed routing mask (MoE, padded batches, block-ReLU)
computes the plan once per mask; the kernel then never fetches the values of
dead window groups.

Run: python examples/02_structured_activations.py [--cpu]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

from tpusparse.formats.awsp import AwspMatrix
from tpusparse.testing import generators, reference


def main():
    m = n = 4096
    a = generators.random_sparse_matrix(m, n, density=0.5, seed=0)
    fmt = AwspMatrix.from_dense(a, g=8)        # skip granularity: 1024 rows

    x = generators.random_sparse_vector(m, density=0.5, seed=1).copy()
    x[1024:] = 0                               # only the first quarter live

    plan = fmt.plan(x)                         # host-side, O(M)
    total = fmt.vals.shape[1] // fmt.g - 1
    print(f"plan: {plan.size}/{total} window groups active")
    print(f"traffic: {fmt.device_bytes(x) / 1e6:.1f} MB of "
          f"{fmt.device_bytes() / 1e6:.1f} MB")

    y = fmt._run(x[None, :], plan=plan)[0]     # reuse the plan across calls
    err = np.abs(np.asarray(y) - reference.sgemv_cpu(x, a)).max()
    print(f"max|err| = {err:.2e} (contract: <= 1e-3)")


if __name__ == "__main__":
    main()
