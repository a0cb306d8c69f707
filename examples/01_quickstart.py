"""Quickstart: pack a sparse matrix, run SpMV/SpMM on the attached device.

Run: python examples/01_quickstart.py [--cpu]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

from tpusparse import auto_format, matrix_stats, spmm, spmv
from tpusparse.testing import generators, reference


def main():
    m, n = 2048, 1024
    a = generators.random_sparse_matrix(m, n, density=0.2, seed=0)
    x = generators.random_sparse_vector(m, density=0.5, seed=1)
    xb = generators.random_sparse_batch(4, m, density=0.5, seed=2)

    print("matrix stats:", matrix_stats(a))
    fmt = auto_format(a)                       # picks SELL here
    print("auto_format picked:", type(fmt).__name__)

    y = spmv(fmt, x)
    yb = spmm(fmt, xb)
    err = np.abs(np.asarray(y) - reference.sgemv_cpu(x, a)).max()
    errb = np.abs(np.asarray(yb) - reference.sgemm_cpu(xb, a)).max()
    print(f"spmv max|err| = {err:.2e}, spmm max|err| = {errb:.2e} "
          f"(contract: <= 1e-3)")


if __name__ == "__main__":
    main()
