"""Multi-chip SpMV over a device mesh (runs on a virtual CPU mesh too).

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python examples/03_multichip.py --cpu
On a real pod slice, drop --cpu; on multi-host, call
tpusparse.parallel.initialize() first (see parallel/launch.py).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import numpy as np

from tpusparse.formats.sell import SellMatrix
from tpusparse.parallel import make_mesh, spmv_sharded
from tpusparse.parallel.sparse import sell_spmm_sharded
from tpusparse.testing import generators, reference


def main():
    d = len(jax.devices())
    print(f"{d} devices: {jax.devices()}")
    m = n = 512 * d
    a = generators.random_sparse_matrix(m, n, density=0.3, seed=0)
    x = generators.random_sparse_vector(m, density=0.5, seed=1)
    y_ref = reference.sgemv_cpu(x, a)

    mesh = make_mesh({"n": d})
    s = SellMatrix.from_dense(a)
    for partition in ("n", "m", "ring"):
        y = sell_spmm_sharded(s, x, mesh, partition=partition)
        err = np.abs(np.asarray(y) - y_ref).max()
        print(f"sell[{partition}]  max|err| = {err:.2e}")

    y = spmv_sharded(a, x, mesh=mesh, partition="ring")
    print(f"dense[ring] max|err| = {np.abs(np.asarray(y) - y_ref).max():.2e}")


if __name__ == "__main__":
    main()
