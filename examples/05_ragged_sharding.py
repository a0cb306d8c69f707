"""Ragged sharding: a skewed (power-law) matrix over any device count.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python examples/05_ragged_sharding.py --cpu

The classic sharded-SpMV problem on skewed matrices: a few dense columns
force either a global padding width (SELL) or load imbalance (contiguous
shards). RSELL stores per-TILE widths as a chunk stream and assigns COLUMNS
to shards — 'balance' serpentine-deals demand-sorted columns so every shard
streams a near-equal chunk load; no divisibility requirements anywhere.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import numpy as np

from tpusparse.formats.rsell import RsellMatrix, rsell_shard_pack
from tpusparse.formats.sell import SellMatrix
from tpusparse.parallel import make_mesh
from tpusparse.parallel.sparse import rsell_spmm_sharded
from tpusparse.testing import generators, reference


def main():
    d = len(jax.devices())
    mesh = make_mesh({"n": d})
    m, n = 1024, 1280                       # 10 column groups: 10 % d != 0
    a = generators.random_sparse_matrix(m, n, density=0.2, seed=0,
                                        distribution="powerlaw")
    x = generators.random_sparse_vector(m, density=0.5, seed=0)
    y_ref = reference.sgemv_cpu(x, a)

    print("single-chip bytes: "
          f"SELL {SellMatrix.from_dense(a).device_bytes() / 1e6:.1f} MB vs "
          f"RSELL {RsellMatrix.from_dense(a).device_bytes() / 1e6:.1f} MB "
          "(per-tile widths)")

    for assignment in ("sorted", "balance"):
        shards = rsell_shard_pack(a, d, assignment=assignment)
        y = rsell_spmm_sharded(shards, x, mesh)
        err = float(np.abs(np.asarray(y) - y_ref).max())
        print(f"[{assignment:8s}] {shards}  max|err|={err:.2e}")
        assert err <= 1e-3


if __name__ == "__main__":
    main()
