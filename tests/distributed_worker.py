"""Worker for the 2-process jax.distributed test (test_launch.py).

Run as: python tests/distributed_worker.py <port> <process_id>

Each process owns 2 virtual CPU devices; together they form a 4-device
global mesh spanning 2 OS processes — the real multi-controller path the
reference never had (SURVEY.md §2.4 "multi-host launcher").
"""

import os
import sys


def main() -> int:
    port, pid = sys.argv[1], int(sys.argv[2])
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    import jax

    jax.config.update("jax_platforms", "cpu")

    from tpusparse.parallel import launch

    # the launcher under test: must run before anything touches devices
    launch.initialize(coordinator_address=f"127.0.0.1:{port}",
                      num_processes=2, process_id=pid)
    launch.initialize()                       # idempotent re-call
    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == pid

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tpusparse.formats.sell import SellMatrix
    from tpusparse.parallel import spmv_sharded
    from tpusparse.parallel.sparse import sell_spmm_sharded
    from tpusparse.testing import generators, reference

    m = n = 512
    mesh = launch.global_mesh()
    assert mesh.devices.size == 4

    # every host generates the same seeded global operands (tester
    # semantics: one logical global matrix) — host_local_matrix slabs are
    # cross-checked against the full matrix here
    a = generators.random_sparse_matrix(m, n, density=0.5, seed=3)
    x = generators.random_sparse_vector(m, density=0.5, seed=3)
    y_ref = reference.sgemv_cpu(x, a)
    slab = launch.host_local_matrix(m, n, density=0.5, seed=3, partition="n",
                                    process_index=pid, process_count=2)
    np.testing.assert_array_equal(slab, a[:, pid * (n // 2):(pid + 1) * (n // 2)])

    def gmake(arr, spec):
        s = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(arr.shape, s,
                                            lambda idx: arr[idx])

    def check(y, name):
        for sh in y.addressable_shards:
            got = np.asarray(sh.data, dtype=np.float64)
            want = np.asarray(y_ref[sh.index], dtype=np.float64)
            err = float(np.max(np.abs(got - want))) if got.size else 0.0
            assert err <= 1e-3, f"{name}: max|err|={err:.3e}"

    for part, a_spec, x_spec in [("n", P(None, "n"), P()),
                                 ("m", P("n", None), P("n"))]:
        y = spmv_sharded(gmake(a, a_spec), gmake(x, x_spec),
                         mesh=mesh, partition=part)
        check(y, f"dense/{part}")

    s = SellMatrix.from_dense(a)
    sg = SellMatrix(gmake(np.asarray(s.idx), P("n")),
                    gmake(np.asarray(s.vals), P("n")),
                    s.shape, s.padded, s.w, s.nnz)
    y = sell_spmm_sharded(sg, gmake(x, P()), mesh, "n")
    check(y, "sell/n")

    print(f"WORKER-OK {pid}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
