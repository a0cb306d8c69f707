"""Multi-host launch helpers (single-process semantics + slab math)."""

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


def test_initialize_late_multihost_raises():
    """Explicit multi-host args after backend init must fail loudly, not
    silently degrade every host to single-process."""
    import jax

    jax.devices()                    # ensure backend is up
    with pytest.raises(RuntimeError, match="before any JAX"):
        launch.initialize(coordinator_address="127.0.0.1:9999",
                          num_processes=2, process_id=0)
