from tpusparse.parallel.mesh import make_mesh, default_mesh  # noqa: F401
from tpusparse.parallel.partition import (  # noqa: F401
    spmv_sharded,
    Partition,
)
from tpusparse.parallel.launch import (  # noqa: F401
    initialize,
    global_mesh,
    process_slab,
    host_local_matrix,
)
