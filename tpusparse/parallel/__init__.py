from tpusparse.parallel.mesh import make_mesh, default_mesh  # noqa: F401
from tpusparse.parallel.partition import (  # noqa: F401
    spmv_sharded,
    Partition,
)
