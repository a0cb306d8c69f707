from tpusparse.testing.generators import (  # noqa: F401
    random_sparse_matrix,
    random_sparse_vector,
    random_sparse_batch,
)
from tpusparse.testing.reference import sgemv_cpu, sgemm_cpu  # noqa: F401
from tpusparse.testing.tester import SpmvTester, KernelEntry, CompareReport  # noqa: F401
