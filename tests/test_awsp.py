"""AWSP (SELL + activation window-skip) parity and plan behavior."""

import numpy as np
import pytest

from tests.conftest import assert_close
from tpusparse.formats.awsp import AwspMatrix
from tpusparse.testing import generators, reference


@pytest.fixture(scope="module", params=["uniform", "powerlaw", "blocks"])
def workload(request):
    a = generators.random_sparse_matrix(
        512, 384, density=0.4, seed=31, distribution=request.param)
    return a


def test_round_trip(workload):
    a = workload
    np.testing.assert_array_equal(AwspMatrix.from_dense(a).to_dense(), a)


def test_spmv_iid(workload):
    a = workload
    x = generators.random_sparse_vector(512, density=0.5, seed=31)
    y_ref = reference.sgemv_cpu(x, a)
    assert_close(AwspMatrix.from_dense(a).spmv(x), y_ref, name="awsp_spmv")


def test_spmm(workload):
    a = workload
    xb = generators.random_sparse_batch(4, 512, density=0.5, seed=32)
    y_ref = reference.sgemm_cpu(xb, a)
    assert_close(AwspMatrix.from_dense(a).spmm(xb), y_ref, name="awsp_spmm")


def test_structured_activation_skips_windows(workload):
    """Only the first 128-row window of X is live -> plan has 1 real entry."""
    a = workload
    x = np.zeros(512, np.float32)
    x[:128] = generators.random_sparse_vector(128, density=0.5, seed=33)
    f = AwspMatrix.from_dense(a, g=1)          # window-granular skipping
    plan = f.plan(x)
    assert plan.tolist() == [0]
    # 1 active window of 4 -> a quarter of the traffic
    assert f.device_bytes(x) * 4 <= f.device_bytes()
    assert_close(f.spmv(x), reference.sgemv_cpu(x, a), name="awsp_structured")


def test_group_skip_default_g(workload):
    """At g=2 a dead 256-row group is skipped; live groups still compute."""
    a = workload
    x = generators.random_sparse_vector(512, density=0.5, seed=36)
    x = x.copy()
    x[256:] = 0                                # second 2-window group dead
    f = AwspMatrix.from_dense(a, g=2)
    plan = f.plan(x)
    assert 0 in plan and 1 not in plan
    assert_close(f.spmv(x), reference.sgemv_cpu(x, a), name="awsp_group")


def test_all_zero_activation(workload):
    a = workload
    x = np.zeros(512, np.float32)
    f = AwspMatrix.from_dense(a)
    y = np.asarray(f.spmv(x))
    assert y.shape == (384,)
    np.testing.assert_array_equal(y, 0)


def test_plan_exact_size(workload):
    """Plans are exact-sized: padded zero-group entries cost real DMA."""
    f = AwspMatrix.from_dense(workload, g=1)
    x = generators.random_sparse_vector(512, density=0.5, seed=34)
    assert f.plan(x).size == 4                 # all 4 windows live on iid x


def test_unaligned_shape():
    a = generators.random_sparse_matrix(300, 200, density=0.3, seed=35)
    x = generators.random_sparse_vector(300, density=0.5, seed=35)
    f = AwspMatrix.from_dense(a)
    assert_close(f.spmv(x), reference.sgemv_cpu(x, a), name="awsp_unaligned")
