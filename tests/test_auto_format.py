"""auto_format routes matrices to the format their statistics call for."""

import numpy as np

from tests.conftest import assert_close
from tpusparse import auto_format, matrix_stats, spmv
from tpusparse.testing import generators, reference


def _check(a, fmt_cls_name):
    f = auto_format(a)
    assert type(f).__name__ == fmt_cls_name, type(f).__name__
    x = generators.random_sparse_vector(a.shape[0], density=0.5, seed=3)
    assert_close(spmv(f, x), reference.sgemv_cpu(x, a),
                 name=f"auto[{fmt_cls_name}]")


def test_uniform_mid_density_is_sell():
    a = generators.random_sparse_matrix(512, 384, density=0.4, seed=1)
    _check(a, "SellMatrix")


def test_near_dense_is_asp():
    a = generators.random_sparse_matrix(512, 384, density=0.8, seed=1)
    _check(a, "AspMatrix")


def test_block_structured_is_tcsr():
    a = generators.random_sparse_matrix(512, 384, density=0.3, seed=2,
                                        distribution="blocks")
    s = matrix_stats(a)
    if s["empty_block_frac"] >= 0.4:
        _check(a, "TcsrMatrix")
    else:  # generator produced dense-ish block cover; stats must still agree
        assert type(auto_format(a)).__name__ != "TcsrMatrix"


def test_powerlaw_is_rsell():
    # small skewed matrix: X/Y fit the rsell wide kernel -> per-tile widths
    a = generators.random_sparse_matrix(1024, 512, density=0.15, seed=4,
                                        distribution="powerlaw")
    s = matrix_stats(a)
    assert s["w_global"] >= 1.5 * s["w_typical"]
    _check(a, "RsellMatrix")


def test_skew_falls_back_to_binned_when_rsell_vmem_bound_binds():
    """rsell's wide kernel holds X and Y whole in VMEM; on a giant matrix
    the skew branch must fall back to binned once the batch pushes past
    that budget. Stats are supplied (skew, non-blocky, low density) so only
    the branch under test varies; the matrix is a real 65536^2 CSR that is
    never densified."""
    from tpusparse.formats.csr import CsrMatrix

    n = 65536
    rng = np.random.default_rng(0)
    rows = np.sort(rng.integers(0, n, 200))
    csr = CsrMatrix.from_coo(n, n, rows, rng.integers(0, n, 200),
                             rng.uniform(-1, 1, 200).astype(np.float32))
    stats = dict(density=1e-5, nnz=csr.nnz, empty_block_frac=0.0,
                 w_global=12, w_typical=8.0)
    f1 = auto_format(csr, expect_batch=1, stats=stats)
    assert type(f1).__name__ == "RsellMatrix", type(f1).__name__
    f4 = auto_format(csr, expect_batch=4, stats=stats)
    assert type(f4).__name__ == "BinnedSellMatrix", type(f4).__name__


def test_structured_x_pref_is_awsp():
    a = generators.random_sparse_matrix(512, 384, density=0.4, seed=5)
    f = auto_format(a, expect_structured_x=True)
    assert type(f).__name__ == "AwspMatrix"


def test_stats_shape():
    a = generators.random_sparse_matrix(300, 200, density=0.3, seed=6)
    s = matrix_stats(a)
    assert 0 < s["density"] < 1 and s["nnz"] == int((a != 0).sum())


def test_batched_mid_density_is_asp():
    a = generators.random_sparse_matrix(512, 384, density=0.5, seed=7)
    f = auto_format(a, expect_batch=8)
    assert type(f).__name__ == "AspMatrix"
    xb = generators.random_sparse_batch(8, 512, density=0.5, seed=7)
    from tpusparse import spmm
    assert_close(spmm(f, xb), reference.sgemm_cpu(xb, a), name="auto_spmm")


def test_batched_low_density_still_mxu_path():
    """At B>=4 the gather floor loses at every density (BENCH.md)."""
    a = generators.random_sparse_matrix(512, 384, density=0.1, seed=10)
    f = auto_format(a, expect_batch=8)
    assert type(f).__name__ in ("AspMatrix", "TcsrMatrix")


def test_near_dense_never_routes_to_dia():
    # review r2: the widened banded-first rule admitted a 256^2 d=0.9
    # matrix (511 diagonals, ~2x dense bytes over VPU streams); the
    # dense-bytes ceiling must keep such matrices on the MXU path
    from tpusparse.formats.auto import auto_format
    from tpusparse.formats.dia import DiaMatrix
    from tpusparse.testing import generators

    rnd = generators.random_sparse_matrix(256, 256, density=0.9, seed=7)
    assert not isinstance(auto_format(rnd), DiaMatrix)
