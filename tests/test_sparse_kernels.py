"""Sparse kernel parity vs the dense oracle (reference tolerance 1e-3)."""

import numpy as np
import pytest

from tests.conftest import assert_close
from tpusparse.formats.bell import BellMatrix
from tpusparse.formats.ell import EllMatrix
from tpusparse.testing import generators, reference


@pytest.fixture(scope="module", params=["uniform", "powerlaw", "blocks"])
def workload(request):
    a = generators.random_sparse_matrix(
        512, 384, density=0.4, seed=21, distribution=request.param)
    x = generators.random_sparse_vector(512, density=0.5, seed=21)
    return a, x, reference.sgemv_cpu(x, a)


def test_ell_spmv(workload):
    a, x, y_ref = workload
    assert_close(EllMatrix.from_dense(a).spmv(x), y_ref, name="ell_spmv")


def test_ell_spmm(workload):
    a, x, _ = workload
    xb = generators.random_sparse_batch(4, 512, density=0.5, seed=22)
    y_ref = reference.sgemm_cpu(xb, a)
    assert_close(EllMatrix.from_dense(a).spmm(xb), y_ref, name="ell_spmm")


@pytest.mark.parametrize("block_m", [128, 256, 512])
def test_bell_spmv(workload, block_m):
    a, x, y_ref = workload
    b = BellMatrix.from_dense(a, block_m=block_m)
    assert_close(b.spmv(x), y_ref, name=f"bell_spmv[bm={block_m}]")


def test_bell_spmm(workload):
    a, x, _ = workload
    xb = generators.random_sparse_batch(8, 512, density=0.5, seed=23)
    y_ref = reference.sgemm_cpu(xb, a)
    b = BellMatrix.from_dense(a, block_m=256)
    assert_close(b.spmm(xb), y_ref, name="bell_spmm")


def test_bell_dense_matrix():
    # fully dense A: w == block_m, format degenerates to dense + bitmap
    a = np.random.default_rng(0).uniform(-1, 1, (256, 128)).astype(np.float32)
    x = generators.random_sparse_vector(256, density=0.5, seed=1)
    b = BellMatrix.from_dense(a, block_m=256)
    assert b.w == 256
    assert_close(b.spmv(x), reference.sgemv_cpu(x, a), name="bell_dense")


def test_bell_empty_matrix():
    a = np.zeros((256, 128), np.float32)
    x = generators.random_sparse_vector(256, density=0.5, seed=1)
    b = BellMatrix.from_dense(a, block_m=256)
    y = np.asarray(b.spmv(x))
    np.testing.assert_array_equal(y, np.zeros(128, np.float32))


def test_ops_dispatch(workload):
    from tpusparse import spmv

    a, x, y_ref = workload
    assert_close(spmv(BellMatrix.from_dense(a, block_m=256), x), y_ref,
                 name="ops.spmv[bell]")


def test_sell_spmv(workload):
    from tpusparse.formats.sell import SellMatrix

    a, x, y_ref = workload
    s = SellMatrix.from_dense(a)
    assert_close(s.spmv(x), y_ref, name="sell_spmv")
    assert s.w % 8 == 0


def test_sell_spmm(workload):
    from tpusparse.formats.sell import SellMatrix

    a, x, _ = workload
    xb = generators.random_sparse_batch(3, 512, density=0.5, seed=24)
    y_ref = reference.sgemm_cpu(xb, a)
    assert_close(SellMatrix.from_dense(a).spmm(xb), y_ref, name="sell_spmm")


def test_sell_window_step_degrade(workload):
    # nt=4 at M=512; windows_per_step must degrade from 16 to 4 cleanly
    from tpusparse.formats.sell import SellMatrix
    from tpusparse.kernels.sell_spmv import sell_spmm_padded

    a, x, y_ref = workload
    s = SellMatrix.from_dense(a)
    import jax.numpy as jnp
    out = sell_spmm_padded(s.idx, s.vals, jnp.asarray(x)[None, :], w=s.w,
                           windows_per_step=16)
    assert_close(out[0, :a.shape[1]], y_ref, name="sell_degrade")


def test_bsr_spmv_blocks():
    from tpusparse.formats.bsr import BsrMatrix

    a = generators.random_sparse_matrix(512, 384, density=0.3, seed=7,
                                        distribution="blocks", block=128)
    x = generators.random_sparse_vector(512, density=0.5, seed=7)
    b = BsrMatrix.from_dense(a, block_m=128)
    assert_close(b.spmv(x), reference.sgemv_cpu(x, a), name="bsr_spmv")


def test_bsr_spmm_and_empty_group():
    from tpusparse.formats.bsr import BsrMatrix

    a = generators.random_sparse_matrix(512, 384, density=0.3, seed=7,
                                        distribution="blocks", block=128)
    a[:, :128] = 0  # empty output group must still produce zeros
    xb = generators.random_sparse_batch(5, 512, density=0.5, seed=8)
    b = BsrMatrix.from_dense(a, block_m=256)
    assert_close(b.spmm(xb), reference.sgemm_cpu(xb, a), name="bsr_spmm")


def test_binned_sell_powerlaw():
    from tpusparse.formats.binned import BinnedSellMatrix
    from tpusparse.formats.sell import SellMatrix

    a = generators.random_sparse_matrix(512, 640, density=0.25, seed=31,
                                        distribution="powerlaw")
    x = generators.random_sparse_vector(512, density=0.5, seed=31)
    b = BinnedSellMatrix.from_dense(a)
    assert_close(b.spmv(x), reference.sgemv_cpu(x, a), name="binned_spmv")
    # binning must beat flat SELL's global-max padding on skewed matrices
    flat = SellMatrix.from_dense(a)
    assert b.device_bytes() < 0.6 * flat.device_bytes()


def test_binned_sell_uniform_roundtrip():
    from tpusparse.formats.binned import BinnedSellMatrix

    a = generators.random_sparse_matrix(256, 384, density=0.5, seed=2)
    np.testing.assert_array_equal(BinnedSellMatrix.from_dense(a).to_dense(), a)


def test_binned_sell_spmm():
    from tpusparse.formats.binned import BinnedSellMatrix

    a = generators.random_sparse_matrix(512, 640, density=0.25, seed=31,
                                        distribution="powerlaw")
    xb = generators.random_sparse_batch(3, 512, density=0.5, seed=1)
    b = BinnedSellMatrix.from_dense(a)
    assert_close(b.spmm(xb), reference.sgemm_cpu(xb, a), name="binned_spmm")


def test_asp_window_skip():
    from tpusparse.kernels.asp_spmv import AspMatrix

    a = generators.random_sparse_matrix(512, 640, density=0.5, seed=3)
    x = generators.random_sparse_vector(512, density=0.5, seed=3)
    x2 = x.copy()
    x2[0:128] = 0
    x2[256:384] = 0
    m = AspMatrix.from_dense(a)
    assert len(m.plan(x2)) == 2  # skips the two zeroed windows
    assert_close(m.spmv(x), reference.sgemv_cpu(x, a), name="asp_dense_x")
    assert_close(m.spmv(x2), reference.sgemv_cpu(x2, a), name="asp_struct_x")
    assert np.abs(np.asarray(m.spmv(np.zeros(512, np.float32)))).max() == 0
    xb = generators.random_sparse_batch(3, 512, density=0.5, seed=4)
    assert_close(m.spmm(xb), reference.sgemm_cpu(xb, a), name="asp_spmm")


def test_sell_bf16_storage(workload):
    """Reduced-precision value storage (serving): looser tolerance."""
    import jax.numpy as jnp
    from tpusparse.formats.sell import SellMatrix

    a, x, y_ref = workload
    s = SellMatrix.from_dense(a, dtype=jnp.bfloat16)
    assert np.dtype(s.vals.dtype).itemsize == 2
    assert_close(s.spmv(x), y_ref, atol=5e-2, name="sell_bf16")


def test_sell_mxu_spmm_matches_oracle():
    """The decompress-to-dense study kernel (kernels/sell_mxu_spmm.py) —
    covered here so the additive-scatter invariant (pad slots alias offset
    0 and must ADD zero, not overwrite) can't regress silently."""
    import jax.numpy as jnp

    from tpusparse.formats.sell import SellMatrix
    from tpusparse.kernels.sell_mxu_spmm import sell_mxu_spmm_padded

    a = generators.random_sparse_matrix(384, 256, density=0.2, seed=61)
    a[0, :] = 1.0          # guarantee c=0 entries (slot-0/pad collision bait)
    s = SellMatrix.from_dense(a)
    for b in (1, 3, 8):
        xb = generators.random_sparse_batch(b, 384, density=0.5, seed=61)
        y = np.asarray(sell_mxu_spmm_padded(
            s.idx, s.vals, jnp.asarray(xb), w=s.w))[:b, :256]
        y_ref = np.stack([reference.sgemv_cpu(xb[i], a) for i in range(b)])
        assert_close(y, y_ref, name=f"sell_mxu b={b}")


def test_bsell_scan_path(monkeypatch):
    """Force the TCSR sell tier through the bsell SCAN shape (the huge-N*B
    fallback with first-visit output init) by shrinking the wide-path VMEM
    budget to zero."""
    from tpusparse.formats.tcsr import TcsrMatrix
    from tpusparse.kernels import bsell_spmv

    from tests.test_tcsr import _blocks_matrix

    monkeypatch.setattr(bsell_spmv, "_WIDE_VMEM_LIMIT", 0)
    a = _blocks_matrix(0.4, seed=63)          # partial fill -> SELL tier
    f = TcsrMatrix.from_dense(a)
    assert f.n_sell > 0
    x = generators.random_sparse_vector(a.shape[0], density=0.5, seed=63)
    assert_close(f.spmv(x), reference.sgemv_cpu(x, a), name="bsell scan")
    xb = generators.random_sparse_batch(2, a.shape[0], density=0.5, seed=63)
    y_ref = np.stack([reference.sgemv_cpu(xb[i], a) for i in range(2)])
    assert_close(f.spmm(xb), y_ref, name="bsell scan spmm")


def test_rsell_vmem_guard(monkeypatch):
    # past the comfort zone but under the cap: runs with a raised
    # per-kernel vmem limit; past the hard cap: refuses
    from tpusparse.formats.rsell import RsellMatrix
    from tpusparse.kernels import rsell_spmv

    a = generators.random_sparse_matrix(256, 256, density=0.2, seed=65)
    x = generators.random_sparse_vector(256, density=0.5, seed=65)
    f = RsellMatrix.from_dense(a)
    monkeypatch.setattr(rsell_spmv, "_WIDE_VMEM_LIMIT", 0)
    assert_close(f.spmv(x), reference.sgemv_cpu(x, a), name="rsell raised")
    monkeypatch.setattr(rsell_spmv, "_WIDE_VMEM_CAP", 0)
    a2 = generators.random_sparse_matrix(384, 384, density=0.2, seed=66)
    with pytest.raises(ValueError, match="VMEM"):   # fresh shape: no jit cache
        RsellMatrix.from_dense(a2).spmv(
            generators.random_sparse_vector(384, density=0.5, seed=66))


def test_sell_int8_storage(workload):
    """int8 value storage with per-column scales (serving): 2 bytes/slot."""
    import jax.numpy as jnp

    from tpusparse.formats.sell import SellMatrix

    a, x, y_ref = workload
    s = SellMatrix.from_dense(a, dtype="int8")
    assert np.asarray(s.vals).dtype == np.int8 and s.scales is not None
    f32 = SellMatrix.from_dense(a)
    assert s.device_bytes() < 0.45 * f32.device_bytes()
    # dequantized round-trip within quantization error
    assert float(np.abs(s.to_dense() - a).max()) < \
        float(np.abs(a).max()) / 127 + 1e-6
    assert_close(s.spmv(x), y_ref, atol=1e-1, name="sell_int8")
    xb = generators.random_sparse_batch(2, 512, density=0.5, seed=29)
    assert_close(s.spmm(xb), reference.sgemm_cpu(xb, a), atol=1e-1,
                 name="sell_int8_spmm")
