"""Sharded-path fuzz: random shapes/densities x partitions on the CPU mesh."""

import numpy as np
import pytest

import jax

from tests.conftest import assert_close
from tpusparse.testing import generators, reference


def _case(i):
    rng = np.random.default_rng(1000 + i)
    d = int(rng.choice([2, 4]))
    m = d * 128 * int(rng.integers(1, 3))
    n = d * 128 * int(rng.integers(1, 3))
    density = float(rng.choice([0.1, 0.3, 0.5]))
    return d, m, n, density, int(rng.integers(0, 1 << 16))


@pytest.mark.parametrize("partition", ["n", "m", "ring", "2d"])
def test_fuzz_sell_sharded(partition):
    from tpusparse.formats.sell import SellMatrix
    from tpusparse.parallel import make_mesh
    from tpusparse.parallel.sparse import sell_spmm_sharded

    for i in range(3):
        d, m, n, density, seed = _case(i)
        a = generators.random_sparse_matrix(m, n, density=density, seed=seed)
        s = SellMatrix.from_dense(a)
        label = f"sell[{partition}] D={d} {m}x{n} d={density}"
        if partition == "2d":
            if d % 2:
                continue
            mesh = make_mesh({"b": 2, "n": d // 2}, jax.devices()[:d])
            xb = generators.random_sparse_batch(4, m, density=0.5,
                                                seed=seed + 1)
            y = sell_spmm_sharded(s, xb, mesh, "2d")
            assert_close(y, reference.sgemm_cpu(xb, a), name=label)
        else:
            mesh = make_mesh({"n": d}, jax.devices()[:d])
            x = generators.random_sparse_vector(m, density=0.5, seed=seed + 1)
            y = sell_spmm_sharded(s, x, mesh, partition)
            assert_close(y, reference.sgemv_cpu(x, a), name=label)


def test_fuzz_bsr_awsp_sharded():
    from tpusparse.formats.awsp import AwspMatrix
    from tpusparse.parallel import make_mesh
    from tpusparse.parallel.sparse import (
        awsp_spmm_sharded, bsr_shard_pack, bsr_spmm_sharded)

    for i in range(2):
        d, m, n, density, seed = _case(10 + i)
        a = generators.random_sparse_matrix(m, n, density=density, seed=seed)
        x = generators.random_sparse_vector(m, density=0.5, seed=seed + 1)
        mesh = make_mesh({"n": d}, jax.devices()[:d])
        y = bsr_spmm_sharded(bsr_shard_pack(a, d), x, mesh)
        assert_close(y, reference.sgemv_cpu(x, a), name=f"bsr D={d} {m}x{n}")
        y2 = awsp_spmm_sharded(AwspMatrix.from_dense(a, g=1), x, mesh)
        assert_close(y2, reference.sgemv_cpu(x, a),
                     name=f"awsp D={d} {m}x{n}")


def test_fuzz_csr_and_bf16_routes():
    import jax.numpy as jnp

    from tpusparse.formats.csr import CsrMatrix
    from tpusparse.formats.sell import SellMatrix

    for i in range(3):
        _, m, n, density, seed = _case(20 + i)
        a = generators.random_sparse_matrix(m, n, density=density, seed=seed)
        x = generators.random_sparse_vector(m, density=0.5, seed=seed + 1)
        y_ref = reference.sgemv_cpu(x, a)
        s = SellMatrix.from_csr(CsrMatrix.from_dense(a))
        assert_close(s.spmv(x), y_ref, name=f"from_csr {m}x{n}")
        sb = SellMatrix.from_dense(a, dtype=jnp.bfloat16)
        assert_close(sb.spmv(x), y_ref, atol=5e-2, name=f"bf16 {m}x{n}")


def test_fuzz_dia_sharded_sym():
    # random symmetric bands, incl. wide offsets that force the desym
    # fallback (mirror past the neighbor slab) and the halo guard
    from tpusparse.formats.dia import DiaMatrix
    from tpusparse.parallel import make_mesh
    from tpusparse.parallel.sparse import dia_spmm_sharded

    for i in range(4):
        rng = np.random.default_rng(2000 + i)
        d = int(rng.choice([2, 4, 8]))
        n = d * 64 * int(rng.integers(1, 3))
        n_off = int(rng.integers(1, 5))
        offs = np.unique(np.concatenate(
            [[0], rng.integers(1, max(2, n // 2), size=n_off)]))
        a = np.zeros((n, n), dtype=np.float32)
        ii, jj = np.indices(a.shape)
        for off in offs:
            band = (ii - jj) == off
            a[band] = rng.normal(size=int(band.sum())).astype(np.float32)
        sym = bool(rng.integers(0, 2))
        if sym:
            a = (a + np.tril(a, -1).T).astype(np.float32)
        m = DiaMatrix.from_dense(a)
        if sym:
            assert m.sym    # mirrored construction must be detected
        mesh = make_mesh({"n": d}, jax.devices()[:d])
        x = generators.random_sparse_vector(n, density=0.5, seed=3000 + i)
        label = f"dia D={d} n={n} offs={offs.tolist()} sym={m.sym}"
        y = dia_spmm_sharded(m, np.asarray(x), mesh, "n")
        assert_close(y, reference.sgemv_cpu(x, a), name=label + " [n]")
        hs = max(max(m.offsets), -min(m.offsets),
                 max(m.offsets) if m.sym else 0)
        if hs <= n // d:
            y = dia_spmm_sharded(m, np.asarray(x), mesh, "halo")
            assert_close(y, reference.sgemv_cpu(x, a), name=label + " [halo]")
