"""Step-geometry heuristic + autotuner (tpusparse/tune.py)."""

import numpy as np
import pytest

from tpusparse import tune
from tpusparse.formats.sell import SellMatrix
from tpusparse.testing import generators

from conftest import assert_close


def test_heuristic_reproduces_canonical_choice():
    # canonical 4096^2 d=0.5 layout: nt=nb=32, w~80 fp32 -> the measured-best
    # effective geometry (32, 1) (the r2 retune's 64x1 snaps to 32x1)
    assert tune.sell_geometry(32, 32, 80) == (32, 1)


def test_heuristic_widens_groups_when_step_is_small():
    # low density: w=16 -> a full-column step is only ~320 KB, under the
    # ~1 MB DMA-amortization floor -> column groups widen the step
    tw, jb = tune.sell_geometry(32, 32, 16)
    assert tw == 32 and jb > 1


def test_heuristic_caps_step_by_vmem():
    # enormous w: a single window-group is >6 MB -> tw stays at 1
    tw, jb = tune.sell_geometry(32, 32, 16384)
    assert tw == 1 and jb == 1


def test_heuristic_respects_vmem_at_large_batch():
    # tall narrow layout + wide batch: the x/out blocks scale with batch,
    # so tw must shrink to keep the double-buffered step under scoped VMEM
    tw, jb = tune.sell_geometry(512, 32, 8, batch=32)
    assert tune._step_vmem(tw, jb, 8, 4, 32) <= 12 << 20
    assert 512 % tw == 0


def test_blocks_per_step_rule():
    # 5.1 KB chunks -> wants ~205, capped at 128, snapped to a divisor
    assert tune.blocks_per_step(5120, 1280, cap=128) == 128
    assert tune.blocks_per_step(5120, 8 * 7, cap=128) == 56
    assert tune.blocks_per_step(1 << 21, 64, cap=128) == 1   # big units
    assert tune.blocks_per_step(5120, 1, cap=128) == 1
    # the floor rounds UP to the next divisor: want=3 of 32 -> 4, not 2
    assert tune.blocks_per_step(450_000, 32, cap=13) == 4


def test_heuristic_returns_effective_divisors():
    for nt, nb, w in [(128, 128, 80), (24, 8, 40), (7, 3, 8)]:
        tw, jb = tune.sell_geometry(nt, nb, w)
        assert nt % tw == 0 and nb % jb == 0


def test_candidates_are_deduped_effective_and_include_heuristic():
    cands = tune.sell_candidates(32, 32, 16)
    assert len(set(cands)) == len(cands)
    for tw, jb in cands:
        assert 32 % tw == 0 and 32 % jb == 0
    assert tune.sell_geometry(32, 32, 16) in cands


def test_geometry_plumbs_through_spmv_and_spmm():
    a = generators.random_sparse_matrix(384, 512, density=0.3, seed=3)
    xb = generators.random_sparse_batch(2, 384, density=0.5, seed=4)
    s = SellMatrix.from_dense(a)
    ref = (xb @ a).astype(np.float32)
    for geom in [None, (1, 1), (3, 4)]:
        assert_close(s.spmm(xb, geometry=geom), ref,
                     name=f"sell spmm geom={geom}")
        assert_close(s.spmv(xb[0], geometry=geom), ref[0],
                     name=f"sell spmv geom={geom}")


def test_autotune_measures_caches_and_is_picked_up():
    tune.clear_cache()
    a = generators.random_sparse_matrix(256, 256, density=0.3, seed=5)
    x = generators.random_sparse_vector(256, density=0.5, seed=5)
    s = SellMatrix.from_dense(a)
    cands = [(1, 1), (2, 2)]
    res = s.tune(x, candidates=cands, k1=2, k2=6, reps=1)
    assert res.geometry in cands
    assert len(res.table) == len(cands)
    assert all(sec > 0 for _, sec in res.table)
    key = tune.cache_key(s.vals.shape, np.asarray(s.vals).dtype, 1)
    assert tune.lookup(key) == res.geometry
    # a same-layout matrix resolves to the tuned geometry automatically
    s2 = SellMatrix.from_dense(generators.random_sparse_matrix(
        256, 256, density=0.3, seed=6), w=s.w)
    assert s2.vals.shape == s.vals.shape
    assert s2._geometry(1) == res.geometry
    # ...and the tuned path still computes the right answer
    assert_close(s2.spmv(x), (x @ np.asarray(
        generators.random_sparse_matrix(256, 256, density=0.3, seed=6),
        dtype=np.float64)).astype(np.float32), name="tuned spmv")
    tune.clear_cache()


def test_disk_cache_round_trip():
    tune.clear_cache(disk=True)
    a = generators.random_sparse_matrix(256, 256, density=0.3, seed=9)
    x = generators.random_sparse_vector(256, density=0.5, seed=9)
    s = SellMatrix.from_dense(a)
    res = s.tune(x, candidates=[(1, 1), (2, 1)], k1=2, k2=6, reps=1)
    # simulate a fresh process: wipe memory, allow the disk reload
    tune._CACHE.clear()
    tune._DISK_LOADED = False
    key = tune.cache_key(s.vals.shape, np.asarray(s.vals).dtype, 1)
    assert tune.lookup(key) == res.geometry
    assert s._geometry(1) == res.geometry
    tune.clear_cache(disk=True)


def test_cache_key_distinguishes_batch_and_dtype():
    k1 = tune.cache_key((4, 4, 16, 128), np.float32, 1)
    k2 = tune.cache_key((4, 4, 16, 128), np.float32, 8)
    k3 = tune.cache_key((4, 4, 16, 128), np.int8, 1)
    assert len({k1, k2, k3}) == 3


def test_str_marks_best():
    res = tune.TuneResult(geometry=(2, 1),
                          table=(((1, 1), 2e-6), ((2, 1), 1e-6)))
    text = str(res)
    assert "best" in text and "2 x 1" in text
