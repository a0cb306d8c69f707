"""Scaling-bench smoke: the sharded programs compile and run at each D."""

from tpusparse.bench.scaling import sweep_scaling


def test_weak_dense_n():
    pts = sweep_scaling(mode="weak", kernel="dense", partition="n",
                        base_m=256, base_n=256, device_counts=(1, 2, 4),
                        verbose=False, reps=1, k1=1, k2=2)
    assert [p.devices for p in pts] == [1, 2, 4]
    assert pts[0].efficiency == 1.0
    assert all(p.seconds > 0 for p in pts)
    # weak scaling on the n partition grows the output dim
    assert pts[-1].n == 256 * 4


def test_strong_sell_m():
    pts = sweep_scaling(mode="strong", kernel="sell", partition="m",
                        base_m=512, base_n=256, device_counts=(1, 2),
                        verbose=False, reps=1, k1=1, k2=2)
    assert all(p.m == 512 and p.n == 256 for p in pts)
    assert pts[0].efficiency == 1.0


def test_ring_partition():
    pts = sweep_scaling(mode="weak", kernel="dense", partition="ring",
                        base_m=256, base_n=256, device_counts=(1, 2),
                        verbose=False, reps=1, k1=1, k2=2)
    assert len(pts) == 2


def test_strong_baseline_not_device_one():
    """Efficiency must be relative to the FIRST measured device count."""
    pts = sweep_scaling(mode="strong", kernel="dense", partition="n",
                        base_m=256, base_n=512, device_counts=(2, 4),
                        verbose=False, reps=1, k1=1, k2=2)
    assert pts[0].efficiency == 1.0          # D0=2 is its own baseline
