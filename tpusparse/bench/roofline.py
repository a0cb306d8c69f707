"""Roofline accounting: speed-of-light nnz/s per format.

SURVEY.md §6: every kernel is HBM-bound at these sizes, so the speed of light
is ``HBM_BW / bytes-per-nnz for the format actually used`` — counting *actual*
bytes per format matters, because at density 0.5 a bitmap format only moves
~2x fewer bytes than dense (SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

from typing import Any

# Published per-chip HBM bandwidth (GB/s). The bench validated ~850 GB/s
# streaming on this chip (tpu v5e) with a dense fp32 GEMV.
HBM_GBPS = {
    "tpu v5e": 819.0,
    "tpu v5": 819.0,     # axon reports "TPU v5 lite"
    "tpu v4": 1228.0,
    "tpu v5p": 2765.0,
    "tpu v6e": 1640.0,
    "cpu": 50.0,          # placeholder for interpret-mode runs
}


def detect_hbm_gbps() -> float:
    import jax

    d = jax.devices()[0]
    kind = getattr(d, "device_kind", "").lower()
    # longest key first: "tpu v5" must not shadow "tpu v5p" (2765 GB/s)
    for key in sorted(HBM_GBPS, key=len, reverse=True):
        if key in kind:
            return HBM_GBPS[key]
    if d.platform == "cpu":
        return HBM_GBPS["cpu"]
    return 819.0


def format_bytes(fmt: Any) -> int:
    """Total device bytes a kernel must stream to read this format once."""
    import numpy as np

    if hasattr(fmt, "device_bytes"):
        return int(fmt.device_bytes())
    if hasattr(fmt, "shape"):  # bare dense array
        return int(np.prod(fmt.shape)) * fmt.dtype.itemsize
    import jax

    return sum(int(np.prod(l.shape)) * l.dtype.itemsize
               for l in jax.tree_util.tree_leaves(fmt))


def roofline_fraction(bytes_moved: int, seconds: float,
                      hbm_gbps: float | None = None) -> float:
    """Achieved fraction of the HBM speed-of-light for this byte count."""
    if hbm_gbps is None:
        hbm_gbps = detect_hbm_gbps()
    sol_seconds = bytes_moved / (hbm_gbps * 1e9)
    return sol_seconds / seconds
