"""Serving lane: reduced-precision value storage + tuned step geometry.

A serving deployment packs its weight matrices once and multiplies them
millions of times, so it can afford two one-time costs this example walks
through:

1. **Value quantization** — ``dtype='int8'`` stores 2 bytes/slot (vs fp32's
   5) with per-output-column scales; ``dtype=bfloat16`` is the middle lane.
   Accumulation stays fp32 in the kernel either way; the error is outside
   the library's 1e-3 contract (~ max|v|/254 * sqrt(col nnz) * E|x| for
   int8 — measured ~6e-2 on a 4096^2/d=0.5 workload), which serving
   workloads routinely accept (BENCH.md 'reduced precision').
2. **On-device geometry autotuning** — ``fmt.tune(x)`` sweeps the Pallas
   step-geometry candidates on the live chip and persists the winner
   (~/.cache/tpusparse/tune.json, keyed by packed layout + device kind),
   so every later process starts at the tuned point. Without a sweep,
   calls use the measured bytes-targeting heuristic (tune.sell_geometry).

Run: python examples/06_serving_quantized_tuned.py [--cpu] [--tune]
(--tune runs the real sweep; ~1 min/candidate cold on the TPU tunnel.)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

from tpusparse.formats.sell import SellMatrix
from tpusparse.testing import generators


def main():
    m = n = 2048
    a = generators.random_sparse_matrix(m, n, density=0.25, seed=0)
    x = generators.random_sparse_vector(m, density=0.5, seed=1)
    y_fp64 = (x.astype(np.float64) @ a.astype(np.float64))

    for dtype, label in [(None, "fp32"), ("bfloat16", "bf16"),
                         ("int8", "int8 + per-column scales")]:
        fmt = SellMatrix.from_dense(a, dtype=dtype)
        y = np.asarray(fmt.spmv(x))
        err = float(np.max(np.abs(y - y_fp64)))
        print(f"{label:>26}: {fmt.device_bytes() / 1e6:5.1f} MB, "
              f"max|err| {err:.2e}")

    fmt = SellMatrix.from_dense(a, dtype="int8")
    if "--tune" in sys.argv:
        print(fmt.tune(x))          # sweeps + persists; spmv now uses it
    else:
        nb, nt, w, _ = fmt.vals.shape
        from tpusparse import tune

        print("heuristic geometry (windows/step, col-groups/step):",
              tune.sell_geometry(nt, nb, w, itemsize=1))
    print("serving call:", np.asarray(fmt.spmv(x))[:4])


if __name__ == "__main__":
    main()
