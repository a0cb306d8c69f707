"""§Solver re-measure on the r4 DIA Pallas kernel (VERDICT r4 item 7).

BENCH.md §Solver's 1M CG-iteration numbers predate `kernels/dia_spmv.py`
(the in-VREG shift kernel that replaced the collapsing XLA lowering);
§DIA-kernel explicitly deferred the re-measure. This runs the same
fixed-iteration CG chain (bench/report._solver's operator and timing
recipe) on the current router pick (DIA sym, Pallas kernel) AND on full
DIA storage, so the sym-vs-full traffic ratio is re-grounded on the
kernel that actually ships.

Record: data/solver_remeasure.json. Run (real chip):
  PYTHONPATH=/root/repo python scripts/solver_remeasure.py
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def laplacian(side):
    from tpusparse.formats.csr import CsrMatrix

    n = side * side
    idx = np.arange(n).reshape(side, side)
    rows = [np.arange(n)]
    cols = [np.arange(n)]
    vals = [np.full(n, 4.0, np.float32)]
    for (di, dj) in ((0, 1), (1, 0)):
        src = idx[: side - di, : side - dj].ravel()
        dst = idx[di:, dj:].ravel()
        for (r, c) in ((src, dst), (dst, src)):
            rows.append(r)
            cols.append(c)
            vals.append(np.full(r.size, -1.0, np.float32))
    return CsrMatrix.from_coo(n, n, np.concatenate(rows),
                              np.concatenate(cols), np.concatenate(vals))


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--side", type=int, default=1024)
    p.add_argument("--out", default="data/solver_remeasure.json")
    args = p.parse_args(argv)

    from tpusparse.bench.roofline import format_bytes
    from tpusparse.bench.runner import chain_device_time, run_id
    from tpusparse.formats.dia import DiaMatrix
    from tpusparse.solve import cg

    side = args.side
    n = side * side
    lap = laplacian(side)
    b_host = np.random.default_rng(0).normal(size=n).astype(np.float32)

    rec = {"run": run_id(), "side": side, "n": n, "nnz": int(lap.nnz),
           "rows": []}
    for name, kw in (("dia-sym", dict(symmetric=True)),
                     ("dia-full", dict(symmetric=False))):
        fmt = DiaMatrix.from_csr(lap, **kw)
        fmt_bytes = format_bytes(fmt)
        iter_bytes = fmt_bytes + 7 * n * 4
        fmt_d = jax.device_put(fmt)
        b = jax.device_put(jnp.asarray(b_host))

        def fixed_iters(k, f, bb):
            z, _ = cg(f, bb, tol=0.0, maxiter=k)
            return jnp.sum(z)

        def chain_of(k):
            return jax.jit(functools.partial(fixed_iters, k))

        r = chain_device_time(chain_of, fmt_d, b, name=f"cg-iter[{name}]",
                              bytes_moved=iter_bytes)
        row = dict(kernel=name, mb=round(fmt_bytes / 1e6, 1),
                   iter_us=round(r.seconds * 1e6, 1),
                   gbps=round(iter_bytes / r.seconds / 1e9, 0),
                   floor_x=round(r.seconds / (iter_bytes / 819e9), 2))
        rec["rows"].append(row)
        print(row, flush=True)
        del fmt_d

    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print("recorded " + args.out, flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
