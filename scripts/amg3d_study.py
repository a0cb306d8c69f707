"""3D AMG robustness row (VERDICT r4 item 1c): 101^3 = 1,030,301-unknown
7-point Poisson through smoothed_aggregation + CG on the CPU path.

Emits one JSON record for BENCH.md §AMG-robustness.
Run: ``python scripts/amg3d_study.py [--side 101] [--theta 0.0]``.
"""

import argparse
import json
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")   # before any jax use

import numpy as np  # noqa: E402


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--side", type=int, default=101)
    p.add_argument("--theta", type=float, default=0.0)
    p.add_argument("--tol", type=float, default=1e-6)
    p.add_argument("--json", default="/tmp/amg3d_study.json")
    args = p.parse_args()

    import jax.numpy as jnp

    from tpusparse.amg import smoothed_aggregation
    from tpusparse.testing.generators import stencil_csr

    side = args.side
    n = side ** 3
    t0 = time.time()
    c = stencil_csr((side, side, side))
    t_gen = time.time() - t0
    print(f"generated 7-point {side}^3: n={n:,} nnz={c.nnz:,} "
          f"in {t_gen:.1f}s", file=sys.stderr, flush=True)

    t0 = time.time()
    amg = smoothed_aggregation(c, theta=args.theta)
    t_setup = time.time() - t0
    print(f"setup {t_setup:.1f}s: {amg!r}", file=sys.stderr, flush=True)

    rng = np.random.default_rng(3)
    b = rng.normal(size=n).astype(np.float32)
    t0 = time.time()
    z, info = amg.solve(jnp.asarray(b), tol=args.tol)
    t_solve = time.time() - t0
    z = np.asarray(z)

    # float64 residual straight from the CSR triplets (no densify)
    sp = c.to_scipy().tocsr().astype(np.float64)
    r = sp @ z.astype(np.float64) - b.astype(np.float64)
    relres = float(np.linalg.norm(r) / np.linalg.norm(b))

    rec = dict(side=side, n=n, nnz=int(c.nnz), theta=args.theta,
               iters=int(info["iters"]), relres=relres,
               op_cx=round(amg.operator_complexity, 2),
               grid_cx=round(amg.grid_complexity, 2),
               levels=[int(l.n) for l in amg.levels],
               gen_s=round(t_gen, 1), setup_s=round(t_setup, 1),
               solve_s=round(t_solve, 1))
    with open(args.json, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
