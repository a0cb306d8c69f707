"""Auto-theta convergence at the gallery size (VERDICT r3 item 6 'Done'
criterion): aniso2d-eps100 (512^2, both orientations) must solve at
<= 10 CG iterations with DEFAULT arguments — theta='auto' resolves from
the per-level coupling spectrum (amg._auto_theta), no hand-tuning.

Status: MET as of r5 — 8 iterations both axes (the r4 geometric-mean
rule read 11/16; the S/4 rule fixed it, see _auto_theta's docstring and
BENCH.md §AMG-robustness). The recorded true relres ~8e-5 against the
requested tol=1e-6 is NOT a miss: tol gates the fp32 CG recurrence
residual, while the float64-recomputed true residual floors at the fp32
V-cycle's attainable accuracy (~eps_fp32 * kappa, kappa ~ 1e5 here) —
the manual-theta rows in BENCH.md show the same ~6e-5 floor.

Iteration counts / complexities are device-independent (CPU path).
Record: data/amg_auto_theta_512.json. Run:
``PYTHONPATH=/root/repo python scripts/amg_auto_theta_study.py``.
"""

from __future__ import annotations

import json
import time

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp          # noqa: E402
import numpy as np               # noqa: E402

from tpusparse.amg import smoothed_aggregation   # noqa: E402
from tpusparse.testing.generators import stencil_csr  # noqa: E402


def main() -> int:
    out = {"side": 512, "eps": 100.0, "rows": []}
    for axis in (0, 1):
        c = stencil_csr((512, 512), eps=100.0, eps_axis=axis)
        t0 = time.perf_counter()
        amg = smoothed_aggregation(c)          # ALL defaults
        setup_s = time.perf_counter() - t0
        b = np.random.default_rng(11).normal(size=c.shape[0]) \
            .astype(np.float32)
        t0 = time.perf_counter()
        z, info = amg.solve(jnp.asarray(b), tol=1e-6)
        solve_s = time.perf_counter() - t0
        a64 = c.to_scipy().astype(np.float64)
        relres = float(np.linalg.norm(b - a64 @ np.asarray(z, np.float64))
                       / np.linalg.norm(b))
        row = dict(axis=axis, theta_resolved=round(float(amg.theta), 4),
                   iters=int(info["iters"]), relres=relres,
                   op_cx=round(float(amg.operator_complexity), 2),
                   grid_cx=round(float(amg.grid_complexity), 2),
                   setup_s=round(setup_s, 1), solve_s=round(solve_s, 1),
                   levels=[int(n) for n in info.get("level_sizes", [])]
                   if info.get("level_sizes") else None)
        out["rows"].append(row)
        print(row, flush=True)
    with open("data/amg_auto_theta_512.json", "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
