"""Dynamic-activation plan-floor study (VERDICT r3 item 4).

BENCH.md §dynamic: the device-plan path measured flat below live ~ 0.25
(live=0.0625 cost 31.3 us vs live=0.25's 32.6 us): the plan machinery has
a floor that clips the win region the reference's per-element skip
(asp.cu:20-27) doesn't have. Three questions, all measured on hardware:

1. Floor vs n_groups — the O(n_groups) claim. Sweep g in {8,4,2,1}
   (ng = 4..32 at m=4096) at live=1.0: dynamic-chain minus static-full-
   plan-chain time isolates the plan+dynamic-grid overhead per ng.
2. Finer granularity — does g=1 (per-128-row windows, ng=32) let
   live=0.0625 beat live=0.25? Live sweep at the finest g.
3. Plan pipeline cost — device_group_plan alone (argsort form) vs a
   cumsum-compaction form, jitted, plan-only: is the argsort the floor?

Run: ``python scripts/dynamic_floor_study.py [--quick] [--json PATH]``.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

import jax
import jax.numpy as jnp


def plan_cumsum(x: jax.Array, ng: int, span: int):
    """device_group_plan with the argsort replaced by cumsum compaction:
    plan[cumsum(act)-1] = group id via a length-ng scatter."""
    rows = ng * span
    act = (x[:, :rows] != 0).reshape(x.shape[0], ng, span).any(axis=(0, 2))
    count = jnp.sum(act).astype(jnp.int32)
    pos = jnp.cumsum(act) - 1
    plan = jnp.full((ng,), ng, jnp.int32)
    plan = plan.at[jnp.where(act, pos, ng)].set(
        jnp.arange(ng, dtype=jnp.int32), mode="drop")
    return plan, jnp.maximum(count, 1)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--json", default="/tmp/dynamic_floor.json")
    args = p.parse_args(argv)
    if args.quick:
        jax.config.update("jax_platforms", "cpu")

    from tpusparse.bench.dynamic import (_awsp_case, _measure_chain,
                                         _x_pool)
    from tpusparse.bench.runner import run_id
    from tpusparse.kernels.awsp_spmv import device_group_plan
    from tpusparse.kernels.dense import dense_xla

    _LANES = 128
    m = n = 1024 if args.quick else 4096
    d = 0.5
    out = {"run": run_id(), "m": m, "d": d, "rows": []}
    kw = dict(k1=4, k2=24, reps=3) if args.quick else dict(k1=8, k2=None,
                                                           reps=7)

    def row(**r):
        out["rows"].append(r)
        print("  " + json.dumps(r), file=sys.stderr, flush=True)

    # --- 1. floor vs ng at live=1.0 ------------------------------------
    for g in (8, 4, 2, 1):
        a_dense, awsp = _awsp_case(m, n, d, g)
        ng, span = awsp.n_groups, g * _LANES
        pool = _x_pool(m, ng, span, 1.0, 3)
        nb, gtot, w, lanes = awsp.vals.shape
        full_bytes = nb * (gtot - g) * w * lanes * 5 + 2 * m * 4
        r_dyn = _measure_chain(
            f"dyn-g{g}-full", lambda f, x: f.spmv(x, plan="device"),
            awsp, pool, step_bytes=full_bytes, replicas=6, **kw)
        full_plan = np.arange(ng, dtype=np.int32)
        r_sta = _measure_chain(
            f"sta-g{g}-full",
            lambda f, x: f.spmv(x, plan=full_plan),
            awsp, pool, step_bytes=full_bytes, replicas=6, **kw)
        row(kind="floor_vs_ng", g=g, ng=int(ng),
            dyn_us=round(r_dyn.seconds * 1e6, 1),
            static_us=round(r_sta.seconds * 1e6, 1),
            plan_overhead_us=round((r_dyn.seconds - r_sta.seconds) * 1e6,
                                   1))

    # --- 2. live sweep at the finest granularity (g=1) ------------------
    for g in (1, 8):
        a_dense, awsp = _awsp_case(m, n, d, g)
        ng, span = awsp.n_groups, g * _LANES
        nb, gtot, w, lanes = awsp.vals.shape
        for live in (0.5, 0.25, 0.125, 0.0625, 0.03125):
            pool = _x_pool(m, ng, span, live, 5)
            k_act = max(1, int(round(live * ng)))
            act_bytes = nb * k_act * g * w * lanes * 5 + 2 * m * 4
            r_dyn = _measure_chain(
                f"dyn-g{g}-live{live}",
                lambda f, x: f.spmv(x, plan="device"),
                awsp, pool, step_bytes=act_bytes, replicas=6, **kw)
            row(kind="live_sweep", g=g, ng=int(ng), live=live,
                k_act=k_act, dyn_us=round(r_dyn.seconds * 1e6, 1))

    # --- 3. plan pipeline alone: argsort vs cumsum-compaction ------------
    a_dense, awsp = _awsp_case(m, n, d, 1)
    ng, span = awsp.n_groups, 1 * _LANES
    pool = _x_pool(m, ng, span, 0.25, 5)

    for name, fn in (("argsort", device_group_plan),
                     ("cumsum", plan_cumsum)):
        def call(_f, x, fn=fn):
            plan, k = fn(x[None, :] if x.ndim == 1 else x, ng, span)
            return plan * k                     # consume both outputs

        r = _measure_chain(f"plan-only-{name}",
                           lambda f, x: jnp.sum(call(f, x)) + 0.0 * x[:1],
                           awsp, pool, step_bytes=m * 4, replicas=2, **kw)
        row(kind="plan_only", form=name, ng=int(ng),
            us=round(r.seconds * 1e6, 1))

    with open(args.json, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
