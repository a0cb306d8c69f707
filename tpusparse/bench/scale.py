"""GB-scale unstructured run: the BASELINE 'large synthetic matrix' config
taken to >= 1 GB of packed format bytes (VERDICT r2 next-round item 4 —
every prior unstructured measurement stopped at 8192^2 / 336 MB).

One 262144^2 powerlaw matrix at d ~ 2e-3 (~137 M nnz):

- host generation wall-time (no-densify generator),
- O(nnz) statistics + the router's pick,
- converter wall-time (native C++ fast path vs numpy recorded by the
  converter itself),
- ONE host->device upload, timed (the axon tunnel moves ~MB/s; this is
  the dominant one-time cost and is paid once per process by design),
- SpMV device time via the slope runner (bytes_moved passed so the
  10 ms-scale kernel gets the median-of-slopes guard) + roofline %,
- a Krylov-iteration chain (per-iteration device time at scale),
- a trainable_linear fwd+bwd step (tied twin layouts at GB scale).

Run: ``python -m tpusparse.bench.scale [--m 262144] [--density 2e-3]``.
Emits one JSON record; small shapes via --m for CPU smoke tests.

The default 262144^2 config is itself the bench's first finding (r4): at
d_eff ~ 8e-4 the matrix touches 99.2% of its 4.19M 128^2 tiles, so every
slot format floors at the (8,128)-chunk quantum — 37.2 GB predicted for
unsorted per-tile widths, 15.5 GB even after RSELL's SELL-sigma column
sort, 24.5 GB MEASURED for binned (before formats/auto.py's wide_fits
drift fix mis-routed it there) — past the single-chip HBM budget every
way. The run records that law as a ``cliff`` row instead of OOMing; the
measured GB-scale rows use configs inside the quantum-competence region
(per-tile fill >= ~1 slot-row, e.g. 65536^2 at d=0.02), and the
sharded-carrier story at >= 1e5 nodes is recorded by
scripts/scale_sharded_study.py (data/scale_sharded_330.json).
"""

from __future__ import annotations

import json
import sys
import time
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp


def _wall(fn, *a, **kw):
    t0 = time.perf_counter()
    out = fn(*a, **kw)
    return out, time.perf_counter() - t0


def run(m: int = 262144, density: float = 2e-3, seed: int = 42,
        train: bool = True, hbm_budget: int = 12_000_000_000,
        verbose: bool = True, quick: bool = False,
        train_k2: int | None = None) -> dict[str, Any]:
    """``quick``: tiny chains for CPU smoke tests (times meaningless).
    ``hbm_budget``: packs predicted past this are recorded as a
    quantum-floor cliff instead of attempted (16 GB HBM minus headroom
    for X/Y/replica bookkeeping)."""
    from tpusparse.bench.roofline import format_bytes, roofline_fraction
    from tpusparse.bench.runner import chain_device_time, device_time, run_id
    from tpusparse.formats.auto import (auto_format, matrix_stats_csr,
                                        predicted_bytes, route)
    from tpusparse.testing import generators

    def log(msg):
        if verbose:
            print(msg, file=sys.stderr, flush=True)

    rec: dict[str, Any] = dict(run=run_id(), m=m, n=m, density=density)

    csr, t_gen = _wall(generators.random_sparse_csr, m, m, density,
                       seed=seed, distribution="powerlaw")
    rec["nnz"] = int(csr.nnz)
    rec["gen_s"] = round(t_gen, 1)
    log(f"generated {csr.nnz:,} nnz in {t_gen:.1f}s")

    stats, t_stats = _wall(matrix_stats_csr, csr)
    routed = route(m, m, stats)
    rec["stats_s"] = round(t_stats, 1)
    rec["routed"] = routed
    log(f"stats in {t_stats:.1f}s -> routed to {routed}")

    # Quantum-floor guard (the r4 GB-scale run's first finding): when the
    # matrix touches nearly every 128^2 tile at low per-tile fill, every
    # slot format floors at 5120 B x touched tiles — 37.2 GB predicted
    # (24.5 GB measured for binned before the router fix) for the default
    # 262144^2 powerlaw, past the 16 GB single-chip HBM. Packing that is
    # not a benchmark, it is an OOM; record the law and the multi-chip
    # pointer instead (parallel/sparse.py shards the same pack at
    # ~pred/D bytes per chip; scripts/scale_sharded_study.py grounds the
    # sharded-carrier correctness at >= 1e5 nodes).
    pred = predicted_bytes(m, m, stats, routed, csr=csr)
    rec["predicted_gb"] = round(pred / 1e9, 2)
    if pred > hbm_budget:
        ntile = ((m + 127) // 128) ** 2
        rec["cliff"] = "quantum_floor"
        rec["touched_tile_frac"] = round(1 - stats["empty_block_frac"], 4)
        rec["floor_law"] = (
            f"slot formats >= round_up(w_tile,8) x 640 B per touched "
            f"128^2 tile; {rec['touched_tile_frac']:.1%} of {ntile:,} "
            f"tiles touched -> {pred/1e9:.1f} GB predicted for "
            f"'{routed}' > {hbm_budget/1e9:.0f} GB HBM budget; this "
            f"regime needs the multi-chip partitions")
        log(f"CLIFF: {rec['floor_law']}")
        return rec

    fmt, t_pack = _wall(auto_format, csr, stats=stats)
    nbytes = format_bytes(fmt)
    rec["pack_s"] = round(t_pack, 1)
    rec["format"] = type(fmt).__name__
    rec["format_gb"] = round(nbytes / 1e9, 3)
    log(f"packed {type(fmt).__name__}: {nbytes/1e9:.2f} GB in {t_pack:.1f}s")

    # ONE upload, synced by touching a scalar of every leaf
    def upload():
        dev = jax.tree_util.tree_map(
            lambda leaf: jax.device_put(jnp.asarray(leaf)), fmt)
        for leaf in jax.tree_util.tree_leaves(dev):
            jnp.asarray(leaf).ravel()[0].block_until_ready()
        # over the async tunnel only a value fetch truly syncs
        _ = float(sum(jnp.sum(leaf[..., :1].astype(jnp.float32))
                      for leaf in jax.tree_util.tree_leaves(dev)))
        return dev

    dev_fmt, t_up = _wall(upload)
    rec["upload_s"] = round(t_up, 1)
    log(f"uploaded once in {t_up:.1f}s "
        f"({nbytes / 1e6 / max(t_up, 1e-9):.1f} MB/s tunnel)")

    x = np.random.default_rng(seed).uniform(-1, 1, m).astype(np.float32)

    dt_kw = dict(k1=2, k2=5, reps=2) if quick else {}
    r = device_time(lambda f, xx: f.spmv(xx), dev_fmt, x,
                    name=f"scale-spmv[{type(fmt).__name__}]",
                    bytes_moved=nbytes, nnz=csr.nnz, **dt_kw)
    rec["spmv_us"] = round(r.seconds * 1e6, 1)
    rec["spmv_roofline"] = round(roofline_fraction(nbytes, r.seconds), 3)
    rec["spmv_gnnz_s"] = round(csr.nnz / r.seconds / 1e9, 2)
    log(f"  {r} | roofline {rec['spmv_roofline']:.0%}")

    # Krylov per-iteration cost at scale: a chained spmv+axpy step moves
    # exactly the memory traffic of one CG iteration minus the dots (a
    # REAL cg() needs a symmetric operator — a second symmetrized pack +
    # upload — for no additional information about the format at scale).
    def chain_of(k):
        @jax.jit
        def runk(f, xx):
            v = xx
            for _ in range(k):
                y = f.spmv(v)
                v = xx + (jnp.sum(y) * 1e-37).astype(xx.dtype)
                # y has length n=m here (square), feed it back scaled
                v = v + 1e-6 * y
            return jnp.sum(v)

        return runk

    rk = chain_device_time(chain_of, dev_fmt,
                           jax.device_put(jnp.asarray(x)),
                           name="scale-iter", bytes_moved=nbytes,
                           k1=2 if quick else 4,
                           k2=5 if quick else None,
                           reps=2 if quick else 7)
    rec["iter_us"] = round(rk.seconds * 1e6, 1)
    log(f"  per-iteration (spmv+axpy): {rk}")

    # Drain the measurement transients before the train stage: the slope
    # runs above cycled a ~6-replica pool (8.9 GB at the 65536^2 config);
    # over the async tunnel those buffers can still be live when the twin
    # packs upload, and 8.9 + 7.4 GB > 16 GB HBM was the r4 train-stage
    # RESOURCE_EXHAUSTED. The pools are function-local so a GC pass plus
    # one synced op flushes the deferred deletions.
    import gc

    gc.collect()
    float(jnp.sum(jax.device_put(jnp.ones(8, jnp.float32))))

    if train:
        try:
            from tpusparse.autodiff import trainable_linear

            (ap, params), t_tw = _wall(lambda: trainable_linear(csr)[:2])
            rec["twin_pack_s"] = round(t_tw, 1)

            # Size the stage from the ACTUAL twin pack before uploading
            # anything (r5; the r4 run died with a raw RESOURCE_EXHAUSTED
            # the prose never reported, and prediction-based sizing is
            # wrong both ways — flat-SELL w_global pricing says 32768^2
            # cannot train, yet it does at 7.1 ms). Live on-device:
            # params (vals+vals_t) + their grads + the structure planes
            # + the already-uploaded SpMV pack + x/y. A recorded gate is
            # a RESULT (what fits single-chip); the sharded step
            # (autodiff.trainable_linear_sharded, in the 8-device
            # dryrun) is the supported path past it.
            def _tree_bytes(t):
                return sum(np.asarray(l).nbytes
                           for l in jax.tree_util.tree_leaves(t))

            twin_b = _tree_bytes(params)
            statics_b = _tree_bytes(ap.statics)
            train_need = 2 * twin_b + statics_b + nbytes
            rec["train_operands_gb"] = round(train_need / 1e9, 3)
            if train_need > hbm_budget:
                rec["train_gate"] = (
                    f"params {twin_b/1e9:.1f} + grads {twin_b/1e9:.1f} "
                    f"+ structure planes {statics_b/1e9:.1f} + uploaded "
                    f"pack {nbytes/1e9:.1f} = {train_need/1e9:.1f} GB "
                    f"live > {hbm_budget/1e9:.0f} GB operand budget "
                    f"(16 GB HBM minus runtime reserve/AD workspace); "
                    f"use trainable_linear_sharded on a mesh")
                log(f"  train step gated: {rec['train_gate']}")
                return rec

            # GB-scale 413 wall (r5): closed-over structure planes lower
            # as INLINE stablehlo constants (measured 135 MB of HLO at
            # 8192^2), and the axon remote-compile endpoint rejects the
            # payload (HTTP 413) long before memory matters. Thread them
            # as runtime arguments instead — uploaded once, program size
            # flat (autodiff._trainable_from_pack statics).
            x_j = jnp.asarray(x)
            statics_d = jax.tree_util.tree_map(jax.device_put, ap.statics)

            def chain_tr(k):
                @jax.jit
                def runk(p, xx, st):
                    v = xx
                    for _ in range(k):
                        loss, dp = jax.value_and_grad(
                            lambda pp: (ap(pp, v, statics=st) ** 2).sum()
                        )(p)
                        v = xx + (loss * 1e-37).astype(xx.dtype)
                    return loss

                return runk

            p0 = jax.tree_util.tree_map(
                lambda l: jax.device_put(jnp.asarray(l)), params)
            # k2 pinned small: the auto rule (span >= 10 ms) would unroll
            # 168 value_and_grad iterations — at GB scale that HLO (a)
            # exceeds the axon remote-compile payload limit (HTTP 413,
            # measured at 32768^2 r5) and (b) multiplies live AD temps
            # (the r4/r5 65536^2 RESOURCE_EXHAUSTED). 8 iterations x
            # >= 1.3 ms each carries a >= 10 ms span at every config
            # this bench admits.
            rt = chain_device_time(chain_tr, p0,
                                   jax.device_put(x_j), statics_d,
                                   name="scale-train-step",
                                   bytes_moved=3 * nbytes,
                                   k1=2,
                                   k2=train_k2 or (4 if quick else 10),
                                   reps=2 if quick else 7)
            rec["train_us"] = round(rt.seconds * 1e6, 1)
            log(f"  fwd+bwd step: {rt}")
        except Exception as e:          # OOM / unsupported at this scale
            rec["train_error"] = f"{type(e).__name__}: {e}"[:300]
            log(f"  train step failed: {rec['train_error']}")

    return rec


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--m", type=int, default=262144)
    p.add_argument("--density", type=float, default=2e-3)
    p.add_argument("--no-train", action="store_true")
    p.add_argument("--train-k2", type=int, default=None,
                   help="unrolled train-chain length (smaller = smaller "
                        "compile payload; the 65536^2 program at k2=10 "
                        "crashed the axon compile helper)")
    p.add_argument("--json", default="BENCH_scale.json")
    args = p.parse_args(argv)
    rec = run(m=args.m, density=args.density, train=not args.no_train,
              train_k2=args.train_k2)
    if args.json:
        import os
        recs = []
        if os.path.exists(args.json):
            with open(args.json) as f:
                recs = json.load(f)
        recs = [r for r in recs if (r.get("m"), r.get("density"))
                != (rec["m"], rec["density"])]
        recs.append(rec)
        with open(args.json, "w") as f:
            json.dump(recs, f, indent=1)
    print(json.dumps(rec, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
