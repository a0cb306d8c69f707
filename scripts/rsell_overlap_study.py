"""GB-scale RSELL decode/stream overlap study (VERDICT r4 item 2).

The r4 65536^2 run measured the segmented RSELL SpMV at 3193.9 us =
bytes-floor (1797) + gather-floor (1537) SUMMED, while 4096^2-class rows
sit at the max (overlapped) end of the same band. This script finds where
and why the overlap is lost, with synthetic on-device operands (the real
pack costs 75 s gen + 66 s pack + 177 s tunnel upload; the kernel only
sees (cj, ct, idx, vals, x) arrays, so a device-synthesized stream with
the same shapes/plan statistics measures the same kernel behavior for
free — correctness is pinned separately by tests/test_rsell.py).

Ablation variants (same grid, same BlockSpecs, same c):
  stream   — DMA only: consume idx+val blocks, static accumulate
             (no SMEM plan reads, no gather) -> the pack's DMA floor;
  gather   — + SMEM plan decode + in-VREG take_along_axis from a STATIC
             X window, static store -> decode work, no dynamic slices;
  dynx     — + dynamic X window read (ct) -> adds the dynamic-slice read;
  full     — + dynamic output RMW (cj), i.e. the production kernel body.

Usage (real chip): python scripts/rsell_overlap_study.py [--nchunk N]
                   [--m M] [--c C] [--seg CAP] [--out OUT.json]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpusparse.bench.runner import device_time
from tpusparse.kernels.precision import dot2_exact_lhs

_SUB, _LANES = 8, 128
BW = 819e9
GATHER = 205 * 0.94e9


def synth(nchunk: int, m: int, seed: int = 0):
    """Device-synthesized chunk stream imitating a uniform m^2 pack:
    tiles visited in (group, window) order, ~nchunk/ntile chunks each."""
    nb = m // _LANES
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    # plan on host (1.1 MB at 283k chunks — cheap), streams on device
    tile = np.arange(nchunk, dtype=np.int64) * (nb * nb) // nchunk
    cj = (tile // nb).astype(np.int32)
    ct = (tile % nb).astype(np.int32)
    idx = jax.random.randint(k1, (nchunk, _SUB, _LANES), 0, _LANES,
                             dtype=jnp.int8)
    vals = jax.random.normal(k2, (nchunk, _SUB, _LANES), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(7), (1, m), jnp.float32)
    return jnp.asarray(cj), jnp.asarray(ct), idx, vals, x


def _body(cjct_ref, idx_ref, val_ref, x_ref, o_ref, *, c, variant):
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _init():
        o_ref[:] = jnp.zeros_like(o_ref)

    ones = jnp.ones((_SUB, _SUB), jnp.float32)
    if variant == "stream":
        # touch one chunk per block: the BlockSpec DMAs move the WHOLE
        # (c, 8, 128) idx+val blocks regardless of reads, so this is the
        # pure stream floor with ~zero VPU work
        o_ref[0:_SUB, 0:_LANES] += val_ref[0].astype(jnp.float32) \
            + idx_ref[0].astype(jnp.float32)
        return
    if variant == "runfull":
        # run-aligned candidate: every 8-chunk sub-block shares one cj
        # (pack-time alignment, ~0.7% pad at the GB config) -> per run:
        # 8 elementwise FMAs into a VREG accumulator, ONE ones-matmul,
        # ONE dynamic-offset RMW — vs 8 of each in the flat body
        for r in range(c // _SUB):
            base = pl.program_id(0) * c + r * _SUB
            cj = jax.lax.shift_right_logical(cjct_ref[base], 16)
            tot = jnp.zeros((_SUB, _LANES), jnp.float32)
            for i in range(_SUB):
                ct = jax.lax.bitwise_and(cjct_ref[base + i], 0xFFFF)
                idx8 = idx_ref[r * _SUB + i].astype(jnp.int32)
                v8 = val_ref[r * _SUB + i].astype(jnp.float32)
                xw = x_ref[0:1, pl.dslice(ct * _LANES, _LANES)]
                xg = jnp.take_along_axis(
                    jnp.broadcast_to(xw, (_SUB, _LANES)), idx8, axis=1)
                tot = tot + v8 * xg
            acc = dot2_exact_lhs(ones, tot, (((1,), (0,)), ((), ())))
            o_ref[0:_SUB, pl.dslice(cj * _LANES, _LANES)] += acc
        return
    for i in range(c):
        v = cjct_ref[pl.program_id(0) * c + i]
        cj = jax.lax.shift_right_logical(v, 16)
        ct = jax.lax.bitwise_and(v, 0xFFFF)
        idx8 = idx_ref[i].astype(jnp.int32)
        v8 = val_ref[i].astype(jnp.float32)
        if variant == "gather":
            xw = x_ref[0:1, 0:_LANES]
        else:
            xw = x_ref[0:1, pl.dslice(ct * _LANES, _LANES)]
        xg = jnp.take_along_axis(
            jnp.broadcast_to(xw, (_SUB, _LANES)), idx8, axis=1)
        acc = dot2_exact_lhs(ones, v8 * xg, (((1,), (0,)), ((), ())))
        if variant == "full":
            o_ref[0:_SUB, pl.dslice(cj * _LANES, _LANES)] += acc
        else:
            o_ref[0:_SUB, 0:_LANES] += acc


def run_variant(variant, cj, ct, idx, vals, x, *, c, seg_cap,
                interpret=False):
    nchunk = vals.shape[0]
    m = x.shape[1]
    cjct = (cj.astype(jnp.int32) << 16) | ct.astype(jnp.int32)

    @functools.partial(jax.jit, static_argnames=())
    def call_all(cjct, idx, vals, x):
        def call(cjct_s, step0, nseg):
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(nseg // c,),
                in_specs=[
                    pl.BlockSpec((c, _SUB, _LANES),
                                 lambda k, cjct: (step0 + k, 0, 0)),
                    pl.BlockSpec((c, _SUB, _LANES),
                                 lambda k, cjct: (step0 + k, 0, 0)),
                    pl.BlockSpec(x.shape, lambda k, cjct: (0, 0)),
                ],
                out_specs=pl.BlockSpec((_SUB, m), lambda k, cjct: (0, 0)),
            )
            return pl.pallas_call(
                functools.partial(_body, c=c, variant=variant),
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((_SUB, m), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",)),
                cost_estimate=pl.CostEstimate(
                    flops=2 * nseg * _SUB * _LANES,
                    bytes_accessed=nseg * _SUB * _LANES * 5,
                    transcendentals=0),
                interpret=interpret,
            )(cjct_s, idx, vals, x)

        seg = c * max(1, seg_cap // c)
        if nchunk <= seg:
            return call(cjct, 0, nchunk)
        out = None
        for lo in range(0, nchunk, seg):
            hi = min(lo + seg, nchunk)
            part = call(cjct[lo:hi], lo // c, hi - lo)
            out = part if out is None else out + part
        return out

    if interpret:            # one correctness-shaped call, no timing
        out = np.asarray(call_all(cjct, idx, vals, x))
        if variant == "full":
            ref = np.zeros_like(out)
            cjn, ctn = np.asarray(cj), np.asarray(ct)
            xn, idxn = np.asarray(x), np.asarray(idx)
            vn = np.asarray(vals)
            for g in range(nchunk):
                xw = xn[0, ctn[g] * _LANES:(ctn[g] + 1) * _LANES]
                # the ones(8,8) MXU pass sums over slots and replicates
                # the row: every output row in the block holds y
                ref[:, cjn[g] * _LANES:(cjn[g] + 1) * _LANES] += \
                    (vn[g] * xw[idxn[g].astype(np.int64)]).sum(0)
            err = float(np.max(np.abs(out - ref)))
            assert err <= 1e-3 * max(1.0, np.abs(ref).max()), err
            print(f"  full-vs-numpy max err {err:.2e}", flush=True)
        return float("nan")
    nbytes = nchunk * _SUB * _LANES * 5
    r = device_time(lambda ops, xx: call_all(*ops, xx),
                    (cjct, idx, vals), x,
                    name=f"rsell-{variant}", bytes_moved=nbytes)
    return r.seconds


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--nchunk", type=int, default=282624)
    p.add_argument("--m", type=int, default=65536)
    p.add_argument("--c", type=int, default=256)
    p.add_argument("--seg", type=int, default=192_000)
    p.add_argument("--variants", default="stream,gather,dynx,full")
    p.add_argument("--out", default=None)
    p.add_argument("--interpret", action="store_true",
                   help="CPU smoke test (times meaningless)")
    args = p.parse_args(argv)
    if args.interpret:
        jax.config.update("jax_platforms", "cpu")

    nchunk, m, c = args.nchunk, args.m, args.c
    assert nchunk % c == 0
    cj, ct, idx, vals, x = synth(nchunk, m)
    nbytes = nchunk * _SUB * _LANES * 5
    floors = dict(
        floor_bytes_us=nbytes / BW * 1e6,
        floor_gather_us=nchunk * _SUB * _LANES / GATHER * 1e6,
    )
    rec = dict(nchunk=nchunk, m=m, c=c, seg=args.seg,
               gb=round(nbytes / 1e9, 3), **{k: round(v, 1)
                                             for k, v in floors.items()})
    print(f"# nchunk={nchunk} ({nbytes/1e9:.2f} GB) m={m} c={c} "
          f"seg={args.seg} | floors: bytes {floors['floor_bytes_us']:.0f}"
          f" us, gather {floors['floor_gather_us']:.0f} us", flush=True)
    for variant in args.variants.split(","):
        s = run_variant(variant, cj, ct, idx, vals, x, c=c,
                        seg_cap=args.seg, interpret=args.interpret)
        rec[variant + "_us"] = round(s * 1e6, 1)
        print(f"  {variant:8s}: {s*1e6:9.1f} us "
              f"({nbytes/s/1e9:6.1f} GB/s, {nbytes/s/BW:.2f} roofline)",
              flush=True)
    if args.out:
        from tpusparse.bench.runner import run_id
        rec["run"] = run_id()
        try:
            hist = json.load(open(args.out))
        except Exception:
            hist = []
        hist.append(rec)
        json.dump(hist, open(args.out, "w"), indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
