"""Decompose the DIA halo shard_map overhead at D=1 (VERDICT r3 item 2).

BENCH_shard_overhead.json measured the sharded DIA halo path at 2.4x the
unsharded kernel on a 1-device mesh (7.0 -> 16.8 us, 512^2 5-point sym
stencil). Traffic accounting points at two materializing concatenates in
``parallel/sparse.py:dia_spmm_sharded``:

- ``mirror_local``: vexp = concat([edge strip, FULL vals]) -> (k, hs+n_loc)
  copy = ~3.1 MB write + 3.1 MB re-read per call (~7.6 us at 819 GB/s);
- the 3-way X halo concat -> (1, n_loc+hl+hr) copy = ~1 MB write + re-read
  (~2.6 us).

Unsharded spmv instead uses per-diagonal ``lax.pad`` shifts, which XLA
fuses into the consuming FMA (no extra HBM pass). This study times the
decomposition on hardware:

  v_unsharded      1-D spmv baseline
  v_unsharded_b1   batch-1 2-D spmm (isolates the 2-D/batch cost)
  v_current        dia_spmm_sharded halo as committed
  v_fixA           mirror via per-offset fused pads (no vexp concat)
  v_fixAB          fixA + X halo via edge-correction pads (no xp concat)
  v_npart          partition='n' (no halo machinery at all)

Run: ``python scripts/dia_shard_study.py [--quick] [--json out.json]``
(--quick: CPU correctness smoke, times meaningless).
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P


def build_variants(dm, mesh):
    """Return {name: fn(dm, x)} shard_map halo variants for a SYM DiaMatrix."""
    from tpusparse.parallel import comm
    from tpusparse.parallel.mesh import compat_shard_map as _shard_map

    offsets = dm.offsets
    dmax = max(offsets)
    dmin = min(min(offsets), -dmax)          # sym mirrors reach -dmax
    d = mesh.shape["n"]
    m, n = dm.shape
    np_ = n + (-n % d)
    n_loc = np_ // d
    hl, hr = max(0, -dmin), max(0, dmax)

    def prep(x):
        x2d = jnp.asarray(x)[None, :].astype(jnp.float32)
        if x2d.shape[1] != np_:
            x2d = jnp.pad(x2d, ((0, 0), (0, np_ - x2d.shape[1])))
        return x2d

    def halo_x(x_loc):
        parts = []
        if hl:
            parts.append(comm.ring_shift(x_loc[:, -hl:], "n", shift=1))
        parts.append(x_loc)
        if hr:
            parts.append(comm.ring_shift(x_loc[:, :hr], "n", shift=-1))
        return jnp.concatenate(parts, axis=1)

    def edge_strip(vals_loc):
        vh = comm.ring_shift(vals_loc[:, -dmax:], "n", shift=1)
        return jnp.where(lax.axis_index("n") == 0, 0.0, vh)

    # -- current committed shape: vexp concat + xp concat -------------------
    def f_current(vals_loc, x_loc):
        xp = halo_x(x_loc)
        vh = edge_strip(vals_loc)
        vexp = jnp.concatenate([vh, vals_loc], axis=1)
        y = jnp.zeros((1, n_loc), jnp.float32)
        for i, off in enumerate(offsets):
            y = y + vals_loc[i][None, :] * lax.slice(
                xp, (0, off + hl), (1, off + hl + n_loc))
            if off > 0:
                vp = lax.slice(vexp, (i, dmax - off),
                               (i + 1, dmax - off + n_loc))[0]
                y = y + vp[None, :] * lax.slice(
                    xp, (0, hl - off), (1, hl - off + n_loc))
        return y

    # -- fix A: mirror diagonals via fused pads, edge strip added separately
    def f_fixA(vals_loc, x_loc):
        xp = halo_x(x_loc)
        vh = edge_strip(vals_loc)
        y = jnp.zeros((1, n_loc), jnp.float32)
        for i, off in enumerate(offsets):
            y = y + vals_loc[i][None, :] * lax.slice(
                xp, (0, off + hl), (1, off + hl + n_loc))
            if off > 0:
                # vals_d[c-d] on the local slab = local vals shifted right
                # by off (pad fuses) + the off entries crossing in from the
                # left neighbor's strip (tiny pad, also fuses)
                vp = lax.pad(vals_loc[i], jnp.float32(0), ((off, -off, 0),))
                vp = vp + lax.pad(vh[i, dmax - off:], jnp.float32(0),
                                  ((0, n_loc - off, 0),))
                y = y + vp[None, :] * lax.slice(
                    xp, (0, hl - off), (1, hl - off + n_loc))
        return y

    # -- fix A+B: no xp concat either; local pads + edge corrections --------
    def f_fixAB(vals_loc, x_loc):
        xl = comm.ring_shift(x_loc[:, -hl:], "n", shift=1) if hl else None
        xr = comm.ring_shift(x_loc[:, :hr], "n", shift=-1) if hr else None
        vh = edge_strip(vals_loc)
        y = jnp.zeros((1, n_loc), jnp.float32)
        for i, off in enumerate(offsets):
            # interior: x_loc shifted left by off (zero-fill, fuses)
            xs = lax.pad(lax.slice(x_loc, (0, off), (1, n_loc)),
                         jnp.float32(0), ((0, 0, 0), (0, off, 0))) \
                if off >= 0 else \
                lax.pad(lax.slice(x_loc, (0, 0), (1, n_loc + off)),
                        jnp.float32(0), ((0, 0, 0), (-off, 0, 0)))
            y = y + vals_loc[i][None, :] * xs
            if off > 0 and xr is not None:
                # right edge: last `off` outputs read the right halo
                y = y + vals_loc[i][None, :] * lax.pad(
                    xr[:, :off], jnp.float32(0),
                    ((0, 0, 0), (n_loc - off, 0, 0)))
            if off > 0:
                vp = lax.pad(vals_loc[i], jnp.float32(0), ((off, -off, 0),))
                vp = vp + lax.pad(vh[i, dmax - off:], jnp.float32(0),
                                  ((0, n_loc - off, 0),))
                xs2 = lax.pad(lax.slice(x_loc, (0, 0), (1, n_loc - off)),
                              jnp.float32(0), ((0, 0, 0), (off, 0, 0)))
                y = y + vp[None, :] * xs2
                if xl is not None:
                    y = y + vp[None, :] * lax.pad(
                        xl[:, hl - off:], jnp.float32(0),
                        ((0, 0, 0), (0, n_loc - off, 0)))
        return y

    def wrap(f):
        sm = _shard_map(f, mesh=mesh, check_vma=False,
                        in_specs=(P(None, "n"), P(None, "n")),
                        out_specs=P(None, "n"))

        def call(dmx, x):
            vals = jnp.asarray(dmx.vals)
            if vals.shape[1] != np_:
                vals = jnp.pad(vals, ((0, 0), (0, np_ - vals.shape[1])))
            return sm(vals, prep(x))[0, :n]

        return call

    return {"v_current": wrap(f_current), "v_fixA": wrap(f_fixA),
            "v_fixAB": wrap(f_fixAB)}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true", help="CPU smoke")
    p.add_argument("--grid", type=int, default=512)
    p.add_argument("--json", default=None)
    args = p.parse_args(argv)
    if args.quick:
        jax.config.update("jax_platforms", "cpu")

    from tpusparse.bench.roofline import format_bytes, roofline_fraction
    from tpusparse.bench.runner import device_time, run_id
    from tpusparse.formats.dia import DiaMatrix
    from tpusparse.parallel.sparse import dia_spmm_sharded
    from tpusparse.testing import generators

    g = 64 if args.quick else args.grid
    c = generators.stencil_csr((g, g))
    dm = DiaMatrix.from_csr(c)
    assert dm.sym, "study targets the sym-storage mirror path"
    x = generators.random_sparse_vector(c.shape[0], density=0.5, seed=6)
    mesh = Mesh(np.array(jax.devices()[:1]), ("n",))
    nbytes = format_bytes(dm)
    xb = x.nbytes
    # one call touches vals + x + y (x, y each m fp32)
    traffic = nbytes + 2 * xb

    variants = build_variants(dm, mesh)
    fns = {
        "v_unsharded": lambda f, xx: f.spmv(xx),
        "v_unsharded_b1": lambda f, xx: f.spmm(xx[None, :])[0],
        "v_committed": lambda f, xx: dia_spmm_sharded(f, xx, mesh, "halo"),
        **{k: (lambda fn: (lambda f, xx: fn(f, xx)))(v)
           for k, v in variants.items()},
        "v_npart": lambda f, xx: dia_spmm_sharded(f, xx, mesh, "n"),
    }

    # correctness first (float64 oracle tolerance is enforced in tests;
    # here cross-check vs the unsharded kernel exactly)
    y0 = np.asarray(fns["v_unsharded"](dm, x))
    for k, fn in fns.items():
        yk = np.asarray(fn(dm, x))
        err = float(np.max(np.abs(yk - y0)))
        assert err <= 1e-4, f"{k} mismatch {err}"
    print("correctness ok (all variants <=1e-4 of unsharded)",
          file=sys.stderr)
    if args.quick:
        print(json.dumps({"quick": True, "ok": True}))
        return 0

    # explicit spans: the auto-scaled 576-call chains x 7 variants cost
    # more compile time than the measurement is worth; size the span off
    # the actual traffic instead (>= ~10 ms of speed-of-light work)
    k2 = int(min(320, max(64, 8 + 10e-3 / (traffic / 819e9))))
    kw = dict(bytes_moved=traffic, nnz=c.nnz, k1=8, k2=k2, reps=5,
              estimator="median" if (k2 - 8) * traffic / 819e9 < 12e-3
              else "min")
    out = {"run": run_id(), "grid": g, "format_mb": round(nbytes / 1e6, 2),
           "traffic_mb": round(traffic / 1e6, 2)}
    base = None
    for k, fn in fns.items():
        r = device_time(fn, dm, x, name=k, **kw)
        us = r.seconds * 1e6
        row = {"us": round(us, 1),
               "roofline": round(roofline_fraction(traffic, r.seconds), 3)}
        if base is None:
            base = us
        row["vs_unsharded"] = round(us / base, 3)
        out[k] = row
        print(f"  {k:16s} {us:7.1f} us  x{row['vs_unsharded']:.2f}",
              file=sys.stderr)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
