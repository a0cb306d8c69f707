"""Pallas DIA SpMV: k statically-shifted FMAs with the shifts done
in-VREG instead of through XLA slice/pad materialization.

Why this kernel exists (r4, VERDICT item 2 root cause): the XLA form of
``y += vals_d * shift(x, d)`` (formats/dia.py:197) materializes every
lane-unaligned shifted stream and every mirrored-diagonal ``lax.pad`` as
a full HBM round-trip — the 1M-unknown sym 5-point Laplacian measured
51.4 us against a 25.6 us roofline (0.50), and the sharded halo body's
extra concatenates stacked more of the same on top (the 2.4x D=1 ratio
in BENCH_shard_overhead.json). Here each operand streams HBM exactly
once: x and y are viewed as (rows, 128) with position = row * 128 +
lane, a flat shift by d decomposes into a sublane shift (d // 128) plus
a lane roll (d % 128, one ``pltpu.roll`` + select), and diagonal
coefficients / mirror values never leave VREGs.

Boundary machinery (shared by the single-chip and shard_map callers):
each grid block loads an ``H_r``-row halo below and above its x slab via
clamped BlockSpec index maps; at the first/last block those halo reads
are garbage and a ``pl.program_id`` select swaps in explicit STRIP
operands instead. Zero strips implement single-chip edge masking for
free (out-of-range mirror values multiply 0); the halo partition in
``parallel/sparse.py`` passes its ``ppermute``-moved neighbor edges as
the strips, so the sharded body adds NO extra HBM traffic over the
unsharded kernel. Reference parity: the strategy translated is the CUDA
reference's per-warp shifted-window read (wsp.cu:44-63) specialized to
banded structure; there is no reference DIA kernel (SURVEY.md §2.2).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpusparse.utils import default_interpret, round_up

_LANES = 128
_SUB = 8

_MAX_OFFSETS = 32          # unrolled in-kernel; past this use the XLA path


def halo_rows(offsets, sym: bool) -> int:
    """Halo height H_r (rows of 128): enough rows that every shifted
    window of a block, mirror reads included, stays inside
    [block - H_r, block + H_r); rounded to the f32 sublane quantum."""
    mx = max((abs(d) for d in offsets), default=0)
    if sym:
        mx = max(mx, max((d for d in offsets if d > 0), default=0))
    return round_up(mx // _LANES + 1, _SUB)


def fits(offsets, sym: bool, n: int) -> bool:
    """True when the Pallas path handles this operator: few enough
    diagonals to unroll, halo within one block's reach, and at least
    one full block of rows."""
    k = len(offsets)
    if not 0 < k <= _MAX_OFFSETS:
        return False
    hr = halo_rows(offsets, sym)
    return hr <= 512 and n >= _LANES * _SUB


def _pick_rows(k: int, hr: int, nr: int) -> int:
    """Rows per grid block: ~2 MB of vals+x per step (the DMA-issue
    amortization rule, CLAUDE.md), a multiple of the halo height (halo
    blocks index as R/H_r sub-blocks), capped so the per-step VMEM
    footprint stays well under the 16 MB scoped default."""
    raw = max(64, int(2_000_000 // (_LANES * 4 * (k + 1))))
    r = hr * max(1, -(-raw // hr))
    while k * r * _LANES * 4 > 6_000_000 and r > hr:
        r -= hr
    return min(r, round_up(nr, hr))


def _dia_kernel(vals_ref, vlo_ref, vstrip_ref, x_ref, xlo_ref, xhi_ref,
                sl_ref, sr_ref, o_ref, *, offsets, sym, rows, hr, nblocks):
    j = pl.program_id(0)
    xlo = jnp.where(j == 0, sl_ref[:], xlo_ref[:])
    xhi = jnp.where(j == nblocks - 1, sr_ref[:], xhi_ref[:])
    xfull = jnp.concatenate([xlo, x_ref[:], xhi], axis=0)
    lane = lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1)

    def window(src, d):
        """(rows, 128) view of flat positions [base + d, base + d + N)
        where base = hr * 128 is the block's first position in ``src``."""
        dr, dc = d // _LANES, d % _LANES
        if dc == 0:
            return lax.slice(src, (hr + dr, 0), (hr + dr + rows, _LANES))
        r = pltpu.roll(src, shift=_LANES - dc, axis=1)
        a = lax.slice(r, (hr + dr, 0), (hr + dr + rows, _LANES))
        b = lax.slice(r, (hr + dr + 1, 0), (hr + dr + 1 + rows, _LANES))
        return jnp.where(lane < _LANES - dc, a, b)

    acc = jnp.zeros((rows, _LANES), jnp.float32)
    for i, d in enumerate(offsets):
        acc += vals_ref[i] * window(xfull, d)
        if sym and d > 0:
            vlo_i = jnp.where(j == 0, vstrip_ref[i], vlo_ref[i])
            vfull = jnp.concatenate([vlo_i, vals_ref[i]], axis=0)
            acc += window(vfull, -d) * window(xfull, -d)
    o_ref[:] = acc


@functools.partial(
    jax.jit, static_argnames=("offsets", "sym", "n", "interpret", "rows"))
def dia_spmv_pallas(
    offsets: tuple,       # static diagonal offsets, ascending
    vals: jax.Array,      # (k, n_store) f32 coefficient streams
    x: jax.Array,         # (n,)
    *,
    sym: bool,
    n: int,
    xstrip_l: jax.Array | None = None,   # (H_r * 128,) left-neighbor x
    xstrip_r: jax.Array | None = None,   # (H_r * 128,) right-neighbor x
    vstrip: jax.Array | None = None,     # (k, H_r * 128) left vals (sym)
    interpret: bool | None = None,
    rows: int | None = None,             # block-rows override (tuning)
) -> jax.Array:           # (n,) f32
    if interpret is None:
        interpret = default_interpret()
    k = len(offsets)
    hr = halo_rows(offsets, sym)
    nr = -(-n // _LANES)
    if rows is None:
        rows = _pick_rows(k, hr, nr)
    if rows % hr:
        raise ValueError(f"rows={rows} must be a multiple of the halo "
                         f"height {hr} (halo blocks index in hr units)")
    nrp = round_up(nr, rows)
    np_ = nrp * _LANES

    x = jnp.asarray(x, jnp.float32)
    if x.shape[0] != np_:
        x = jnp.pad(x, (0, np_ - x.shape[0]))
    vals = jnp.asarray(vals, jnp.float32)
    if vals.shape[1] != np_:
        vals = jnp.pad(vals, ((0, 0), (0, np_ - vals.shape[1])))
    x2 = x.reshape(nrp, _LANES)
    v2 = vals.reshape(k, nrp, _LANES)

    hs = hr * _LANES
    sl = jnp.zeros(hs, jnp.float32) if xstrip_l is None else xstrip_l
    sr = jnp.zeros(hs, jnp.float32) if xstrip_r is None else xstrip_r
    vs = jnp.zeros((k, hs), jnp.float32) if vstrip is None else vstrip
    sl2, sr2 = sl.reshape(hr, _LANES), sr.reshape(hr, _LANES)
    vs2 = vs.reshape(k, hr, _LANES)

    nblocks = nrp // rows
    rh = rows // hr
    lasth = nrp // hr - 1

    grid_spec = pl.GridSpec(
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((k, rows, _LANES), lambda j: (0, j, 0)),
            pl.BlockSpec((k, hr, _LANES),
                         lambda j: (0, jnp.maximum(j * rh - 1, 0), 0)),
            pl.BlockSpec((k, hr, _LANES), lambda j: (0, 0, 0)),
            pl.BlockSpec((rows, _LANES), lambda j: (j, 0)),
            pl.BlockSpec((hr, _LANES),
                         lambda j: (jnp.maximum(j * rh - 1, 0), 0)),
            pl.BlockSpec((hr, _LANES),
                         lambda j: (jnp.minimum((j + 1) * rh, lasth), 0)),
            pl.BlockSpec((hr, _LANES), lambda j: (0, 0)),
            pl.BlockSpec((hr, _LANES), lambda j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((rows, _LANES), lambda j: (j, 0)),
    )
    k_eff = k + (sum(1 for d in offsets if d > 0) if sym else 0)
    # scoped-VMEM: double-buffered blocks + the in-kernel concat temps;
    # past the 16 MB default raise the per-kernel limit (rsell_spmv.py
    # precedent) instead of failing to compile at large ``rows``
    need = (2 * (k + 1) * rows + 6 * hr + (rows + 2 * hr) + rows) \
        * _LANES * 4
    vmem_limit = None if need <= 14 << 20 else min(
        need + (8 << 20), 128 << 20)
    out = pl.pallas_call(
        functools.partial(_dia_kernel, offsets=tuple(offsets), sym=sym,
                          rows=rows, hr=hr, nblocks=nblocks),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nrp, _LANES), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=vmem_limit,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * k_eff * np_,
            bytes_accessed=int(vals.size + x.size + np_) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(v2, v2, vs2, x2, x2, x2, sl2, sr2)
    return out.reshape(-1)[:n]
