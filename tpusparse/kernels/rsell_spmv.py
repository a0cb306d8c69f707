"""Pallas TPU kernel: ragged SELL as a stream of 8-slot chunks.

SELL (kernels/sell_spmv.py) pays one GLOBAL width W for every (window,
column-group) tile; binned SELL recovers some of that with 2-3 bucket
widths. This kernel removes the shape constraint entirely: the converter
emits, per kept tile, ceil(tile_demand / 8) chunks of (8 slots x 128
lanes), and the kernel consumes a flat chunk stream whose (group, window)
coordinates ride scalar prefetch — the same plan machinery as
kernels/bsr_spmv.py. Consequences:

- per-TILE padding only (to 8 slots): strictly fewer bytes than SELL's
  global W or binned's bucket widths on skewed matrices;
- all-zero tiles emit no chunks at all (block skip for free);
- chunk counts are DATA, not shapes: shards of different raggedness run one
  uniform program — per-shard loads are balanced by assignment and padded
  with zero chunks (idx=0, val=0 gathers add 0.0), killing the divisibility
  ValueErrors of the shape-based sharded paths (VERDICT r1 missing #3).

Ancestry: per-warp ragged padding + per-warp base offsets of the
reference's AWSPRefMatrix (awsp_ref.cpp:25-40) — the chunk stream is the
chip-level generalization where every tile gets its own "warp max".

X and Y live whole in VMEM (wide shape only): a (B, 4096) X at B<=32 is
<=512 KB. For huge N*B use SELL/TCSR instead; the format raises early.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpusparse.kernels.precision import dot2_exact_lhs
from tpusparse.utils import default_interpret

_LANES = 128
_SUB = 8

_WIDE_VMEM_LIMIT = 8 * 1024 * 1024      # comfort zone: no limit override
_WIDE_VMEM_CAP = 96 * 1024 * 1024        # hard cap (v5e VMEM is 128 MB)


def wide_fits(m: int, n: int, batch: int = 1) -> bool:
    """True when the wide kernel's whole-in-VMEM X/Y budget admits a
    (batch, m) x (m, n) product — the SAME formula the kernel enforces
    below, exported so carrier-choosing callers (amg._pack) cannot
    drift from it."""
    from tpusparse.utils import round_up

    need = (batch * round_up(m, _LANES)
            + round_up(n, _LANES) * batch * _SUB) * 4
    return need <= _WIDE_VMEM_CAP


def _rsell_kernel(cj_ref, ct_ref, idx_ref, val_ref, x_ref, o_ref, *,
                  c: int, batch: int):
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _init():
        o_ref[:] = jnp.zeros_like(o_ref)

    ones = jnp.ones((_SUB, _SUB), jnp.float32)
    for i in range(c):
        g = k * c + i
        cj = cj_ref[g]
        ct = ct_ref[g]
        idx8 = idx_ref[i].astype(jnp.int32)                  # (8, 128)
        v8 = val_ref[i].astype(jnp.float32)
        cols = pl.dslice(cj * _LANES, _LANES)
        for b in range(batch):
            xw = x_ref[b:b + 1, pl.dslice(ct * _LANES, _LANES)]
            xg = jnp.take_along_axis(
                jnp.broadcast_to(xw, (_SUB, _LANES)), idx8, axis=1)
            acc = dot2_exact_lhs(ones, v8 * xg, (((1,), (0,)), ((), ())))
            o_ref[b * _SUB:(b + 1) * _SUB, cols] += acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_padded", "interpret"))
def rsell_spmm_padded(
    cj: jax.Array,       # (nchunk,) int32 — output group per chunk
    ct: jax.Array,       # (nchunk,) int32 — contraction window per chunk
    idx: jax.Array,      # (nchunk, 8, 128) int8 in-window offsets
    vals: jax.Array,     # (nchunk, 8, 128)
    x: jax.Array,        # (B, M_padded)
    *,
    n_padded: int,
    interpret: bool | None = None,
) -> jax.Array:          # (B * 8, N_padded): row b*8 holds y_b
    if interpret is None:
        interpret = default_interpret()
    nchunk = vals.shape[0]
    b = x.shape[0]
    need = (x.size + n_padded * b * _SUB) * x.dtype.itemsize
    if need > _WIDE_VMEM_CAP:
        raise ValueError(
            f"rsell keeps X and Y whole in VMEM; B={b} x N={n_padded} "
            f"exceeds the {_WIDE_VMEM_CAP >> 20} MB budget — use "
            f"SellMatrix/TcsrMatrix for this shape")
    # Past the default scoped-VMEM comfort zone, raise the per-kernel
    # limit instead of refusing: v5e VMEM is 128 MB, and the whole-in-VMEM
    # X/Y + double-buffered chunk stream is the fast shape for thin-band
    # matrices (AMG prolongators: a tiled-output carrier pays a per-tile
    # DMA-issue floor ~30x the byte roofline, BENCH.md §Solver).
    vmem_limit = None if need <= _WIDE_VMEM_LIMIT \
        else min(need + (8 << 20), 128 << 20)
    # chunks per step: the shared bytes-targeting rule (tune.blocks_per_step),
    # capped at 128 to bound the unrolled kernel body; pack-time
    # 128-alignment of long lists keeps the divisor snap from degrading
    from tpusparse.tune import blocks_per_step

    c = blocks_per_step(_SUB * _LANES * (vals.dtype.itemsize + 1),
                        nchunk, cap=128)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nchunk // c,),
        in_specs=[
            pl.BlockSpec((c, _SUB, _LANES), lambda k, cj, ct: (k, 0, 0)),
            pl.BlockSpec((c, _SUB, _LANES), lambda k, cj, ct: (k, 0, 0)),
            pl.BlockSpec(x.shape, lambda k, cj, ct: (0, 0)),
        ],
        out_specs=pl.BlockSpec((b * _SUB, n_padded),
                               lambda k, cj, ct: (0, 0)),
    )
    return pl.pallas_call(
        functools.partial(_rsell_kernel, c=c, batch=b),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b * _SUB, n_padded), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=vmem_limit,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * int(vals.size) * b,
            bytes_accessed=int(vals.size * vals.dtype.itemsize + idx.size),
            transcendentals=0,
        ),
        interpret=interpret,
    )(cj, ct, idx, vals, x)
