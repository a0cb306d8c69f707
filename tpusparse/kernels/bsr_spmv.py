"""Pallas TPU kernel: BSR block-skip SpMV/SpMM via scalar-prefetch grid.

TPU re-design of the reference's TCSR/csr_tiling path (csr_tiling.cu:24-113):
the reference stored a bitmap + compacted values per 32x32 block and
decompressed every block; here blocks are MXU-sized dense tiles and *empty
blocks are never touched at all* — the grid iterates only over stored blocks,
with scalar-prefetched block coordinates driving the BlockSpec index maps
(``pltpu.PrefetchScalarGridSpec``), so HBM traffic and FLOPs scale with the
number of nonzero blocks. This is the natural SpMM path (multi-column X on
the MXU) and the big win for block-structured sparsity, where SELL's
per-element indices pay for structure they don't need.

Blocks are sorted by output column group then by contraction block, so grid
steps that accumulate into the same output tile are consecutive and Pallas
keeps the tile resident in VMEM between them (output revisiting).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpusparse.utils import default_interpret

_LANES = 128


def _bsr_kernel(bi_ref, bj_ref, blk_ref, x_ref, o_ref):
    k = pl.program_id(0)
    prev = jnp.maximum(k - 1, 0)
    first = jnp.logical_or(k == 0, bj_ref[k] != bj_ref[prev])

    @pl.when(first)
    def _init():
        o_ref[:] = jnp.zeros_like(o_ref)

    blk = blk_ref[0]                                      # (TBm, 128)
    xb = x_ref[:]                                         # (B, TBm)
    o_ref[:] += jax.lax.dot_general(
        blk, xb, dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "n_padded", "interpret"))
def bsr_spmm_padded(
    bi: jax.Array,       # (nblk,) int32 — contraction block index
    bj: jax.Array,       # (nblk,) int32 — output block index, non-decreasing
    blocks: jax.Array,   # (nblk, TBm, 128)
    x: jax.Array,        # (B, M_padded)
    *,
    block_m: int,
    n_padded: int,
    interpret: bool | None = None,
) -> jax.Array:          # (N_padded, B8)
    if interpret is None:
        interpret = default_interpret()
    nblk = blocks.shape[0]
    b = x.shape[0]
    if b % 8:
        x = jnp.pad(x, ((0, 8 - b % 8), (0, 0)))          # MXU-friendly batch
        b = x.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((1, block_m, _LANES),
                         lambda k, bi, bj: (k, 0, 0)),
            pl.BlockSpec((b, block_m),
                         lambda k, bi, bj: (0, bi[k])),
        ],
        out_specs=pl.BlockSpec((_LANES, b),
                               lambda k, bi, bj: (bj[k], 0)),
    )
    return pl.pallas_call(
        _bsr_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_padded, b), blocks.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * int(blocks.size) * b,
            bytes_accessed=int(blocks.size * blocks.dtype.itemsize),
            transcendentals=0,
        ),
        interpret=interpret,
    )(bi, bj, blocks, x)
