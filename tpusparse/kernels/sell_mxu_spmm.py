"""Pallas TPU kernel: decompress-to-dense SpMM (the csr_tiling strategy).

The reference's most TPU-portable kernel shape (csr_tiling.cu:74-113,
SURVEY.md §3.5: "decompress sparse block to dense tile, then dense compute
... the natural basis of the SpMM extension"): scatter each SELL window tile
(W x 128 values + int8 in-window offsets) into a dense (128, 128) VMEM tile,
then one dense MXU dot against the X tile serves EVERY batch column — unlike
the gather kernel (sell_spmv.py), whose VPU lane-gather work scales with B
(the measured ~205 gathered elements/cycle floor, BENCH.md).

The scatter is the TPU translation of the reference's popcount-ranked
shared-memory scatter (csr_tiling.cu:85-87): per packed slot w, a full-tile
``acc += where(iota_c == idx_w, vals_w, 0)`` — ~3 VPU ops over (128, 128)
per slot (additive so zero-padded slots, which alias offset 0, cannot
clobber a real c=0 entry). Cost model and the measured verdict
live in BENCH.md §SpMM-floors: the scatter costs ~32 VREG-ops per slot vs
the ~0.75 VREG-gathers per (slot, batch-column) of the gather kernel, which
makes this kernel the winner only where B is large AND density is low — and
there the dense-tile formats already stream fewer byte-equivalents. It is
kept as the measured carrier of the reference strategy, exercised by tests
and the B-sweep bench, not as a routing default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpusparse.kernels.precision import dot3
from tpusparse.utils import default_interpret

_LANES = 128
_SUB = 8


def _mxu_kernel(idx_ref, val_ref, x_ref, o_ref, *, w: int, jb: int, tw: int):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        o_ref[:] = jnp.zeros_like(o_ref)

    ci = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 0)
    for jj in range(jb):
        for t in range(tw):
            def scatter(wc, d):
                # 8-slot chunks: Mosaic needs dynamic sublane offsets to be
                # provably 8-aligned (w is a multiple of 8 by packing)
                base = pl.multiple_of(wc * _SUB, _SUB)
                iv8 = idx_ref[jj, t, pl.dslice(base, _SUB), :] \
                    .astype(jnp.int32)                          # (8, 128)
                vv8 = val_ref[jj, t, pl.dslice(base, _SUB), :]
                for s in range(_SUB):
                    # additive scatter: pad slots carry (idx=0, val=0) and
                    # a select would overwrite a real c=0 entry scattered
                    # earlier; adding zero is harmless and duplicates
                    # don't exist within a column
                    d = d + jnp.where(
                        ci == iv8[s][None, :],
                        jnp.broadcast_to(vv8[s][None, :],
                                         (_LANES, _LANES)), 0.0)
                return d

            dense = jax.lax.fori_loop(
                0, w // _SUB, scatter,
                jnp.zeros((_LANES, _LANES), jnp.float32))
            xb = x_ref[:, t * _LANES:(t + 1) * _LANES]         # (B8, 128)
            acc = dot3(xb, dense, (((1,), (0,)), ((), ())))
            o_ref[:, jj * _LANES:(jj + 1) * _LANES] += acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "w", "windows_per_step", "col_groups_per_step", "interpret"))
def sell_mxu_spmm_padded(
    idx: jax.Array,      # (nb, nt, W, 128) int8
    vals: jax.Array,     # (nb, nt, W, 128) fp32
    x: jax.Array,        # (B, M_padded)
    *,
    w: int,
    windows_per_step: int = 16,
    col_groups_per_step: int = 4,
    interpret: bool | None = None,
) -> jax.Array:          # (B8, N_padded)
    if interpret is None:
        interpret = default_interpret()
    nb, nt = vals.shape[0], vals.shape[1]
    b = x.shape[0]
    if b % _SUB:
        x = jnp.pad(x, ((0, _SUB - b % _SUB), (0, 0)))
        b = x.shape[0]
    tw = max(d for d in range(min(windows_per_step, nt), 0, -1)
             if nt % d == 0)
    jb = max(d for d in range(min(col_groups_per_step, nb), 0, -1)
             if nb % d == 0)
    grid = (nb // jb, nt // tw)
    return pl.pallas_call(
        functools.partial(_mxu_kernel, w=w, jb=jb, tw=tw),
        grid=grid,
        in_specs=[
            pl.BlockSpec((jb, tw, w, _LANES), lambda j, t: (j, t, 0, 0)),
            pl.BlockSpec((jb, tw, w, _LANES), lambda j, t: (j, t, 0, 0)),
            pl.BlockSpec((b, tw * _LANES), lambda j, t: (0, t)),
        ],
        out_specs=pl.BlockSpec((b, jb * _LANES), lambda j, t: (0, j)),
        out_shape=jax.ShapeDtypeStruct((b, nb * _LANES), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * nt * _LANES * _LANES * b,
            bytes_accessed=int(vals.size * vals.dtype.itemsize + idx.size),
            transcendentals=0,
        ),
        interpret=interpret,
    )(idx, vals, x)
