"""Pallas TPU kernel: bitmap blocked-ELL SpMV/SpMM via decompress-to-dense.

The TPU re-design of the reference's whole bitmap-kernel family:

- the *storage* idea (per-block bitmap + packed values padded to a max nnz)
  is the reference's WSP/AWSP layout (wsp.cpp:10-39, awsp.cpp:15-48);
- the *ranking* idea — position of a nonzero = popcount of preceding mask
  bits (``__popc(word & prev_mask)``, wsp.cu:37, awsp.cu:37) — becomes an
  exclusive cumulative sum over the mask along the lane axis (SURVEY.md §3.3
  names this exact translation);
- the *compute* strategy is csr_tiling's "decompress sparse block into dense
  tile, then dense FMA" (csr_tiling.cu:74-103), which SURVEY.md §3.5 calls
  the most TPU-portable kernel: the dense tile feeds the MXU;
- the reference's manual 3-stage register pipelines (awsp_ref.cu:36-171) are
  replaced by Mosaic's automatic HBM->VMEM double-buffering over the
  BlockSpec grid — the design intent (overlap value fetch with FMA) carries
  over, the register choreography does not (SURVEY.md §3.4).

Layout (see formats/bell.py): for output-column block j and contraction block
i, ``vals[j, i]`` is (128, W) — each of the 128 output columns' nonzeros in
rows [i*BM, (i+1)*BM) packed to the left and zero-padded to W — and
``bitmap[j, i]`` is (128, BM/32) uint32 with bit (m % 32) of word (m // 32)
set iff A[i*BM + m, j*128 + r] != 0.
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


def _decompress_tile(vals, mask_t, rank_t, w: int):
    """Dense (128, 128) tile from packed values + mask/rank of this m-tile.

    ``vals``: (128, W) packed rows; ``rank_t``: exclusive nnz rank of each
    position; a position's value lives at ``vals[r, rank_t]`` iff its mask
    bit is set. take_along_axis gathers within 128-lane windows (the fast
    lane-crossbar path); the static k-loop walks the W/128 windows.
    """
    dense = jnp.zeros(mask_t.shape, vals.dtype)
    for k in range(w // _LANES):
        idx = rank_t - k * _LANES
        sel = mask_t & (idx >= 0) & (idx < _LANES)
        idxc = jnp.clip(idx, 0, _LANES - 1)
        part = jnp.take_along_axis(vals[:, k * _LANES:(k + 1) * _LANES],
                                   idxc, axis=1)
        dense = dense + jnp.where(sel, part, 0)
    return dense


def _expand_bitmap(bmp, block_m: int):
    """(128, BM/32) uint32 words -> (128, BM) bool mask (the __popc inverse).

    Mosaic has no elementwise-repeat, but ``pltpu.repeat`` tiles the word
    array 32x along lanes: ``rep[:, l] == bmp[:, l % nwords]``. The converter
    (formats/bell.py _mask_to_words) therefore packs the bit for in-block
    position ``l`` into word ``l % nwords`` at bit ``l // nwords``, so the
    expansion here is one repeat + one variable shift — no cross-lane ops.
    """
    nwords = block_m // 32
    rep = pltpu.repeat(bmp, 32, axis=1)                       # (128, BM)
    shifts = jax.lax.broadcasted_iota(jnp.int32, rep.shape, 1) // nwords
    return ((rep >> shifts.astype(jnp.uint32)) & 1) > 0


def _bell_kernel(bmp_ref, car_ref, val_ref, x_ref, o_ref, *, block_m: int,
                 w: int):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        o_ref[:] = jnp.zeros_like(o_ref)

    bmp = bmp_ref[0, 0]                                       # (128, BM/32)
    carries = car_ref[0, 0]                                   # (128, BM/128)
    vals = val_ref[0, 0]                                      # (128, W)
    mask = _expand_bitmap(bmp, block_m)                       # (128, BM)

    # Exclusive rank (the reference's __popc(word & prev_mask) idiom,
    # wsp.cu:37) via the MXU: rank = mask @ strict_upper_triangular is exact
    # for 0/1 bf16 inputs because the MXU accumulates in fp32. Mosaic has no
    # cumsum lowering; this is the TPU-native popcount-ranking. The CROSS
    # m-tile carry is converter-precomputed (r2 attempt, ~0.8% extra bytes),
    # removing the sequential carry chain between m-tiles.
    ci = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 0)
    cj = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 1)
    strict_ut = (ci < cj).astype(jnp.bfloat16)

    acc = jnp.zeros(o_ref.shape, jnp.float32)                 # (128, B)
    for t in range(block_m // _LANES):
        sl = slice(t * _LANES, (t + 1) * _LANES)
        mask_t = mask[:, sl]
        m16 = mask_t.astype(jnp.bfloat16)
        rank_local = jnp.dot(m16, strict_ut,
                             preferred_element_type=jnp.float32)
        rank_t = (rank_local + carries[:, t:t + 1]
                  .astype(jnp.float32)).astype(jnp.int32)

        dense_t = _decompress_tile(vals, mask_t, rank_t, w)
        x_t = x_ref[:, sl]                                    # (B, 128)
        # 3-pass split-bf16 (kernels/precision.py): fp32 HIGHEST spent 6
        # MXU passes here and the kernel is not MXU-bound anyway
        acc = acc + dot3(dense_t, x_t, (((1,), (1,)), ((), ())))
    o_ref[:] += acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "w", "interpret"))
def bell_spmm_padded(
    bitmap: jax.Array,   # (nb, mb, 128, BM/32) uint32
    carries: jax.Array,  # (nb, mb, 128, BM/128) int32 per-m-tile ranks
    vals: jax.Array,     # (nb, mb, 128, W)
    x: jax.Array,        # (B, M_padded)
    *,
    block_m: int,
    w: int,
    interpret: bool | None = None,
) -> jax.Array:          # (N_padded, B)
    if interpret is None:
        interpret = default_interpret()
    nb, mb = vals.shape[0], vals.shape[1]
    b = x.shape[0]
    if b % 8:
        # keep the per-tile contraction on the MXU: a (128,128)x(1,128) dot
        # lowers to a VPU multi_reduction with a carried accumulator, which
        # Mosaic rejects ("only constant accumulators supported"); sublane
        # padding to 8 makes it a real matmul. x traffic is negligible vs A.
        x = jnp.pad(x, ((0, 8 - b % 8), (0, 0)))
        b = x.shape[0]
    grid = (nb, mb)
    return pl.pallas_call(
        functools.partial(_bell_kernel, block_m=block_m, w=w),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, _LANES, block_m // 32), lambda j, i: (j, i, 0, 0)),
            pl.BlockSpec((1, 1, _LANES, block_m // _LANES),
                         lambda j, i: (j, i, 0, 0)),
            pl.BlockSpec((1, 1, _LANES, w), lambda j, i: (j, i, 0, 0)),
            pl.BlockSpec((b, block_m), lambda j, i: (0, i)),
        ],
        out_specs=pl.BlockSpec((_LANES, b), lambda j, i: (j, 0)),
        out_shape=jax.ShapeDtypeStruct((nb * _LANES, b), vals.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * mb * _LANES * block_m * b,
            bytes_accessed=int(bitmap.size * 4 + vals.size * vals.dtype.itemsize),
            transcendentals=0,
        ),
        interpret=interpret,
    )(bitmap, carries, vals, x)
