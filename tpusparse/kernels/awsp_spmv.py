"""Pallas TPU kernel: AWSP — weight-compressed SELL + activation window-skip.

The reference's flagship kernels (awsp.cu:5-317, awsp_ref.cu:6-185) exploit
BOTH sparsities at once: weight sparsity via bitmap-packed A values and
activation sparsity via per-lane load/FMA skips when the broadcast x is zero
(awsp.cu:95-107, awsp_ref.cu:52,96). Per-lane skips are free on SIMT and
worthless on a SIMD VPU (see asp_spmv.py), so the TPU-native combination is:

- weight sparsity: the SELL layout (converter-ranked int8 indices + padded
  values, see sell_spmv.py) — bytes scale with nnz(A);
- activation sparsity: the ASP window-skip plan (asp_spmv.py) — the grid's
  contraction dimension enumerates only the 128-row m-windows where X has a
  survivor, driven by a scalar-prefetched window list. DMA traffic for the
  values of a skipped window is never issued, so bytes scale with
  nnz(A restricted to active windows).

On i.i.d. random X every window has survivors and this degenerates to plain
SELL (the same honesty note as asp_spmv.py: the reference's per-element skip
also saves nothing on the memory side at 50% i.i.d. sparsity — values are
fetched per 128-bit sector regardless). On structured activations (ReLU
blocks, MoE routing, padded batches) traffic drops proportionally.

Zero-window padding trick: vals/idx carry one extra all-zero window at index
``nt`` and X is padded with a matching zero window; plan padding points there,
so padded grid steps contribute exactly 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpusparse.utils import default_interpret

_LANES = 128
_SUB = 8


def _awsp_kernel(win_ref, idx_ref, val_ref, x_ref, o_ref, *, w: int,
                 batch: int):
    del win_ref  # consumed by the index maps
    @pl.when(pl.program_id(1) == 0)
    def _init():
        o_ref[:] = jnp.zeros_like(o_ref)

    ones = jnp.ones((_SUB, w), jnp.float32)
    idx = idx_ref[0, 0].astype(jnp.int32)                 # (W, 128)
    vals = val_ref[0, 0]                                  # (W, 128)
    for b in range(batch):
        xw = x_ref[b:b + 1, :]                            # (1, 128)
        xg = jnp.take_along_axis(
            jnp.broadcast_to(xw, (w, _LANES)), idx, axis=1)
        prod = vals * xg
        acc = jax.lax.dot_general(
            ones, prod, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        o_ref[b * _SUB:(b + 1) * _SUB, :] += acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("w", "interpret"))
def awsp_spmm_padded(
    win: jax.Array,      # (na,) int32 active-window ids; pads point at nt
    idx: jax.Array,      # (nb, nt + 1, W, 128) int8 — last window all-zero
    vals: jax.Array,     # (nb, nt + 1, W, 128) — last window all-zero
    x: jax.Array,        # (B, (nt + 1) * 128) — last window all-zero
    *,
    w: int,
    interpret: bool | None = None,
) -> jax.Array:          # (B * 8, N_padded): row b*8 holds y_b
    if interpret is None:
        interpret = default_interpret()
    nb = vals.shape[0]
    b = x.shape[0]
    na = win.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb, na),
        in_specs=[
            pl.BlockSpec((1, 1, w, _LANES), lambda j, t, win: (j, win[t], 0, 0)),
            pl.BlockSpec((1, 1, w, _LANES), lambda j, t, win: (j, win[t], 0, 0)),
            pl.BlockSpec((b, _LANES), lambda j, t, win: (0, win[t])),
        ],
        out_specs=pl.BlockSpec((b * _SUB, _LANES), lambda j, t, win: (0, j)),
    )
    return pl.pallas_call(
        functools.partial(_awsp_kernel, w=w, batch=b),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b * _SUB, nb * _LANES), vals.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * na * w * _LANES * b,
            bytes_accessed=nb * na * w * _LANES
            * (vals.dtype.itemsize + 1),
            transcendentals=0,
        ),
        interpret=interpret,
    )(win, idx, vals, x)
