"""Pallas TPU kernel: activation-sparse SpMV/SpMM over dense A ("ASP").

The reference's ASP family keeps A fully dense (reordered into blocks,
asp.cpp:5-13) and skips multiply-accumulates whenever the broadcast x value
is zero (``cur_x == 0`` skip, asp.cu:20-27) — a per-lane trick that is free
on SIMT hardware and worthless on a SIMD VPU, where all 128 lanes step
together whether or not one of them would have skipped.

The TPU-native translation exploits X-sparsity at the granularity the
hardware can actually skip: whole 128-element m-windows. The host computes
the list of windows where X has any nonzero (the "plan" — O(M) on a vector
the host already owns); the kernel's grid iterates only over active windows,
with the scalar-prefetched window list driving the A and X index maps. HBM
traffic and FLOPs scale with the number of active windows: zero savings on
i.i.d. random X (every window has survivors — measured and documented), and
proportional savings on structured activations (ReLU blocks, MoE routing,
padded batches), which is where the reference's trick actually mattered too.

The dense-A window list trick: A and X are padded with one extra all-zero
window; plan padding points there, so padded grid steps contribute nothing.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpusparse.kernels.precision import dot3
from tpusparse.utils import default_interpret, round_up

_LANES = 128


def _asp_kernel(win_ref, x_ref, a_ref, o_ref):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        o_ref[:] = jnp.zeros_like(o_ref)

    # 3-pass split-bf16 matmul: fp32 HIGHEST costs 6 MXU passes and left
    # this kernel compute-bound at 65% of roofline (BENCH.md)
    o_ref[:] += dot3(
        x_ref[:], a_ref[:], (((1,), (0,)), ((), ())),
    ).astype(o_ref.dtype)


def _asp_pallas(win_ids, grid_t, x_pad, a_pad, *, block_n: int,
                interpret: bool, na_cost: int):
    """Shared builder: ``grid_t`` is the contraction grid size — a python
    int (static exact plan) or a traced int32 scalar (device-computed
    active count, Mosaic dynamic grid bound)."""
    b = x_pad.shape[0]
    n_pad = a_pad.shape[1]
    grid = (n_pad // block_n, grid_t)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, _LANES), lambda j, t, win: (0, win[t])),
            pl.BlockSpec((_LANES, block_n), lambda j, t, win: (win[t], j)),
        ],
        out_specs=pl.BlockSpec((b, block_n), lambda j, t, win: (0, j)),
    )
    return pl.pallas_call(
        _asp_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n_pad), a_pad.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * na_cost * _LANES * n_pad * b,
            bytes_accessed=na_cost * _LANES * n_pad * a_pad.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(win_ids, x_pad, a_pad)


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def _asp_call(win_ids, x_pad, a_pad, *, block_n: int, interpret: bool):
    na = win_ids.shape[0]
    return _asp_pallas(win_ids, na, x_pad, a_pad, block_n=block_n,
                       interpret=interpret, na_cost=na)


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def _asp_call_dynamic(x_pad, a_pad, *, block_n: int, interpret: bool):
    """Zero-host-cost dynamic window skip: activity mask, compacted window
    ids, and count computed on device; the grid's contraction bound is the
    traced count (see kernels/awsp_spmv.py device_group_plan — same scheme
    at window granularity). One compile serves every activation pattern —
    the TPU form of the reference's per-call ``cur_x == 0`` skip
    (asp.cu:20-27)."""
    from tpusparse.kernels.awsp_spmv import device_group_plan

    nt = a_pad.shape[0] // _LANES - 1            # real windows
    plan, k = device_group_plan(x_pad, nt, _LANES)
    return _asp_pallas(plan, k, x_pad, a_pad, block_n=block_n,
                       interpret=interpret, na_cost=nt)


@jax.tree_util.register_pytree_node_class
class AspMatrix:
    """Dense A prepared for window-skip activation-sparse products."""

    def __init__(self, a_pad, shape, block_n: int):
        self.a_pad = a_pad            # (Mp + 128, Np): trailing zero window
        self.shape = shape
        self.block_n = block_n

    def tree_flatten(self):
        return (self.a_pad,), (self.shape, self.block_n)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)

    @classmethod
    def _io_rebuild(cls, aux, leaves):
        """Rebuild from npz leaves (formats/io.py hook)."""
        if len(leaves) != 1:
            raise ValueError(f"{len(leaves)} leaves, expected 1")
        return cls.tree_unflatten(aux, (leaves[0],))

    def __repr__(self) -> str:
        return (f"AspMatrix(shape={self.shape}, block_n={self.block_n}, "
                f"dense {self.device_bytes() / 1e6:.1f} MB + window-skip "
                f"plans)")

    @classmethod
    def from_dense(cls, a: np.ndarray, block_n: int = 2048) -> "AspMatrix":
        # default block_n: measured 558 GB/s at 512 (256 grid steps pay
        # ~0.2 us DMA-issue each) vs 751 GB/s at 2048 (BENCH.md)
        a = np.asarray(a)
        m, n = a.shape
        mp, np_ = round_up(m, _LANES), round_up(n, block_n)
        a_pad = np.zeros((mp + _LANES, np_), a.dtype)   # extra zero window
        a_pad[:m, :n] = a
        return cls(a_pad, (m, n), block_n)

    @classmethod
    def from_csr(cls, csr, block_n: int = 2048) -> "AspMatrix":
        """ASP's format IS a (padded) dense array (the reference stores all
        M*N values too, asp.cpp:5-13), so this necessarily materializes
        (m, n) memory — it exists so ``auto_format`` can route >60%-dense
        CSR input (where CSR triplets already outweigh dense) without a
        special case."""
        return cls.from_dense(csr.to_dense(), block_n=block_n)

    def device_bytes(self) -> int:
        a = self.a_pad
        return int(np.prod(a.shape)) * a.dtype.itemsize

    def to_dense(self) -> np.ndarray:
        return np.asarray(self.a_pad)[:self.shape[0], :self.shape[1]]

    def plan(self, x: np.ndarray) -> np.ndarray:
        """Active-window ids for this activation, padded with the zero window."""
        x = np.asarray(x)
        m = self.shape[0]
        mp = self.a_pad.shape[0] - _LANES
        nt = mp // _LANES
        xw = np.zeros(mp, dtype=bool)
        flat = x.reshape(-1, x.shape[-1]) if x.ndim > 1 else x[None, :]
        xw[:m] = (flat != 0).any(axis=0)
        active = np.nonzero(xw.reshape(nt, _LANES).any(axis=1))[0]
        if active.size == 0:
            active = np.array([nt])                     # only the zero window
        # exact-sized on purpose: a padded entry pointing at the zero window
        # would be re-DMAed every step (see formats/awsp.py plan())
        return active.astype(np.int32)

    def _full_plan(self) -> np.ndarray:
        """Every window — the degenerate plan used under jit tracing."""
        nt = (self.a_pad.shape[0] - _LANES) // _LANES
        return np.arange(nt, dtype=np.int32)

    def _run(self, x2d, plan=None) -> jax.Array:
        xj = jnp.asarray(x2d)
        b = xj.shape[0]
        mp_tot, np_ = self.a_pad.shape
        xp = jnp.pad(xj, ((0, round_up(max(b, 1), 8) - b),
                          (0, mp_tot - xj.shape[1])))
        if (plan is None and isinstance(xj, jax.core.Tracer)) \
                or (isinstance(plan, str) and plan == "device"):
            # device-side dynamic skip (see _asp_call_dynamic): no host
            # round-trip, one compile for every activation pattern
            y = _asp_call_dynamic(xp, jnp.asarray(self.a_pad),
                                  block_n=self.block_n,
                                  interpret=default_interpret())
            return y[:b, :self.shape[1]]
        win = self.plan(np.asarray(x2d)) if plan is None else np.asarray(plan)
        y = _asp_call(jnp.asarray(win), xp, jnp.asarray(self.a_pad),
                      block_n=self.block_n, interpret=default_interpret())
        return y[:b, :self.shape[1]]

    def spmv(self, x, plan=None) -> jax.Array:
        """``plan``: None (host-exact plan for concrete x, device-dynamic
        under jit tracing), a precomputed ``self.plan(x)`` array, or
        ``"device"`` to force the dynamic path."""
        return self._run(jnp.asarray(x)[None, :], plan=plan)[0]

    def spmm(self, x, plan=None) -> jax.Array:
        return self._run(jnp.asarray(x), plan=plan)
