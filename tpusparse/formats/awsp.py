"""AWSP: SELL weight compression + activation window-skip plan.

The TPU equivalent of the reference's combined weight+activation-sparse
formats (`AWSPMatrix`, awsp.cpp:3-65; `AWSPRefMatrix`, awsp_ref.cpp:4-78):
A is packed once with the SELL converter (bytes ∝ nnz(A)); each product call
builds an O(M) host-side plan of the 128-row m-windows where X has any
nonzero, and the kernel's grid only visits those (kernels/awsp_spmv.py).

Padding convention: one extra all-zero window is appended on the window axis
(index ``nt``); plan padding and empty-X both point there.
"""

from __future__ import annotations

from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from tpusparse.formats.sell import sell_pack
from tpusparse.utils import round_up

_LANES = 128
_SUB = 8


@jax.tree_util.register_pytree_node_class
class AwspMatrix:
    def __init__(self, idx: Any, vals: Any, shape, padded, w: int, nnz: int):
        self.idx = idx              # (nb, nt + 1, W, 128) int8
        self.vals = vals            # (nb, nt + 1, W, 128)
        self.shape = shape
        self.padded = padded        # (mp, np) BEFORE the extra zero window
        self.w = w
        self.nnz = nnz

    def tree_flatten(self):
        return ((self.idx, self.vals),
                (self.shape, self.padded, self.w, self.nnz))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @classmethod
    def from_dense(cls, a: np.ndarray, w: int | None = None) -> "AwspMatrix":
        p = sell_pack(a, w=w)
        idx, vals = p["idx"], p["vals"]
        nb, nt, wd, _ = vals.shape
        zpad = ((0, 0), (0, 1), (0, 0), (0, 0))
        return cls(np.pad(idx, zpad), np.pad(vals, zpad), p["shape"],
                   p["padded"], p["w"], p["nnz"])

    def device_bytes(self, x: np.ndarray | None = None) -> int:
        """Bytes the kernel streams: all windows, or only X-active ones."""
        vals = self.vals
        nb, nt1, wd, lanes = vals.shape
        # consecutive identical plan entries (the zero-window padding) hit
        # the same block and are not re-fetched by the grid pipeline
        na = nt1 - 1 if x is None else len(np.unique(self.plan(np.asarray(x))))
        return nb * na * wd * lanes * (vals.dtype.itemsize + 1)

    def to_dense(self) -> np.ndarray:
        from tpusparse.formats.sell import SellMatrix

        idx = np.asarray(self.idx)[:, :-1]
        vals = np.asarray(self.vals)[:, :-1]
        return SellMatrix(idx, vals, self.shape, self.padded, self.w,
                          self.nnz).to_dense()

    def plan(self, x2d: np.ndarray) -> np.ndarray:
        """Active-window ids for this activation, padded with the zero window.

        Padded to a multiple of 8 entries so jit sees few distinct grids.
        """
        x2d = np.asarray(x2d)
        if x2d.ndim == 1:
            x2d = x2d[None, :]
        m = self.shape[0]
        mp, _ = self.padded
        nt = mp // _LANES
        xw = np.zeros(mp, dtype=bool)
        xw[:m] = (x2d[:, :m] != 0).any(axis=0)
        active = np.nonzero(xw.reshape(nt, _LANES).any(axis=1))[0]
        size = max(round_up(active.size, 8), 8)
        out = np.full(size, nt, dtype=np.int32)
        out[:active.size] = active
        return out

    def _full_plan(self) -> np.ndarray:
        """Every window, padded to a multiple of 8 with the zero window."""
        mp, _ = self.padded
        nt = mp // _LANES
        out = np.full(max(round_up(nt, 8), 8), nt, dtype=np.int32)
        out[:nt] = np.arange(nt, dtype=np.int32)
        return out

    def _run(self, x2d: Any, plan: np.ndarray | None = None):
        from tpusparse.kernels.awsp_spmv import awsp_spmm_padded

        xj = jnp.asarray(x2d)
        if plan is None:
            # The window-skip plan needs concrete activations; under jit
            # tracing (abstract x) fall back to visiting every window —
            # the same degenerate behavior the reference's runtime x==0
            # check has when nothing is known about x ahead of time.
            if isinstance(xj, jax.core.Tracer):
                plan = self._full_plan()
            else:
                plan = self.plan(np.asarray(x2d))
        mp, _ = self.padded
        xp = jnp.pad(xj, ((0, 0), (0, mp + _LANES - xj.shape[1])))
        out = awsp_spmm_padded(jnp.asarray(plan), self.idx, self.vals,
                               xp, w=self.w)
        return out[::_SUB, :self.shape[1]]

    def spmv(self, x: Any) -> jax.Array:
        return self._run(jnp.asarray(x)[None, :])[0]

    def spmm(self, x: Any) -> jax.Array:
        return self._run(jnp.asarray(x))
