"""Differentiable sparse linear maps: ``y = x @ A`` with a custom VJP.

The reference is an inference benchmark (no gradients anywhere); a JAX-native
framework should compose with ``jax.grad`` so the sparse op can sit inside a
training loop. For a LINEAR map the rule is exact:

    y = x @ A        =>        dL/dx = g @ A.T        (g = dL/dy)

so the backward pass is just another SpMV/SpMM through a format packed from
``A.T``. ``linear_map`` builds both directions and registers the VJP; the
packed values are treated as constants (the frozen-sparse-weights regime —
masked pruning, MoE expert tables, serving-time adapters). Gradients w.r.t.
the *values* are intentionally not provided: they are dense in the mask
(dL/dA[m,j] = x[m] * g[j] on stored slots), which a training setup wants
fused into its optimizer layout, not materialized per step here.

Both directions ride the same Pallas kernels, so the backward pass has the
forward pass's byte ratio — on a d=0.1 matrix the VJP is also ~3x faster
than a dense MXU matmul (BENCH.md).
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np

import jax
import jax.numpy as jnp

from tpusparse.formats.csr import CsrMatrix


def linear_map(fmt: Any, fmt_t: Any = None, *,
               csr: CsrMatrix | None = None) -> Callable[[Any], jax.Array]:
    """``apply(x) -> x @ A`` (1-D spmv or 2-D row-batch spmm), differentiable
    w.r.t. ``x`` under jit/grad/vmap.

    ``fmt``   — any packed format with spmv/spmm (SELL, TCSR, RSELL, ...).
    ``fmt_t`` — same-API format packed from ``A.T`` for the backward pass.
       Omitted: packed automatically as ``type(fmt).from_csr(csr.transpose())``
       when ``csr`` (the CSR ``fmt`` was packed from) is given, else from
       ``fmt.to_dense().T`` (host round-trip — fine for moderate sizes,
       pass ``csr`` for matrices you never want dense).
    """
    if fmt_t is None:
        cls = type(fmt)
        if csr is not None:
            fmt_t = cls.from_csr(csr.transpose())
        else:
            fmt_t = cls.from_dense(fmt.to_dense().T)
    m, n = fmt.shape
    if tuple(fmt_t.shape) != (n, m):
        raise ValueError(
            f"fmt_t.shape {tuple(fmt_t.shape)} is not the transpose of "
            f"fmt.shape {(m, n)}")

    def _run(f: Any, v: jax.Array) -> jax.Array:
        return f.spmv(v) if v.ndim == 1 else f.spmm(v)

    @jax.custom_vjp
    def apply(x):
        return _run(fmt, x)

    def fwd(x):
        return _run(fmt, x), None

    def bwd(_res, g):
        return (_run(fmt_t, g),)

    apply.defvjp(fwd, bwd)
    return apply


_DUAL_PARTITION = {"n": "m", "m": "n", "ring": "ring"}


def linear_map_sharded(fmt: Any, fmt_t: Any, mesh: Any,
                       partition: str = "n") -> Callable[[Any], jax.Array]:
    """Differentiable ``x @ A`` over a device mesh (SELL formats).

    The backward pass is ``g @ A.T`` under the DUAL partition: an
    output-column shard of A is a contraction shard of A.T (and vice
    versa), so the transpose format reuses the same mesh axis — forward
    ``n`` pairs with backward ``m`` (whose partial sums psum over ICI),
    and ``ring`` is self-dual. Values are frozen, as in ``linear_map``.
    """
    from tpusparse.parallel.sparse import sell_spmm_sharded

    m, n = fmt.shape
    if tuple(fmt_t.shape) != (n, m):
        raise ValueError(
            f"fmt_t.shape {tuple(fmt_t.shape)} is not the transpose of "
            f"fmt.shape {(m, n)}")
    dual = _DUAL_PARTITION[partition]

    @jax.custom_vjp
    def apply(x):
        return sell_spmm_sharded(fmt, x, mesh, partition)

    def fwd(x):
        return sell_spmm_sharded(fmt, x, mesh, partition), None

    def bwd(_res, g):
        return (sell_spmm_sharded(fmt_t, g, mesh, dual),)

    apply.defvjp(fwd, bwd)
    return apply


def trainable_linear(csr: CsrMatrix):
    """Sparse-weight TRAINING: ``apply(vals, x) = x @ A`` differentiable in
    both the packed SELL values and ``x``.

    Returns ``(apply, vals0, mask)``:
      - ``vals0``: the packed (nb, nt, w, 128) fp32 parameter array — use it
        as the trainable leaf in your optimizer state;
      - ``mask``:  bool array of the same shape, True on real slots. The
        value cotangent is masked, so gradient-driven updates never touch
        pad slots; updates that move parameters without gradients (weight
        decay, some EMA schemes) must apply the mask themselves (standard
        masked-pruning practice) — a nonzero pad slot WOULD contribute to
        the forward product (its in-window index aliases offset 0).

    Both cotangents are exact and cheap:
      - d/dx   = g @ A.T — one SpMV/SpMM through a transpose-packed layout
        whose values are regenerated from the live ``vals`` by a
        precomputed O(nnz) slot permutation (so training updates are seen);
      - d/dvals[slot] = x[m(slot)] * g[col(slot)] — the same 128-lane
        in-window gather the forward kernel uses, as a closed form.

    The reference has no training story at all; this is the JAX-native
    extension that turns every format-measurement above into a usable
    sparse layer (frozen mask, live values — the standard pruned-training
    regime).
    """
    from tpusparse.formats.sell import (SellMatrix, _sorted_rows,
                                        sell_slot_flat)

    csr = _sorted_rows(csr)
    fmt = SellMatrix.from_csr(csr)
    csr_t = csr.transpose()
    fmt_t = SellMatrix.from_csr(csr_t)
    flat_f = sell_slot_flat(csr, fmt.w)
    flat_t = sell_slot_flat(csr_t, fmt_t.w)
    # transpose-entry i is forward-entry order[i] (csr.transpose's stable
    # counting sort); map every transpose slot to its forward flat slot
    order = np.argsort(csr.col_idx, kind="stable")
    t_map = np.full(int(np.prod(fmt_t.vals.shape)), -1, dtype=np.int64)
    t_map[flat_t] = flat_f[order]
    mask_np = np.zeros(int(np.prod(fmt.vals.shape)), dtype=bool)
    mask_np[flat_f] = True
    mask = mask_np.reshape(fmt.vals.shape)

    idx = jnp.asarray(fmt.idx)
    idx_t = jnp.asarray(fmt_t.idx)
    t_map_j = jnp.asarray(t_map)
    t_gather = jnp.clip(t_map_j, 0)
    t_live = (t_map_j >= 0)
    mask_j = jnp.asarray(mask)
    m, n = fmt.shape
    mp, np_pad = fmt.padded
    nt = fmt.vals.shape[1]
    nb = fmt.vals.shape[0]

    def _fwd_fmt(vals):
        return SellMatrix(idx, vals, fmt.shape, fmt.padded, fmt.w, fmt.nnz)

    def _bwd_fmt(vals):
        vals_t = jnp.where(t_live, vals.ravel()[t_gather], 0.0)
        return SellMatrix(idx_t, vals_t.reshape(fmt_t.vals.shape),
                          fmt_t.shape, fmt_t.padded, fmt_t.w, fmt_t.nnz)

    def _run(f, v):
        return f.spmv(v) if v.ndim == 1 else f.spmm(v)

    def _vals_grad(x, g):
        """Closed-form value cotangent, batched over leading dims of x/g."""
        x2 = jnp.atleast_2d(jnp.asarray(x))
        g2 = jnp.atleast_2d(g)
        xw = jnp.pad(x2, ((0, 0), (0, mp - x2.shape[1])))
        xw = xw.reshape(-1, nt, 1, 128)                    # (B, nt, 1, 128)
        gw = jnp.pad(g2, ((0, 0), (0, np_pad - g2.shape[1])))
        gw = gw.reshape(-1, nb, 128)                       # (B, nb, 128)

        def one(xb, gb):
            # xg[j,t,s,r] = x[t*128 + idx[j,t,s,r]] — 128-lane in-window
            # gather, identical to the forward kernel's access pattern
            xg = jnp.take_along_axis(
                jnp.broadcast_to(xb[None], idx.shape),
                idx.astype(jnp.int32), axis=3)
            return xg * gb[:, None, None, :]
        dv = jax.vmap(one)(xw, gw).sum(0)
        return jnp.where(mask_j, dv, 0.0)

    @jax.custom_vjp
    def apply(vals, x):
        return _run(_fwd_fmt(vals), x)

    def fwd(vals, x):
        return _run(_fwd_fmt(vals), x), (vals, x)

    def bwd(res, g):
        vals, x = res
        dx = _run(_bwd_fmt(vals), g)
        return _vals_grad(x, g), dx

    apply.defvjp(fwd, bwd)
    return apply, jnp.asarray(fmt.vals), mask
