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

import jax

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
