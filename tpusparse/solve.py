"""Jittable iterative solvers over the packed sparse formats.

The reference stops at the kernel benchmark; the canonical *consumer* of a
fast SpMV is an iterative solver whose whole runtime IS the SpMV. ``cg``
composes with the packed formats (``fmt.spmv``), with ``jax.jit`` (pure
``lax.while_loop``, static shapes), and with the sharded maps
(``parallel.sparse.sell_spmm_sharded`` closures) — so the measured
kernel speed translates directly into solver throughput.

Convention note: the library op is ``y = x @ A`` (CSR of A.T, formats/csr.py).
For a SYMMETRIC system matrix ``S`` this equals ``S x``, so ``cg(fmt, b)``
solves ``S z = b`` when ``fmt`` packs ``S``. For a nonsymmetric ``A``, pass
the format packing ``A.T`` to apply ``A`` (or use ``normal=True`` below).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import lax


def _as_apply(a: Any) -> Callable[[jax.Array], jax.Array]:
    if callable(a) and not hasattr(a, "spmv"):
        return a
    return a.spmv


def cg(a: Any, b: jax.Array, x0: jax.Array | None = None, *,
       tol: float = 1e-5, atol: float = 0.0, maxiter: int | None = None,
       m_inv: Callable[[jax.Array], jax.Array] | None = None):
    """Conjugate gradient for ``S z = b``, ``S`` symmetric positive
    definite.

    ``a`` — a packed format (uses ``a.spmv``) or any callable
    ``v -> v @ S``; symmetry makes that ``S v``. ``m_inv`` — optional
    preconditioner application (e.g. inverse-diagonal / Jacobi).

    Stops when ``||r|| <= max(tol * ||b||, atol)`` or after ``maxiter``
    iterations (default: ``len(b)``). Returns ``(z, info)`` with
    ``info = {"iters", "resnorm"}`` (device scalars — fetching them syncs).
    Fully jittable: fixed-shape ``lax.while_loop``; every iteration is one
    SpMV + a few VPU-trivial vector ops, so solver time ~= iters x the
    format's measured SpMV time.
    """
    apply = _as_apply(a)
    b = jnp.asarray(b)
    if b.ndim != 1:
        raise ValueError(f"cg solves one system; b must be 1-D, got "
                         f"shape {b.shape}")
    n = b.shape[-1]
    maxiter = n if maxiter is None else maxiter
    x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
    prec = (lambda v: v) if m_inv is None else m_inv

    def vdot(u, v):
        # accumulate reductions in fp32 regardless of operand dtype
        return jnp.sum((u * v).astype(jnp.float32))

    r = b - apply(x)
    z = prec(r)
    p = z
    rz = vdot(r, z)
    limit2 = jnp.maximum(tol * jnp.sqrt(vdot(b, b)), atol) ** 2

    def cond(state):
        _x, r, _p, _z, _rz, k = state
        return (vdot(r, r) > limit2) & (k < maxiter)

    def body(state):
        x, r, p, z, rz, k = state
        ap = apply(p)
        alpha = rz / vdot(p, ap)
        x = x + alpha * p
        r = r - alpha * ap
        z = prec(r)
        rz_new = vdot(r, z)
        p = z + (rz_new / rz) * p
        return x, r, p, z, rz_new, k + 1

    x, r, _p, _z, _rz, k = lax.while_loop(
        cond, body, (x, r, p, z, rz, jnp.int32(0)))
    return x, {"iters": k, "resnorm": jnp.sqrt(vdot(r, r))}


def jacobi_preconditioner(diag: jax.Array,
                          eps: float = 1e-12) -> Callable[[jax.Array],
                                                          jax.Array]:
    """Inverse-diagonal preconditioner ``v -> v / diag`` for ``cg``;
    ``diag`` is the system matrix's diagonal (host or device array)."""
    inv = 1.0 / (jnp.asarray(diag) + eps)

    def apply(v):
        return v * inv

    return apply
