"""3-pass split-bf16 matmul for Pallas kernels (fp32-grade on the MXU).

Mosaic supports ``Precision.DEFAULT`` (1 bf16 pass — fails the library's
1e-3 tolerance on 4k-long contractions) and ``Precision.HIGHEST`` (6
passes — measured 1.5-1.7x slower than the HBM stream it accompanies), but
not ``Precision.HIGH``. This implements the 3-pass scheme by hand: split
each fp32 operand into bf16 ``hi + lo``, accumulate ``hi*hi + hi*lo +
lo*hi`` in fp32, drop ``lo*lo``. Measured max|err| ~2e-4 on the canonical
4096x0.5 workload — 5x inside the reference tolerance (tester.cpp:75) —
at speed-of-light HBM throughput (BENCH.md, BSR section).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def split_bf16(v: jax.Array) -> tuple[jax.Array, jax.Array]:
    """fp32 -> (hi, lo) bf16 pair with v ~= hi + lo."""
    hi = v.astype(jnp.bfloat16)
    lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def dot3(lhs: jax.Array, rhs: jax.Array, dimension_numbers) -> jax.Array:
    """fp32-grade dot_general as three bf16 MXU passes (fp32 accumulate)."""
    def bdot(l, r):
        return jax.lax.dot_general(
            l, r, dimension_numbers=dimension_numbers,
            preferred_element_type=jnp.float32)

    lh, ll = split_bf16(lhs)
    rh, rl = split_bf16(rhs)
    return bdot(lh, rh) + bdot(ll, rh) + bdot(lh, rl)


def dot2_exact_lhs(lhs: jax.Array, rhs: jax.Array,
                   dimension_numbers) -> jax.Array:
    """Two-pass variant for an lhs that is exactly representable in bf16
    (e.g. a ones matrix used as an MXU reduction): lhs @ (hi + lo) with
    fp32 accumulation is exact up to the split residual (~2^-17 relative)."""
    def bdot(l, r):
        return jax.lax.dot_general(
            l, r, dimension_numbers=dimension_numbers,
            preferred_element_type=jnp.float32)

    l = lhs.astype(jnp.bfloat16)
    rh, rl = split_bf16(rhs)
    return bdot(l, rh) + bdot(l, rl)
