"""3-pass split-bf16 matmul accuracy (kernels/precision.py)."""

import numpy as np

import jax.numpy as jnp

from tpusparse.kernels.precision import dot2_exact_lhs, dot3, split_bf16

_MM = (((1,), (0,)), ((), ()))


def test_split_reconstructs():
    rng = np.random.default_rng(0)
    v = rng.uniform(-1, 1, (64, 128)).astype(np.float32)
    hi, lo = split_bf16(jnp.asarray(v))
    rec = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
    assert np.abs(rec - v).max() <= 2 ** -16


def test_dot3_matches_fp64_within_tolerance():
    rng = np.random.default_rng(1)
    a = rng.uniform(-1, 1, (8, 2048)).astype(np.float32)
    b = rng.uniform(-1, 1, (2048, 256)).astype(np.float32)
    y = np.asarray(dot3(jnp.asarray(a), jnp.asarray(b), _MM))
    y64 = a.astype(np.float64) @ b.astype(np.float64)
    # library contract is 1e-3 abs (tester.cpp:75); dot3 holds ~2e-4
    assert np.abs(y - y64).max() <= 5e-4


def test_dot2_exact_lhs_ones_reduction():
    rng = np.random.default_rng(2)
    ones = jnp.ones((8, 96), jnp.float32)
    prod = rng.uniform(-1, 1, (96, 128)).astype(np.float32)
    y = np.asarray(dot2_exact_lhs(ones, jnp.asarray(prod), _MM))
    y64 = np.ones((8, 96)) @ prod.astype(np.float64)
    assert np.abs(y - y64).max() <= 1e-4
