"""A sparse MoE-style layer: where AWSP's activation plan earns its keep.

Two sparse matmuls around an expert gate:

    h = relu(x @ W1)            W1 sparse -> SELL
    h = gate(h)                 keep each sample's top expert block
    y = h @ W2                  W2 sparse -> AWSP: dead expert blocks of h
                                are whole window groups, never fetched

The AWSP group size g is chosen so window groups coincide with expert
blocks; the per-call plan is the union of experts the batch routed to, so
serving traffic scales with experts-in-use, not experts-total.

Run: python examples/04_sparse_moe_layer.py [--cpu]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

from tpusparse.formats.awsp import AwspMatrix
from tpusparse.formats.sell import SellMatrix
from tpusparse.testing import generators

EXPERTS, H, D, B = 8, 512, 2048, 4


def main():
    rng = np.random.default_rng(0)
    w1 = generators.random_sparse_matrix(D, EXPERTS * H, density=0.3, seed=1)
    w2 = generators.random_sparse_matrix(EXPERTS * H, D, density=0.3, seed=2)
    x = rng.uniform(-1, 1, (B, D)).astype(np.float32)

    w1_sell = SellMatrix.from_dense(w1)
    # g = H/128 -> one window group per expert block
    w2_awsp = AwspMatrix.from_dense(w2, g=H // 128)
    print(f"W1 packed: {w1_sell!r}\nW2 packed: {w2_awsp!r}")

    h = np.maximum(np.asarray(w1_sell.spmm(x)), 0.0)       # (B, E*H) relu

    # gate: keep each sample's strongest expert block, zero the rest
    norms = h.reshape(B, EXPERTS, H).sum(axis=2)
    top = norms.argmax(axis=1)
    mask = np.zeros((B, EXPERTS), np.float32)
    mask[np.arange(B), top] = 1.0
    h_gated = (h.reshape(B, EXPERTS, H) * mask[:, :, None]).reshape(B, -1)
    print(f"batch routed to experts {sorted(set(top.tolist()))} "
          f"of {EXPERTS}")

    plan = w2_awsp.plan(h_gated)
    print(f"AWSP plan: {plan.size}/{w2_awsp.n_groups} expert blocks fetched "
          f"({w2_awsp.device_bytes(h_gated) / 1e6:.1f} of "
          f"{w2_awsp.device_bytes() / 1e6:.1f} MB)")

    y = np.asarray(w2_awsp.spmm(h_gated))
    y_ref = h_gated.astype(np.float64) @ w2.astype(np.float64)
    err = np.abs(y - y_ref).max()
    print(f"layer output max|err| = {err:.2e} (contract: <= 1e-3)")
    assert err <= 1e-3


if __name__ == "__main__":
    main()
