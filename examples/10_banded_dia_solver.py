"""Banded operators end-to-end: DIA routing, an implicit-Euler solve with
BiCGStab, and the stencil-halo sharding.

Banded structure (PDE stencils, tridiagonal chains, Toeplitz-ish
operators) is SHIFT-shaped, not tile-shaped: every slot/tile format pays
the (8, 128) VREG quantum on each touched tile, while DIA stores k dense
diagonals and lowers SpMV to k statically shifted VPU fused multiply-adds
— measured 163x faster per CG iteration on a 1M-unknown Laplacian
(BENCH.md §Solver). This example shows the three pieces working together
on the canonical production consumer of a banded solver — an implicit
time step:

    (I + dt·L) u_next = u,     L = -Δ + c·∂/∂x  (convection-diffusion)

1. ROUTE: ``auto_format`` detects the banded structure from CSR stats in
   O(nnz) and picks ``DiaMatrix`` — no densify, no manual choice.
2. SOLVE: the upwind convection term makes the operator NONSYMMETRIC, so
   CG does not apply; ``bicgstab`` converges in ~19 iterations
   INDEPENDENT of grid size (the shifted operator's condition number is
   O(1)), two SpMVs per iteration. (Unshifted high-cond systems need a
   preconditioner in fp32 — every Krylov method, scipy's included,
   stagnates there; see tpusparse/solve.py.)
3. SHARD: ``dia_spmm_sharded(..., partition="halo")`` splits the domain
   into per-chip slabs; one ppermute each way moves only the max|offset|
   band edges — comm volume proportional to the BANDWIDTH, not the
   problem size.

Run: python examples/10_banded_dia_solver.py [--cpu]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

from tpusparse.formats.auto import auto_format
from tpusparse.formats.csr import CsrMatrix
from tpusparse.formats.dia import DiaMatrix
from tpusparse.solve import bicgstab


def convection_diffusion(side: int, c: float = 0.4,
                         shift: float = 0.0) -> CsrMatrix:
    """``shift·I + (-Δ + c·∂/∂x)``, 5-point + upwind, built as COO (never
    densified). ``shift = 1`` gives the implicit-Euler operator at
    ``dt·ν/h² = 1``.

    The upwind term couples each node to its downstream neighbor only, so
    the operator is NOT symmetric. Returned as the CSR of S.T so the
    library op (``spmv(v) = v @ pack = packᵀ v``) applies S — see
    tpusparse/solve.py's convention note.
    """
    n = side * side
    idx = np.arange(n).reshape(side, side)
    rows = [np.arange(n)]
    cols = [np.arange(n)]
    vals = [np.full(n, 4.0 + shift, np.float32)]
    for (di, dj) in ((0, 1), (1, 0)):
        src = idx[: side - di, : side - dj].ravel()
        dst = idx[di:, dj:].ravel()
        for (r, c_) in ((src, dst), (dst, src)):
            rows.append(r)
            cols.append(c_)
            vals.append(np.full(r.size, -1.0, np.float32))
    # upwind: S[i, i+1] -= c   ->  S.T entry (i+1, i)
    src = idx[:, : side - 1].ravel()
    rows.append(src + 1)
    cols.append(src)
    vals.append(np.full(src.size, -c, np.float32))
    # CSR of S.T: swap the roles of rows and cols in the COO build
    return CsrMatrix.from_coo(n, n, np.concatenate(cols),
                              np.concatenate(rows), np.concatenate(vals))


def main() -> int:
    side = 128
    n = side * side
    csr_st = convection_diffusion(side, shift=1.0)

    # 1. ROUTE — O(nnz) stats on CSR spot the band; no dense allocation
    fmt = auto_format(csr_st)
    assert isinstance(fmt, DiaMatrix), fmt
    print(f"routed: {fmt}")
    print(f"  offsets: {fmt.offsets}  (5-point stencil + upwind)")

    # 2. SOLVE one implicit time step with BiCGStab
    rng = np.random.default_rng(0)
    u_true = rng.normal(size=n).astype(np.float32)
    b = jnp.asarray(fmt.spmv(jnp.asarray(u_true)))   # b = S u_true
    u, info = bicgstab(fmt, b, tol=1e-6, maxiter=n)
    err = float(jnp.max(jnp.abs(u - jnp.asarray(u_true))))
    print(f"bicgstab: {int(info['iters'])} iters "
          f"(grid-size-independent), resnorm {float(info['resnorm']):.2e}, "
          f"max|err| {err:.2e}")
    assert err < 1e-3, err

    # 3. SHARD over every visible device with the stencil halo
    n_dev = min(8, jax.device_count())
    if n_dev > 1:
        from tpusparse.parallel.mesh import make_mesh
        from tpusparse.parallel.sparse import dia_spmm_sharded

        mesh = make_mesh({"n": n_dev}, jax.devices()[:n_dev])
        x = rng.normal(size=n).astype(np.float32)
        y = dia_spmm_sharded(fmt, jnp.asarray(x), mesh, partition="halo")
        y1 = fmt.spmv(jnp.asarray(x))
        err = float(jnp.max(jnp.abs(y - y1)))
        hl = max(0, -min(fmt.offsets))
        hr = max(0, max(fmt.offsets))
        print(f"halo-sharded over {n_dev} devices: max|err| vs single "
              f"{err:.2e}; halo = {hl + hr} of {n // n_dev} "
              f"elements/slab ({(hl + hr) / (n // n_dev):.1%} of a slab "
              f"over ICI per boundary)")
        assert err < 1e-5, err
    print("OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
