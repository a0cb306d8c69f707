"""Multi-chip sparse SpMV/SpMM: sharded formats under shard_map.

The BASELINE.json scaling component, with no reference counterpart
(single-GPU study, SURVEY.md §2.4). Partitions:

- ``n``  — shard output column groups: SELL leaves shard on their ``nb``
  axis, X is replicated (the fully-exchanged-halo case); zero steady-state
  comm, Y lands sharded. The chip-level analog of the reference's
  block-per-32-columns decomposition (wsp.cu:13).
- ``m``  — shard contraction windows: SELL leaves shard on ``nt``, each chip
  consumes its X shard and psums partial Y over ICI — the chip-level lift of
  the reference's split-M-across-warps + smem reduction (asp.cu:13-40).
- ``2d`` — batch x output mesh for SpMM: X shards over the batch axis, the
  format over the output axis (the DP x TP analog).

BSR shards by output groups with per-device block counts padded to the max
(explicit zero blocks), since shard_map needs rectangular shards.
"""

from __future__ import annotations

from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from tpusparse.parallel import comm
from tpusparse.parallel.mesh import compat_shard_map as _shard_map

from tpusparse.formats.bsr import bsr_pack
from tpusparse.formats.sell import SellMatrix

_LANES = 128
_SUB = 8


def _as_2d(x: Any) -> tuple[jax.Array, bool]:
    """(x2d, squeeze): promote (m,) activations to (1, m)."""
    squeeze = np.ndim(x) == 1
    xj = jnp.asarray(x)
    return (xj[None, :] if squeeze else xj), squeeze


def _pad_axis(arr: jax.Array, axis: int, mult: int) -> jax.Array:
    """Zero-pad ``axis`` to a multiple of ``mult`` (shard divisibility —
    padded groups/windows multiply zeros and are sliced off the output)."""
    pad = -arr.shape[axis] % mult
    if not pad:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return jnp.pad(arr, widths)


# ----------------------------- SELL ---------------------------------------


def sell_spmm_sharded(s: SellMatrix, x: Any, mesh: Mesh,
                      partition: str = "n") -> jax.Array:
    """y = x @ A with SELL-format A sharded over ``mesh``.

    x: (m,) or (b, m). Returns the full (replicated-view) result; XLA keeps
    the physical layout sharded per ``partition``.
    """
    from tpusparse.kernels.sell_spmv import sell_spmm_padded

    x2d, squeeze = _as_2d(x)
    mp, np_ = s.padded
    if x2d.shape[1] != mp:
        x2d = jnp.pad(x2d, ((0, 0), (0, mp - x2d.shape[1])))

    nb, nt = s.vals.shape[0], s.vals.shape[1]
    w = s.w
    idx_l, vals_l = jnp.asarray(s.idx), jnp.asarray(s.vals)

    if partition == "n":
        d = mesh.shape["n"]
        idx_l = _pad_axis(idx_l, 0, d)            # zero column groups
        vals_l = _pad_axis(vals_l, 0, d)

        def f(idx_loc, vals_loc, x_full):
            out = sell_spmm_padded(idx_loc, vals_loc, x_full, w=w)
            return out[::_SUB]                    # (B, nb_loc*128)

        y = _shard_map(f, mesh=mesh, check_vma=False,
                       in_specs=(P("n"), P("n"), P()),
                       out_specs=P(None, "n"))(idx_l, vals_l, x2d)
    elif partition == "m":
        d = mesh.shape["n"]                       # axis carries M-shards here
        idx_l = _pad_axis(idx_l, 1, d)            # zero contraction windows
        vals_l = _pad_axis(vals_l, 1, d)
        x2d = _pad_axis(x2d, 1, idx_l.shape[1] * _LANES)

        def f(idx_loc, vals_loc, x_loc):
            out = sell_spmm_padded(idx_loc, vals_loc, x_loc, w=w)
            return comm.psum_y(out[::_SUB], "n")

        y = _shard_map(f, mesh=mesh, check_vma=False,
                       in_specs=(P(None, "n"), P(None, "n"), P(None, "n")),
                       out_specs=P())(idx_l, vals_l, x2d)
    elif partition == "ring":
        # shard BOTH dims: each chip owns a column-group slab (nb) and an
        # X window-shard; X shards rotate via ppermute while each chip
        # consumes the matching window band of its local SELL slice —
        # halo exchange overlapped with compute (the ring-attention analog,
        # SURVEY.md §5). Peak memory per chip: format/D + X/D.
        d = mesh.shape["n"]
        idx_l = _pad_axis(_pad_axis(idx_l, 0, d), 1, d)
        vals_l = _pad_axis(_pad_axis(vals_l, 0, d), 1, d)
        x2d = _pad_axis(x2d, 1, idx_l.shape[1] * _LANES)
        band = idx_l.shape[1] // d

        def f(idx_loc, vals_loc, x_loc):
            my = lax.axis_index("n")
            b = x_loc.shape[0]

            def step(s, carry):
                y, xc = carry
                # xc is X window-shard ((my + s) % D): consume that band
                t0 = ((my + s) % d) * band
                idx_b = lax.dynamic_slice_in_dim(idx_loc, t0, band, axis=1)
                val_b = lax.dynamic_slice_in_dim(vals_loc, t0, band, axis=1)
                y = y + sell_spmm_padded(idx_b, val_b, xc, w=w)
                return (y, comm.ring_shift(xc, "n", shift=-1))

            y0 = jnp.zeros((b * _SUB, idx_loc.shape[0] * _LANES),
                           x_loc.dtype)   # kernel returns x's dtype
            y0 = lax.pcast(y0, "n", to="varying")
            y, _ = lax.fori_loop(0, d, step, (y0, x_loc))
            return y[::_SUB]

        y = _shard_map(f, mesh=mesh, check_vma=False,
                       in_specs=(P("n"), P("n"), P(None, "n")),
                       out_specs=P(None, "n"))(idx_l, vals_l, x2d)
    elif partition == "2d":
        db, dn = mesh.shape["b"], mesh.shape["n"]
        idx_l = _pad_axis(idx_l, 0, dn)
        vals_l = _pad_axis(vals_l, 0, dn)
        b_real = x2d.shape[0]
        x2d = _pad_axis(x2d, 0, db)               # zero batch rows

        def f(idx_loc, vals_loc, x_loc):
            out = sell_spmm_padded(idx_loc, vals_loc, x_loc, w=w)
            return out[::_SUB]

        y = _shard_map(f, mesh=mesh, check_vma=False,
                       in_specs=(P("n"), P("n"), P("b")),
                       out_specs=P("b", "n"))(idx_l, vals_l, x2d)
        y = y[:b_real]
    else:
        raise ValueError(f"unknown partition {partition!r}")

    y = y[:, :s.shape[1]]
    return y[0] if squeeze else y


# ----------------------------- RSELL ---------------------------------------


def rsell_spmm_sharded(shards, x: Any, mesh: Mesh) -> jax.Array:
    """y = x @ A with ragged-SELL chunk shards over ``mesh`` (output groups
    assigned per ``formats.rsell.rsell_shard_pack`` — no divisibility
    requirements; per-shard chunk loads differ and are padded with zero
    chunks, so traffic imbalance exactly mirrors the work imbalance the
    assignment chose)."""
    from tpusparse.kernels.rsell_spmv import rsell_spmm_padded

    x2d, squeeze = _as_2d(x)
    mp, np_ = shards.padded
    if x2d.shape[1] != mp:
        x2d = jnp.pad(x2d, ((0, 0), (0, mp - x2d.shape[1])))
    d = shards.n_shards
    if mesh.shape["n"] != d:
        raise ValueError(f"packed for {d} shards, mesh has {mesh.shape['n']}")
    nb_loc = shards.group_map.shape[1]
    b = x2d.shape[0]

    def f(cj_loc, ct_loc, idx_loc, vals_loc, x_full):
        out = rsell_spmm_padded(cj_loc[0], ct_loc[0], idx_loc[0],
                                vals_loc[0], x_full,
                                n_padded=nb_loc * _LANES)
        return out[::_SUB]

    y = _shard_map(f, mesh=mesh, check_vma=False,
                   in_specs=(P("n"), P("n"), P("n"), P("n"), P()),
                   out_specs=P(None, "n"))(
        jnp.asarray(shards.cj), jnp.asarray(shards.ct),
        jnp.asarray(shards.idx), jnp.asarray(shards.vals), x2d)

    # concat order is (shard, local column); the pack built ONE static
    # column permutation covering both the shard placement and any
    # pack-time demand sort — undo it with the permute kernel
    from tpusparse.kernels.permute import apply_permutation

    y = apply_permutation(y, shards.perm_plan, shards.shape[1])
    return y[0] if squeeze else y


# ----------------------------- AWSP ----------------------------------------


def awsp_spmm_sharded(w: "AwspMatrix", x: Any, mesh: Mesh,
                      plan: np.ndarray | None = None) -> jax.Array:
    """y = x @ A with AWSP-format A output-sharded over ``mesh``.

    Column groups shard on ``nb``; the activation window-group plan is
    host-computed once and replicated — every chip skips the same dead
    window groups of its own column slab, so traffic per chip is
    (active groups / groups) x (format bytes / D).
    """
    from tpusparse.kernels.awsp_spmv import awsp_spmm_padded

    x2d, squeeze = _as_2d(x)
    if plan is None:
        plan = w.plan(np.asarray(x2d))
    rows_tot = w.vals.shape[1] * _LANES
    xp = jnp.pad(x2d, ((0, 0), (0, rows_tot - x2d.shape[1])))

    d = mesh.shape["n"]
    idx_l = _pad_axis(jnp.asarray(w.idx), 0, d)   # zero column groups
    vals_l = _pad_axis(jnp.asarray(w.vals), 0, d)
    width, g = w.w, w.g

    def f(plan_full, idx_loc, vals_loc, x_full):
        out = awsp_spmm_padded(plan_full, idx_loc, vals_loc, x_full,
                               w=width, g=g)
        return out[::_SUB]                        # (B, nb_loc*128)

    y = _shard_map(f, mesh=mesh, check_vma=False,
                   in_specs=(P(), P("n"), P("n"), P()),
                   out_specs=P(None, "n"))(
        jnp.asarray(plan), idx_l, vals_l, xp)
    y = y[:, :w.shape[1]]
    return y[0] if squeeze else y


# ----------------------------- BSR -----------------------------------------


def bsr_shard_pack(a: np.ndarray, n_shards: int,
                   block_m: int = 128) -> dict[str, Any]:
    """Pack dense A into per-device BSR shards over output groups.

    Each device owns nb/D column groups; per-device block lists are padded
    with explicit zero blocks to the max count so shards stay rectangular.
    """
    full = bsr_pack(a, block_m=block_m)
    mp, np_ = full["padded"]
    nb = np_ // _LANES
    nb = -(-nb // n_shards) * n_shards            # pad group count to D
    np_ = nb * _LANES                             # (zero output columns)
    gpd = nb // n_shards                          # groups per device

    bi, bj, blocks = full["bi"], full["bj"], full["blocks"]
    dev = bj // gpd
    counts = np.bincount(dev, minlength=n_shards)
    nmax = int(counts.max())
    tbm = full["block_m"]
    bi_s = np.zeros((n_shards, nmax), np.int32)
    bj_s = np.zeros((n_shards, nmax), np.int32)
    blk_s = np.zeros((n_shards, nmax, tbm, _LANES), blocks.dtype)
    for sh in range(n_shards):
        sel = dev == sh
        k = int(sel.sum())
        bi_s[sh, :k] = bi[sel]
        bj_s[sh, :k] = bj[sel] - sh * gpd         # local group index
        # pad slots: zero blocks accumulating into the last local group
        bj_s[sh, k:] = gpd - 1
        blk_s[sh, :k] = blocks[sel]
    return dict(bi=bi_s, bj=bj_s, blocks=blk_s, shape=full["shape"],
                padded=(mp, np_), block_m=tbm, nnz=full["nnz"],
                n_shards=n_shards)


def bsr_spmm_sharded(packed: dict[str, Any], x: Any, mesh: Mesh) -> jax.Array:
    """Output-sharded BSR SpMV/SpMM from ``bsr_shard_pack`` output."""
    from tpusparse.kernels.bsr_spmv import bsr_spmm_padded

    x2d, squeeze = _as_2d(x)
    mp, np_ = packed["padded"]
    if x2d.shape[1] != mp:
        x2d = jnp.pad(x2d, ((0, 0), (0, mp - x2d.shape[1])))
    d = packed["n_shards"]
    if mesh.shape["n"] != d:
        raise ValueError(f"packed for {d} shards, mesh has {mesh.shape['n']}")
    n_local = np_ // d
    block_m = packed["block_m"]
    b = x2d.shape[0]

    def f(bi_loc, bj_loc, blk_loc, x_full):
        y = bsr_spmm_padded(bi_loc[0], bj_loc[0], blk_loc[0], x_full,
                            block_m=block_m, n_padded=n_local)
        return y[:max(b, 1)]                      # (B8 -> B?, n_local)

    y = _shard_map(f, mesh=mesh, check_vma=False,
                   in_specs=(P("n"), P("n"), P("n"), P()),
                   out_specs=P(None, "n"))(
        jnp.asarray(packed["bi"]), jnp.asarray(packed["bj"]),
        jnp.asarray(packed["blocks"]), x2d)
    y = y[:b, :packed["shape"][1]]
    return y[0] if squeeze else y
