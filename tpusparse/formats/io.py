"""Format persistence: npz save/load for packed device formats.

SURVEY.md §5: the reference is stateless (no checkpointing); formats here get
save/load so converted benchmark matrices can be reused across runs — the
conversion (not the kernel) dominates end-to-end time for one-shot use.
"""

from __future__ import annotations

import numpy as np

from tpusparse.formats.bell import BellMatrix
from tpusparse.formats.bsr import BsrMatrix
from tpusparse.formats.sell import SellMatrix

_KINDS = {"sell": SellMatrix, "bell": BellMatrix, "bsr": BsrMatrix}


def save(path: str, fmt) -> None:
    import jax

    kind = next((k for k, cls in _KINDS.items() if isinstance(fmt, cls)), None)
    if kind is None:
        raise TypeError(f"unsupported format {type(fmt).__name__}")
    leaves, treedef = jax.tree_util.tree_flatten(fmt)
    arrays = {f"leaf{i}": np.asarray(l) for i, l in enumerate(leaves)}
    if kind == "sell":
        meta = dict(shape=fmt.shape, padded=fmt.padded, w=fmt.w, nnz=fmt.nnz)
    elif kind == "bell":
        meta = dict(shape=fmt.shape, padded=fmt.padded, block_m=fmt.block_m,
                    w=fmt.w, nnz=fmt.nnz)
    else:
        meta = dict(shape=fmt.shape, padded=fmt.padded, block_m=fmt.block_m,
                    nnz=fmt.nnz)
    np.savez_compressed(path, kind=kind,
                        meta=np.asarray(repr(meta)), **arrays)


def load(path: str):
    z = np.load(path, allow_pickle=False)
    kind = str(z["kind"])
    meta = eval(str(z["meta"]))  # repr of a dict of ints/tuples only
    leaves = [z[f"leaf{i}"] for i in range(sum(1 for k in z.files
                                               if k.startswith("leaf")))]
    if kind == "sell":
        return SellMatrix(leaves[0], leaves[1], tuple(meta["shape"]),
                          tuple(meta["padded"]), meta["w"], meta["nnz"])
    if kind == "bell":
        return BellMatrix(leaves[0], leaves[1], tuple(meta["shape"]),
                          tuple(meta["padded"]), meta["block_m"], meta["w"],
                          meta["nnz"])
    if kind == "bsr":
        return BsrMatrix(leaves[0], leaves[1], leaves[2],
                         tuple(meta["shape"]), tuple(meta["padded"]),
                         meta["block_m"], meta["nnz"])
    raise ValueError(f"unknown kind {kind!r} in {path}")
