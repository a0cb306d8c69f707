"""Platform helpers: backend detection, alignment math.

The reference asserts M, N are multiples of 32 (tester.cpp:8-10); on TPU the
analogous hardware alignment is the (8, 128) fp32 tile (sublane, lane), so all
converters here pad to lane/sublane multiples instead of asserting.
"""

from __future__ import annotations

import functools

import jax


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


@functools.cache
def on_tpu() -> bool:
    """True when the default JAX backend is a real TPU (incl. axon tunnel)."""
    try:
        plat = jax.devices()[0].platform
    except Exception:  # pragma: no cover - no backend at all
        return False
    return plat in ("tpu", "axon")


@functools.cache
def enable_compile_cache() -> str:
    """Idempotently point JAX's persistent compilation cache at the shared
    tpusparse dir (same one the CLI and test conftest use). Heavy
    multi-kernel programs — an AMG hierarchy compiles one Mosaic kernel
    per level operator and per prolongator — cost minutes cold over the
    axon tunnel (measured 510 s for a 5-level 262k-unknown solve) and
    ~nothing warm. A user-configured ``jax_compilation_cache_dir`` is
    respected (no-op). Returns the cache dir in effect."""
    import os
    import tempfile

    existing = jax.config.jax_compilation_cache_dir
    if existing:
        return existing
    path = os.path.join(tempfile.gettempdir(), "tpusparse-xla-cache")
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    return path


def device_put_compressed(tree, *, min_zero_frac: float = 0.6,
                          min_bytes: int = 1 << 20):
    """``jax.device_put`` a pytree, but ship mostly-zero leaves as
    (positions, nonzeros) and scatter-rebuild them ON device.

    Packed-format slot arrays pad nnz to tile quanta; on thin-band
    matrices (AMG prolongators) the padding is ~92% zeros, and over the
    axon tunnel's ~2-6 MB/s host->device path a 300 MB padded carrier
    costs minutes while its 24 MB compressed form costs seconds. The
    one-time device-side scatter at nnz scale is ~tens of ms — fine for
    setup, which is exactly why the library bans the same scatter from
    the per-step path (CLAUDE.md / kernels/sell_grad.py).

    Leaves smaller than ``min_bytes`` or with fewer than
    ``min_zero_frac`` zeros upload as-is.
    """
    import jax.numpy as jnp
    import numpy as _np

    def put(leaf):
        arr = _np.asarray(leaf) if not isinstance(leaf, jax.Array) else None
        if arr is None or arr.nbytes < min_bytes or \
                not _np.issubdtype(arr.dtype, _np.number):
            return jax.device_put(leaf)
        flat = arr.ravel()
        # cheap gate first: count_nonzero avoids materializing an
        # nnz-sized int64 index array for leaves that won't compress
        if _np.count_nonzero(flat) > (1.0 - min_zero_frac) * flat.size \
                or flat.size >= (1 << 31):
            return jax.device_put(leaf)
        if _np.issubdtype(arr.dtype, _np.floating):
            # bitwise selection: flatnonzero treats -0.0 as zero, which
            # would rebuild it as +0.0 and break the bit-identity
            # round-trip contract (advisor r2). Complex dtypes still
            # normalize -0.0 components (signbit is real-only).
            nz = _np.flatnonzero((flat != 0)
                                 | (_np.signbit(flat) & (flat == 0)))
        else:
            nz = _np.flatnonzero(flat)
        built = jnp.zeros(flat.size, arr.dtype).at[
            jax.device_put(nz.astype(_np.int32))].set(
            jax.device_put(flat[nz]))
        return built.reshape(arr.shape)

    return jax.tree_util.tree_map(put, tree)


def default_interpret() -> bool:
    """Pallas kernels run compiled on TPU, interpreted elsewhere (CPU tests).

    Mirrors SURVEY.md §4: `pltpu.force_tpu_interpret_mode()` is the off-TPU
    testing story for Pallas kernels.
    """
    return not on_tpu()
