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
    ~nothing warm. Returns the cache dir."""
    import os
    import tempfile

    path = os.path.join(tempfile.gettempdir(), "tpusparse-xla-cache")
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    return path


def default_interpret() -> bool:
    """Pallas kernels run compiled on TPU, interpreted elsewhere (CPU tests).

    Mirrors SURVEY.md §4: `pltpu.force_tpu_interpret_mode()` is the off-TPU
    testing story for Pallas kernels.
    """
    return not on_tpu()
