"""Test env: force an 8-device virtual CPU mesh before JAX initializes.

SURVEY.md §4: multi-host logic is tested on a fake backend —
``xla_force_host_platform_device_count=8`` + CPU mesh; Pallas kernels run in
interpret mode off-TPU (tpusparse.utils.default_interpret).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The image's sitecustomize pre-imports jax and pins jax_platforms to the
# axon TPU plugin, so an env var is not enough — override the live config.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Keep the autotune disk cache out of ~/.cache during tests (and isolated
# from any real tuned values on this machine).
import tempfile as _tempfile  # noqa: E402

_tune_cache = os.path.join(_tempfile.gettempdir(),
                           "tpusparse-test-tune-cache.json")
os.environ["TPUSPARSE_TUNE_CACHE"] = _tune_cache
if os.path.exists(_tune_cache):
    os.remove(_tune_cache)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def small_workload():
    """A small but tile-aligned workload: M=256, N=384, 50% sparse."""
    from tpusparse.testing import generators, reference

    a = generators.random_sparse_matrix(256, 384, density=0.5, seed=7)
    x = generators.random_sparse_vector(256, density=0.5, seed=7)
    y = reference.sgemv_cpu(x, a)
    return a, x, y


def assert_close(y, y_ref, atol=1e-3, name="kernel"):
    err = np.abs(np.asarray(y, dtype=np.float64) - np.asarray(y_ref, dtype=np.float64))
    bad = int((err > atol).sum())
    assert bad == 0, f"{name}: {bad} elements exceed atol={atol}, max|err|={err.max():.3e}"


# Persistent XLA compilation cache: this box has ONE CPU core and the suite
# compiles ~100 shard_map/interpret programs; warm-cache reruns (the common
# case for the driver and for local iteration) skip nearly all of it.
from tpusparse.utils.platform import enable_compile_cache  # noqa: E402

enable_compile_cache()
