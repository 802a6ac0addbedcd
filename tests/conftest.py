"""Test harness: force an 8-device virtual CPU mesh before any jax use.

Multi-chip sharding (tp/dp over a Mesh) is validated here on virtual CPU
devices; the real-TPU path is exercised by bench.py and the driver's
dryrun (see __graft_entry__.py).

Note: this environment injects a TPU PJRT plugin via sitecustomize that
overrides the JAX_PLATFORMS env var, so we must also set the platform via
jax.config (which wins over the plugin's env override).
"""

import os
import sys

# GSVT_TPU_TESTS=1 leaves the real accelerator visible (for the marked
# on-chip perf contracts, tests/test_tpu_serving_perf.py); default runs
# force the 8-device virtual CPU mesh
_TPU_MODE = bool(os.environ.get("GSVT_TPU_TESTS"))
if not _TPU_MODE:
    xla_flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in xla_flags:
        os.environ["XLA_FLAGS"] = (xla_flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if not _TPU_MODE:
    jax.config.update("jax_platforms", "cpu")
# persistent compile cache: repeat suite runs skip XLA compilation
# (.jax_cache is the TPU cache, shared with the bench scripts)
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache" if _TPU_MODE else ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
# the suite is compile-bound (hundreds of tiny-model jit graphs whose
# runtime is milliseconds): skipping XLA's expensive optimization passes
# cuts cold-compile wall-clock ~45% with unchanged test semantics
# (perf contracts on the chip keep optimizations, obviously)
if not _TPU_MODE:
    jax.config.update("jax_disable_most_optimizations", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

# reference-parity golden tests must validate the OPTIMIZED HLO production
# runs (they are torch-bound, so compile time is not their cost); the flag
# participates in the jit cache key, so toggling it per-test is safe
_OPTIMIZED_HLO_FILES = ("test_reference_parity",)


@pytest.fixture(autouse=True)
def _optimized_hlo_for_parity(request):
    if any(k in str(getattr(request.node, "fspath", "")) for k in _OPTIMIZED_HLO_FILES):
        jax.config.update("jax_disable_most_optimizations", False)
        try:
            yield
        finally:
            jax.config.update("jax_disable_most_optimizations", True)
    else:
        yield
