"""Test configuration: force a virtual 8-device CPU mesh and float64.

Must run before the first `import jax` anywhere in the test session.
"""

import os

# Force-override: the ambient environment points JAX_PLATFORMS at the real
# TPU (axon tunnel) and a sitecustomize module imports jax before any test
# code runs, so setting env vars alone is not enough — we must also update
# jax.config after the fact (backends are not yet initialized at conftest
# import time, so this still takes effect).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax
import pytest

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache for the CPU test programs: the suite
# compiles hundreds of XLA programs and the per-module clear_caches
# fixture (below) forces recompiles on top — cached-program deserialization
# is far cheaper than compilation, so warm runs of the suite drop
# substantially. Keyed by HLO hash, so code changes invalidate exactly the
# programs they alter. Directory is gitignored.
from gpirt_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache(
    os.path.join(os.path.dirname(__file__), ".jax_cache_cpu")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.devices()[0].platform == "cpu", jax.devices()
assert jax.device_count() == 8, jax.devices()


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables at test-module boundaries.

    The full suite compiles many hundreds of XLA CPU programs in one
    process; past ~120 tests the process intermittently segfaults inside
    ``backend_compile_and_load`` (observed twice at different positions,
    always late in the run — an accumulation failure, not a specific
    program). Modules rarely share compiled shapes, so dropping the pjit
    cache between files bounds live-executable count at a small recompile
    cost.
    """
    yield
    jax.clear_caches()
