"""Persistent XLA compilation cache enablement.

In this deployment every gibbs_sweep-bearing XLA program costs minutes of
(remote) compile per fresh process, so the persistent cache is the
difference between a ~100 s and a ~1000 s cold start (VERDICT r3 item 2).

Why a function and not an env var: the runtime environment imports jax at
interpreter startup (a sitecustomize module registers the TPU plugin before
any user code runs), so ``JAX_COMPILATION_CACHE_DIR`` set inside a script —
the pattern bench.py used through round 3 — is read by jax's config BEFORE
the assignment executes and silently stays ``None``. Measured in round 4:
with the env-var pattern the cache never initialized ("Not writing
persistent cache entry ... since cache is disabled/not initialized") and
every bench paid the full ~750 s compile prologue; with
``jax.config.update`` the same program hits the cache (1.7 s -> 0.3 s on
the probe program, second process).
"""

from __future__ import annotations

import os

__all__ = ["enable_persistent_cache"]

_DEFAULT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable_persistent_cache(path: str | None = None) -> str:
    """Point jax's persistent compilation cache at ``path`` (idempotent).

    Must be called AFTER ``import jax`` (always true) and takes effect for
    every compile that follows. Returns the cache directory in use.
    """
    import jax

    path = path or _DEFAULT
    jax.config.update("jax_compilation_cache_dir", path)
    # default min compile time is 1 s — keep it (tiny programs recompile
    # faster than they deserialize); entries are written asynchronously.
    return path
