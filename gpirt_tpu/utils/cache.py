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

import hashlib
import os

__all__ = ["enable_persistent_cache", "host_fingerprint"]

_DEFAULT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def host_fingerprint() -> str:
    """Short digest of this host's CPU feature set (+ arch).

    XLA:CPU cache entries embed AOT-compiled machine code targeted at the
    compiling host's ISA extensions (AVX-512, AMX, ...). The persistent
    cache keys entries by HLO hash only, so an executable compiled on a
    bigger host can be loaded on a lesser one and die with SIGILL (the
    round-4 dryrun tail was a wall of "machine type used for compilation
    doesn't match" warnings). Scoping the cache directory by a
    CPU-feature digest makes cross-host loads structurally impossible.
    """
    import platform

    feats = ""
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith("flags"):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    raw = f"{platform.machine()}|{feats}"
    return hashlib.sha256(raw.encode()).hexdigest()[:12]


def _cpu_backend_selected() -> bool:
    """True unless a non-CPU platform is explicitly selected.

    Inspects ``jax_platforms``/``JAX_PLATFORMS`` WITHOUT initializing the
    backend (backend init over the TPU tunnel costs seconds and this runs
    at import time in every entry point). Unknown/unset resolves to True:
    the fingerprint suffix is only ever a one-time recompile, whereas a
    missing suffix on a CPU host risks SIGILL.
    """
    import jax

    plats = jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")
    first = plats.split(",")[0].strip().lower()
    return first in ("", "cpu")


def enable_persistent_cache(path: str | None = None) -> str:
    """Point jax's persistent compilation cache at ``path`` (idempotent).

    Must be called AFTER ``import jax`` (always true) and takes effect for
    every compile that follows. On CPU backends the directory is suffixed
    with a host CPU-feature fingerprint (see ``host_fingerprint``) so AOT
    executables never cross incompatible hosts; non-CPU backends (TPU)
    serialize target-device code, so the shared directory stays valid
    across hosts and keeps its warm entries. Returns the directory in use.
    """
    import jax

    path = path or _DEFAULT
    if _cpu_backend_selected():
        path = os.path.join(path, f"host-{host_fingerprint()}")
    jax.config.update("jax_compilation_cache_dir", path)
    # default min compile time is 1 s — keep it (tiny programs recompile
    # faster than they deserialize); entries are written asynchronously.
    return path
