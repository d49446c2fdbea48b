"""Batched dense linear algebra helpers for the GP machinery.

All conditional-GP math is kept in "whitened product" form — two triangular
solves against the Cholesky factor, never an explicit ``K^{-1}`` — because the
forward error of each trisolve scales with cond(L) = sqrt(cond(K)), which keeps
float32 viable on TPU for Gram matrices whose direct inverse would be
hopeless. (The reference runs everything in float64 on CPU and can afford
``double_solve``, src/cholesky-cache.cpp:4-9; we expose the same composition.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "chol_with_jitter",
    "tri_solve",
    "double_solve",
    "host_cholesky_f64",
    "chol3",
    "tri3_solve",
    "spd3_solve",
]


def chol_with_jitter(
    gram: jnp.ndarray, jitter: float, *, normalized: bool = False
) -> jnp.ndarray:
    """Lower Cholesky of the jittered Gram over trailing (n, n) axes.

    ``jnp.linalg.cholesky`` batches over leading axes natively, so a stack of
    per-horizon factors is one fused call (the reference loops horizons and
    recomputes these twice per iteration, src/draw-f.cpp:59 +
    src/gpirtMCMC.cpp:314; we compute once).

    ``normalized=True`` is the float32 stability mode: factor the
    *correlation* form, K = D^{1/2} C D^{1/2} with unit-diagonal C, as
    D^{1/2} chol(C + jitter*I). The ICC Gram's diagonal spans ~4 orders of
    magnitude (the quadratic kernel term grows as theta^4), which pushes a
    raw float32 factorization past breakdown once n is a few hundred;
    normalizing bounds the rounding error by ~n*eps32 independent of the
    kernel scale. The effective model nugget becomes *relative* —
    jitter * k(theta_i, theta_i) per point — vs the reference's absolute
    float64 1e-6 (documented in README parity notes).
    """
    n = gram.shape[-1]
    eye = jnp.eye(n, dtype=gram.dtype)
    if not normalized:
        return jnp.linalg.cholesky(gram + jitter * eye)
    d = jnp.sqrt(jnp.diagonal(gram, axis1=-2, axis2=-1))  # (..., n)
    inv = 1.0 / d
    C = gram * (inv[..., :, None] * inv[..., None, :])
    Lc = jnp.linalg.cholesky(C + jitter * eye)
    return d[..., :, None] * Lc


def tri_solve(L: jnp.ndarray, b: jnp.ndarray, *, trans: bool = False) -> jnp.ndarray:
    """Solve ``L x = b`` (or ``L^T x = b`` when trans) with lower-tri ``L``.

    Batched over leading axes of both arguments.
    """
    return jax.lax.linalg.triangular_solve(
        L, b, left_side=True, lower=True, transpose_a=trans
    )


def double_solve(L: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """``(L L^T)^{-1} b`` via two triangular solves (reference double_solve)."""
    return tri_solve(L, tri_solve(L, b), trans=True)


def chol3(M: jnp.ndarray) -> jnp.ndarray:
    """Closed-form lower Cholesky of batched SPD 3x3 matrices (..., 3, 3).

    ``jnp.linalg.cholesky`` on huge batches of tiny matrices lowers to a
    blocked loop that is pure latency on TPU (measured: 10 ms for 27k 3x3
    factorizations inside draw_beta — more than the 62-GFLOP f* draw).
    The explicit scalar recurrence is a handful of fused elementwise VPU
    ops over the batch instead.
    """
    a = jnp.sqrt(M[..., 0, 0])
    b = M[..., 1, 0] / a
    c = M[..., 2, 0] / a
    d = jnp.sqrt(M[..., 1, 1] - b * b)
    e = (M[..., 2, 1] - c * b) / d
    f = jnp.sqrt(M[..., 2, 2] - c * c - e * e)
    z = jnp.zeros_like(a)
    return jnp.stack([
        jnp.stack([a, z, z], -1),
        jnp.stack([b, d, z], -1),
        jnp.stack([c, e, f], -1),
    ], -2)


def tri3_solve(L: jnp.ndarray, b: jnp.ndarray, *, trans: bool = False) -> jnp.ndarray:
    """Solve L x = b (or L^T x = b) for lower-tri 3x3 L, elementwise.

    L: (..., 3, 3); b: (..., 3, k) (k broadcast over trailing axis).
    """
    l00 = L[..., 0, 0, None]
    l10 = L[..., 1, 0, None]
    l11 = L[..., 1, 1, None]
    l20 = L[..., 2, 0, None]
    l21 = L[..., 2, 1, None]
    l22 = L[..., 2, 2, None]
    b0, b1, b2 = b[..., 0, :], b[..., 1, :], b[..., 2, :]
    if not trans:
        x0 = b0 / l00
        x1 = (b1 - l10 * x0) / l11
        x2 = (b2 - l20 * x0 - l21 * x1) / l22
    else:
        x2 = b2 / l22
        x1 = (b1 - l21 * x2) / l11
        x0 = (b0 - l10 * x1 - l20 * x2) / l00
    return jnp.stack([x0, x1, x2], axis=-2)


def spd3_solve(M: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """M^{-1} b for batched SPD 3x3 (chol3 + two tri3 substitutions)."""
    L = chol3(M)
    return tri3_solve(L, tri3_solve(L, b), trans=True)


def host_cholesky_f64(gram: np.ndarray, jitter: float, dtype=np.float32) -> np.ndarray:
    """One-time host-side float64 Cholesky, cast to the compute dtype.

    Used for setup-time factorizations of severely ill-conditioned Grams
    (e.g. the 1001-point theta* grid Gram, whose smooth-SE spectrum decays
    past float32 range). numpy always has float64 regardless of the JAX x64
    flag, and a one-time O(N^3) host factorization is off the hot path.
    """
    gram = np.asarray(gram, np.float64)
    n = gram.shape[-1]
    L = np.linalg.cholesky(gram + jitter * np.eye(n))
    return L.astype(dtype)
