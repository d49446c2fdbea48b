"""Covariance (Gram) kernels for GP-IRT, as batched TPU-friendly JAX ops.

Reference semantics (reimplemented, not translated):
  * ``icc_gram`` — the item-characteristic-curve kernel over latent traits:
    squared-exponential plus linear, constant and quadratic terms, i.e. the
    quadratic parametric mean ``mu = b0 + b1*x + b2*x^2`` with independent
    normal priors folded into the GP covariance
    (reference: src/covariance-function.cpp:3-18).
  * ``time_gram`` — Matern-5/2 or RBF kernel over time/sessions with the same
    linear+constant fold-in (reference: src/covariance-function.cpp:21-44).
    Note the reference RBF has *no* 1/2 factor: exp(-d^2 / ls^2).

Everything here is pure, shape-polymorphic over leading batch axes, and uses
broadcasting (outer-product structure) instead of scalar loops so XLA can tile
it onto the VPU/MXU.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "icc_gram",
    "time_gram",
    "icc_gram_np",
    "time_gram_np",
    "add_jitter",
]


def icc_gram(x1: jnp.ndarray, x2: jnp.ndarray, beta_prior_sds: jnp.ndarray) -> jnp.ndarray:
    """SE + linear + constant + quadratic Gram matrix.

    k(a, b) = exp(-0.5 (a-b)^2) + a * sd1^2 * b + sd0^2 + (a * sd2 * b)^2

    Args:
      x1: ``(..., n)`` latent positions.
      x2: ``(..., m)`` latent positions.
      beta_prior_sds: ``(3,)`` prior sds ``(sd0, sd1, sd2)`` for the constant,
        linear and quadratic mean coefficients (reference uses column 0 of the
        per-item prior-sd matrix for every item).

    Returns:
      ``(..., n, m)`` Gram matrix.
    """
    a = x1[..., :, None]
    b = x2[..., None, :]
    d = a - b
    se = jnp.exp(-0.5 * d * d)
    sd0, sd1, sd2 = beta_prior_sds[0], beta_prior_sds[1], beta_prior_sds[2]
    lin = a * (sd1 * sd1) * b
    const = sd0 * sd0
    quad = jnp.square(a * sd2 * b)
    return se + lin + const + quad


def time_gram(
    t1: jnp.ndarray,
    t2: jnp.ndarray,
    os: float,
    ls: float,
    theta_prior_sds: jnp.ndarray,
    kernel: str = "Matern",
) -> jnp.ndarray:
    """Matern-5/2 or RBF Gram over time points, plus linear/constant terms.

    Matern: os^2 (1 + sqrt5 d/ls + 5 d^2/(3 ls^2)) exp(-sqrt5 d/ls)
    RBF:    os^2 exp(-d^2 / ls^2)       (no 1/2 factor, matching the reference)
    plus    t1 * sd1^2 * t2 + sd0^2

    Args:
      t1: ``(..., n)`` time points.
      t2: ``(..., m)`` time points.
      os: output scale.
      ls: length scale.
      theta_prior_sds: ``(2,)`` prior sds ``(sd0, sd1)``. The reference's
        cholesky cache always passes zeros here
        (src/cholesky-cache.cpp:31), so the effective default is a pure
        Matern/RBF kernel; we keep the terms for API parity.
      kernel: "Matern" or "RBF".
    """
    a = t1[..., :, None]
    b = t2[..., None, :]
    d = jnp.abs(a - b)
    if kernel == "Matern":
        s5 = jnp.sqrt(jnp.asarray(5.0, d.dtype))
        core = (os * os) * (1.0 + s5 * d / ls + 5.0 * d * d / (3.0 * ls * ls)) * jnp.exp(
            -s5 * d / ls
        )
    elif kernel == "RBF":
        core = (os * os) * jnp.exp(-d * d / (ls * ls))
    else:
        raise ValueError(f"unknown time kernel {kernel!r}; expected 'Matern' or 'RBF'")
    sd0, sd1 = theta_prior_sds[0], theta_prior_sds[1]
    return core + a * (sd1 * sd1) * b + sd0 * sd0


def icc_gram_np(x1, x2, beta_prior_sds):
    """Host float64 version of ``icc_gram`` for setup-time factorizations.

    jnp silently downcasts to float32 unless jax_enable_x64 is set; setup
    Grams (the theta* grid Gram in particular) need full float64 before their
    one-time Cholesky, independent of the JAX dtype config.
    """
    import numpy as np

    a = np.asarray(x1, np.float64)[..., :, None]
    b = np.asarray(x2, np.float64)[..., None, :]
    sds = np.asarray(beta_prior_sds, np.float64)
    d = a - b
    return (
        np.exp(-0.5 * d * d)
        + a * (sds[1] ** 2) * b
        + sds[0] ** 2
        + np.square(a * sds[2] * b)
    )


def time_gram_np(t1, t2, os, ls, theta_prior_sds, kernel="Matern"):
    """Host float64 version of ``time_gram`` (see icc_gram_np)."""
    import numpy as np

    a = np.asarray(t1, np.float64)[..., :, None]
    b = np.asarray(t2, np.float64)[..., None, :]
    sds = np.asarray(theta_prior_sds, np.float64)
    d = np.abs(a - b)
    if kernel == "Matern":
        s5 = np.sqrt(5.0)
        core = (os * os) * (1.0 + s5 * d / ls + 5.0 * d * d / (3.0 * ls * ls)) * np.exp(
            -s5 * d / ls
        )
    elif kernel == "RBF":
        core = (os * os) * np.exp(-d * d / (ls * ls))
    else:
        raise ValueError(f"unknown time kernel {kernel!r}; expected 'Matern' or 'RBF'")
    return core + a * (sds[1] ** 2) * b + sds[0] ** 2


def add_jitter(gram: jnp.ndarray, jitter: float) -> jnp.ndarray:
    """Add ``jitter`` to the diagonal of the trailing (n, n) axes."""
    n = gram.shape[-1]
    return gram + jitter * jnp.eye(n, dtype=gram.dtype)
