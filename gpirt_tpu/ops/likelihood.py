"""Ordinal-probit likelihood and cutpoint transforms, dense-masked for TPU.

Model (reference: src/log-likelihood.cpp:19-33):
  P(y = c | g) = Phi(t_c - g) - Phi(t_{c-1} - g),  g = f + mu,
with per-item cutpoints t_0 = -inf < t_1 < ... < t_C = +inf and a numerical
floor of 1e-6 inside the log.

TPU-native representation: instead of the reference's per-item observed-index
gather fields (arma::field<uvec>), missing responses are handled with a dense
mask and static shapes. Responses are stored as int32 categories in 1..C with
0 meaning "missing" (the reference encodes missing as NaN in a double array).
Binary data recoded by the response-matrix layer lands in {1, 2}: the
reference's raw {-1, +1} coding would index out of bounds in its own C++
likelihood (see SURVEY.md section 7.3 quirk 1), so we deliberately recode.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "LL_FLOOR",
    "ordinal_ll_terms",
    "ordinal_ll",
    "cutpoint_bounds",
    "ll_terms_from_bounds",
    "delta_to_threshold",
    "threshold_to_delta",
]

# Numerical floor inside log(Phi - Phi + floor); matches the reference.
LL_FLOOR = 1e-6


def _norm_cdf(z: jnp.ndarray) -> jnp.ndarray:
    # Phi via erf keeps everything on the VPU; handles +-inf exactly.
    return 0.5 * (1.0 + jax.lax.erf(z * jnp.asarray(0.7071067811865476, z.dtype)))


def cutpoint_bounds(y: jnp.ndarray, thresholds: jnp.ndarray):
    """Gather each observation's cutpoint interval once.

    The category index ``y`` is fixed within a Gibbs block, so the
    (t_{y-1}, t_y) gathers can be hoisted out of the ESS shrink loop; each
    round then only re-evaluates Phi at the new ``g``.

    Args:
      y: ``(..., n, m)`` int32 categories in 1..C, 0 = missing.
      thresholds: ``(..., m, C+1)`` with +-inf endpoints, broadcastable
        against y's batch axes.

    Returns:
      (z_lo, z_hi, mask): two ``(..., n, m)`` float arrays and a bool mask.
      Infinite endpoint cutpoints come back clamped to +-1e30 (saturates
      every downstream Phi identically and keeps 0 * endpoint finite).
    """
    dt = thresholds.dtype
    big = jnp.asarray(1e30, dt)
    t_clip = jnp.clip(thresholds, -big, big)  # (..., m, C+1)
    Cp1 = thresholds.shape[-1]
    ysafe = jnp.maximum(y, 1)
    # one-hot contractions over the length-(C+1) threshold axis instead of
    # per-cell take_along_axis: the two random-access gathers measured
    # ~100 ms PER SWEEP at (n, m) = (5000, 1000) on v5e (vs ~1 ms for the
    # contraction) — the same pathology draw_z_truncnorm's bounds hit at 64
    # senate chains. HIGHEST: default-bf16 dots would quantize the bounds.
    oh_hi = jax.nn.one_hot(ysafe, Cp1, dtype=dt)      # (..., n, m, C+1)
    oh_lo = jax.nn.one_hot(ysafe - 1, Cp1, dtype=dt)
    hi_p = jax.lax.Precision.HIGHEST
    z_hi = jnp.einsum("...nmc,...mc->...nm", oh_hi, t_clip, precision=hi_p)
    z_lo = jnp.einsum("...nmc,...mc->...nm", oh_lo, t_clip, precision=hi_p)
    return z_lo, z_hi, y > 0


def ll_terms_from_bounds(
    g: jnp.ndarray, z_lo: jnp.ndarray, z_hi: jnp.ndarray, mask: jnp.ndarray,
    inv_s=None,
) -> jnp.ndarray:
    """``log(Phi((z_hi - g) s) - Phi((z_lo - g) s) + 1e-6)``, 0 where masked.

    ``inv_s = 1/sqrt(T)`` is the tempering scale (see parallel/tempering.py):
    observation noise sd sqrt(T) flattens the ordinal likelihood toward
    uniform as T grows. None (default) is the untempered T = 1 model with
    byte-identical HLO to the pre-tempering code path.
    """
    if inv_s is None:
        p = _norm_cdf(z_hi - g) - _norm_cdf(z_lo - g)
    else:
        p = _norm_cdf((z_hi - g) * inv_s) - _norm_cdf((z_lo - g) * inv_s)
    terms = jnp.log(p + jnp.asarray(LL_FLOOR, g.dtype))
    return jnp.where(mask, terms, jnp.zeros((), g.dtype))


def ordinal_ll_terms(
    g: jnp.ndarray, y: jnp.ndarray, thresholds: jnp.ndarray, inv_s=None
) -> jnp.ndarray:
    """Per-response log-likelihood terms, 0 where missing.

    Args:
      g: ``(..., n, m)`` latent values ``f + mu``.
      y: ``(..., n, m)`` int32 categories in 1..C, 0 = missing.
      thresholds: ``(..., m, C+1)`` cutpoints with -inf / +inf endpoints,
        broadcastable against ``g``'s batch axes.
      inv_s: optional tempering scale 1/sqrt(T) (see ll_terms_from_bounds).

    Returns:
      ``(..., n, m)`` array of ``log(Phi(t_y - g) - Phi(t_{y-1} - g) + 1e-6)``
      with exact zeros at missing entries.
    """
    if thresholds.shape[-1] == 3:
        # Binary fast path (C = 2): every observed cell has exactly one
        # finite bound (t_0 = -inf, t_2 = +inf), so the interval probability
        # collapses to Phi(t_1 - g) for y = 1 and 1 - Phi(t_1 - g) for y = 2
        # — ONE Phi per cell instead of two, and a broadcast of t_1 instead
        # of the two one-hot bound contractions. Bitwise-equal to the
        # generic path in float64 (the clamped +-1e30 endpoint saturates
        # _norm_cdf to exactly 0/1, and the HIGHEST-precision one-hot
        # einsums reproduce t_1 exactly); float32 within 1 ulp.
        t1 = thresholds[..., 1]  # (..., m)
        z = t1[..., None, :] - g  # (..., n, m)
        phi = _norm_cdf(z if inv_s is None else z * inv_s)
        p = jnp.where(y == 1, phi, jnp.asarray(1.0, g.dtype) - phi)
        terms = jnp.log(p + jnp.asarray(LL_FLOOR, g.dtype))
        return jnp.where(y > 0, terms, jnp.zeros((), g.dtype))
    z_lo, z_hi, mask = cutpoint_bounds(y, thresholds)
    return ll_terms_from_bounds(g, z_lo, z_hi, mask, inv_s=inv_s)


def ordinal_ll(
    g: jnp.ndarray,
    y: jnp.ndarray,
    thresholds: jnp.ndarray,
    axis=None,
) -> jnp.ndarray:
    """Masked ordinal-probit log-likelihood summed over ``axis``.

    Equivalent to the reference's ``ll_bar_sparse`` summed over observed
    entries (src/log-likelihood.cpp:50-64), evaluated densely with a mask.
    """
    terms = ordinal_ll_terms(g, y, thresholds)
    return jnp.sum(terms, axis=axis)


def delta_to_threshold(deltas: jnp.ndarray) -> jnp.ndarray:
    """Unconstrained deltas -> monotone cutpoints with +-inf endpoints.

    t_0 = -inf, t_1 = delta_0, t_{c+1} = t_c + exp(delta_c), t_C = +inf
    (reference: src/log-likelihood.cpp:66-77). Vectorized over leading axes.

    Args:
      deltas: ``(..., C-1)``.
    Returns:
      ``(..., C+1)``.
    """
    dtype = deltas.dtype
    first = deltas[..., :1]
    if deltas.shape[-1] > 1:
        inner = first + jnp.cumsum(jnp.exp(deltas[..., 1:]), axis=-1)
        finite = jnp.concatenate([first, inner], axis=-1)
    else:
        finite = first
    neg = jnp.full(first.shape, -jnp.inf, dtype)
    pos = jnp.full(first.shape, jnp.inf, dtype)
    return jnp.concatenate([neg, finite, pos], axis=-1)


def threshold_to_delta(thresholds: jnp.ndarray) -> jnp.ndarray:
    """Monotone cutpoints -> unconstrained deltas (inverse of the above).

    delta_0 = t_1, delta_c = log(t_{c+1} - t_c) for c >= 1
    (reference: src/log-likelihood.cpp:79-88).

    Args:
      thresholds: ``(..., C+1)`` including the +-inf endpoints.
    Returns:
      ``(..., C-1)``.
    """
    finite = thresholds[..., 1:-1]  # (..., C-1)
    first = finite[..., :1]
    if finite.shape[-1] > 1:
        gaps = jnp.log(finite[..., 1:] - finite[..., :-1])
        return jnp.concatenate([first, gaps], axis=-1)
    return first
