"""Batched elliptical slice sampling (Murray, Adams & MacKay 2010).

One generic primitive replaces the reference's four hand-written ESS kernels
(src/draw-f.cpp:5-45, src/draw-theta.cpp:26-84, src/draw-beta.cpp:4-49,
src/draw_threshold.cpp:5-96), which share the identical bracket-shrink loop.

TPU-native design: instead of one sequential rejection loop per item/respondent
(the reference fans these out over OpenMP threads), *all* lanes run inside a
single ``lax.while_loop``. Each round evaluates the log-likelihood for every
lane with one fused, dense, masked op; accepted lanes freeze (their state stops
updating) while stragglers keep shrinking their brackets. The loop exits when
every lane has accepted. This preserves the per-lane Markov kernel exactly:
a lane's accept/shrink sequence depends only on its own draws and likelihood.

The acceptance count per lane is geometric-tailed, so the max over a batch is
small (typically < 15 rounds); ``max_rounds`` is a safety bail-out that leaves
a lane's state unchanged (an identity MCMC move, still valid).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

__all__ = ["ess_update"]

_TWO_PI = 6.283185307179586


def ess_update(
    key: jax.Array,
    x: jnp.ndarray,
    nu: jnp.ndarray,
    loglik_fn: Callable[[jnp.ndarray], jnp.ndarray],
    *,
    transform: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    max_rounds: int = 64,
) -> jnp.ndarray:
    """One ESS update for a batch of lanes.

    Args:
      key: PRNG key.
      x: ``(*B, d)`` current state per lane (assumed already in the valid
        region if ``transform`` is given).
      nu: ``(*B, d)`` prior draw ``N(0, Sigma)`` per lane (caller supplies,
        e.g. ``L @ z`` or ``sd * z``).
      loglik_fn: maps ``(*B, d) -> (*B,)`` — the per-lane log-likelihood.
        Must be evaluable for the whole batch in one call.
      transform: optional constraint map applied to every proposal before the
        likelihood and before output (e.g. clamping theta to [-5, 5], matching
        src/draw-theta.cpp:61 where the clamped value is both evaluated and
        kept).
      max_rounds: safety cap on shrink rounds.

    Returns:
      ``(*B, d)`` new state.
    """
    batch_shape = x.shape[:-1]
    dtype = x.dtype
    if transform is None:
        transform = lambda v: v

    k_u, k_eps, k_loop = jax.random.split(key, 3)
    u = jax.random.uniform(k_u, batch_shape, dtype=dtype)
    log_y = loglik_fn(x) + jnp.log(u)

    eps = jax.random.uniform(k_eps, batch_shape, dtype=dtype, maxval=_TWO_PI)
    eps_min = eps - _TWO_PI
    eps_max = jnp.full(batch_shape, _TWO_PI, dtype)

    active0 = jnp.ones(batch_shape, dtype=bool)
    rounds0 = jnp.zeros((), jnp.int32)

    def cond(carry):
        _, _, _, _, _, active, rounds = carry
        return jnp.logical_and(jnp.any(active), rounds < max_rounds)

    def body(carry):
        key, x_out, eps, eps_min, eps_max, active, rounds = carry
        prop = transform(x * jnp.cos(eps)[..., None] + nu * jnp.sin(eps)[..., None])
        ll = loglik_fn(prop)
        accept = ll > log_y
        newly = jnp.logical_and(active, accept)
        x_out = jnp.where(newly[..., None], prop, x_out)
        still = jnp.logical_and(active, jnp.logical_not(accept))
        # Shrink bracket toward 0 for still-active lanes.
        eps_min = jnp.where(jnp.logical_and(still, eps < 0), eps, eps_min)
        eps_max = jnp.where(jnp.logical_and(still, eps >= 0), eps, eps_max)
        key, k_r = jax.random.split(key)
        r = jax.random.uniform(k_r, batch_shape, dtype=dtype)
        eps = jnp.where(still, eps_min + r * (eps_max - eps_min), eps)
        return key, x_out, eps, eps_min, eps_max, still, rounds + 1

    _, x_new, _, _, _, _, _ = jax.lax.while_loop(
        cond, body, (k_loop, x, eps, eps_min, eps_max, active0, rounds0)
    )
    return x_new
