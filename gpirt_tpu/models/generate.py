"""Generative sampling: prior draws and ordinal response simulation.

Implements the model's forward direction (the reference has no simulation
utilities; its roxygen example hand-rolls a 2PL simulator,
R/gpirtMCMC.R:59-80). Used for posterior-predictive checks and for the
Geweke joint-distribution test of the sampler.

The generative model, in the extended-space form the Gibbs sampler actually
targets (see gibbs.py): theta_i on the theta* grid with the discretized
N(mean, sd^2) prior, f* ~ GP(0, K_grid + jitter I) per item on the grid,
beta ~ N(0, diag(sds^2 + 1e-6)) (the sampler's effective zero-mean ESS prior,
src/draw-beta.cpp:16), cutpoints from delta ~ N(0, I), and
y_ij | theta, f*, beta, t ~ ordinal-probit(f*(theta_i) + mu(theta_i)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gpirt_tpu.models.config import GPIRTConfig, GPIRTConstants
from gpirt_tpu.models.gibbs import (
    GPIRTState,
    _gumbel_argmax,
    compute_mu,
    theta_from_indices,
)
from gpirt_tpu.ops.likelihood import delta_to_threshold

__all__ = ["sample_prior_state", "sample_responses", "posterior_predictive"]


def _sample_theta_prior(key, consts, config):
    """Exact draw of theta_idx (H, n) from the sampler's grid prior.

    CST: one theta per respondent shared across sessions, grid-discretized
    N(0, 1 + sd_i^2) (reference src/draw-theta.cpp:158). RDM: independent per
    (session, respondent). GP: the grid-Gibbs theta update's conditionals
    derive from the lattice restriction of the time-GP Gaussian with
    precision Lambda_time (gibbs._draw_theta_grid), so the matching prior is
    the discrete MRF p(theta) ∝ exp(-theta' Lambda theta / 2) on grid^H —
    sampled EXACTLY here by enumerating all grid^H session paths per
    respondent (tractable at test sizes; guarded).
    """
    H, n = config.horizon, config.n
    N = config.grid_size
    dt = config.jdtype
    regime = config.theta_regime
    var = (1.0 + jnp.square(consts.theta_prior_sds[0])).astype(dt)  # (n,)

    if regime == "CST":
        logprior = -0.5 * jnp.square(consts.grid[None, :]) / var[:, None]  # (n, N)
        idx = _gumbel_argmax(key, logprior, axis=1)  # (n,)
        return jnp.broadcast_to(idx[None], (H, n))
    if regime == "RDM":
        logprior = jnp.broadcast_to(
            -0.5 * jnp.square(consts.grid[None, None, :]) / var[None, :, None],
            (H, n, N),
        )
        return _gumbel_argmax(key, logprior, axis=2)  # (H, n)

    # GP regime: exact lattice draw by enumeration of grid^H paths
    if N**H > 300_000:
        raise NotImplementedError(
            f"GP-regime prior enumeration needs grid_size^horizon <= 3e5 "
            f"(got {N}^{H}); use a coarser test grid"
        )
    combos = jnp.stack(
        jnp.meshgrid(*([consts.grid] * H), indexing="ij"), axis=-1
    ).reshape(-1, H)  # (N^H, H)
    lam = consts.Lambda_time.astype(dt)
    logits = -0.5 * jnp.einsum("sh,hg,sg->s", combos, lam, combos)  # (N^H,)
    # Lambda_time is built with zeroed prior sds (reference cache quirk,
    # src/cholesky-cache.cpp:31), so logits are shared across respondents.
    pick = _gumbel_argmax(
        key, jnp.broadcast_to(logits[None], (n, N**H)), axis=1
    )  # (n,)
    strides = N ** jnp.arange(H - 1, -1, -1)  # meshgrid 'ij': axis 0 slowest
    idx = (pick[:, None] // strides[None, :]) % N  # (n, H)
    return idx.T.astype(jnp.int32)  # (H, n)


def sample_prior_state(
    key: jax.Array, consts: GPIRTConstants, config: GPIRTConfig
) -> GPIRTState:
    """Draw (theta_idx, f*, beta, thresholds) from the sampler's prior.

    Covers all three theta regimes (see _sample_theta_prior) and
    constant_IRF (one shared grid function, beta, and cutpoint vector across
    sessions, reference src/gpirtMCMC.cpp:164-202 + src/draw_threshold.cpp:
    181-204). f* is drawn on the grid via the precomputed grid Cholesky;
    f is its gather at theta.
    """
    H, n, m = config.horizon, config.n, config.m
    N, C = config.grid_size, config.C
    dt = config.jdtype
    k_t, k_f, k_b, k_d = jax.random.split(key, 4)

    theta_idx = _sample_theta_prior(k_t, consts, config)

    sd_b = jnp.sqrt(jnp.square(consts.beta_prior_sds) + 1e-6).astype(dt)  # (3, m)
    if config.constant_IRF:
        z = jax.random.normal(k_f, (N, m), dt)
        fstar = jnp.broadcast_to((consts.L_grid @ z)[None], (H, N, m))
        beta = jnp.broadcast_to(
            jax.random.normal(k_b, (1, 3, m), dt) * sd_b[None], (H, 3, m)
        )
        delta = jax.random.normal(k_d, (1, m, C - 1), dt)
        thresholds = jnp.broadcast_to(
            delta_to_threshold(delta), (H, m, C + 1)
        )
    else:
        z = jax.random.normal(k_f, (H, N, m), dt)
        fstar = jnp.einsum("ab,hbm->ham", consts.L_grid, z)
        beta = jax.random.normal(k_b, (H, 3, m), dt) * sd_b[None]
        delta = jax.random.normal(k_d, (H, m, C - 1), dt)
        thresholds = delta_to_threshold(delta)

    f = jnp.take_along_axis(fstar, theta_idx[:, :, None], axis=1)
    return GPIRTState(
        theta_idx=theta_idx, f=f, beta=beta, thresholds=thresholds, fstar=fstar
    )


def sample_responses(
    key: jax.Array,
    state: GPIRTState,
    consts: GPIRTConstants,
    config: GPIRTConfig,
    mask: jnp.ndarray = None,
    temp=None,
) -> jnp.ndarray:
    """Draw y | state from the ordinal-probit model: (H, n, m) int32, 1..C.

    Inverse-transform over the cutpoints: y = 1 + #{c : u > Phi(t_c - g)}.
    ``mask`` (bool, (H, n, m)) marks observed cells; unobserved get 0.
    ``temp`` samples from the TEMPERED observation model (noise sd sqrt(T),
    see parallel/tempering.py) — used by the tempered Geweke oracle.
    """
    H, n, m = state.f.shape
    C = config.C
    dt = state.f.dtype
    theta = theta_from_indices(state.theta_idx, consts)
    g = state.f + compute_mu(theta, state.beta)  # (H, n, m)
    u = jax.random.uniform(key, (H, n, m), dt)
    # interior cutpoints: (H, m, C-1) -> compare against Phi(t_c - g)
    t_int = state.thresholds[..., 1:C]  # (H, m, C-1)
    z = t_int[:, None, :, :] - g[..., None]  # (H, n, m, C-1)
    c = jnp.asarray(0.7071067811865476, dt)
    if temp is not None:
        c = c / jnp.sqrt(jnp.asarray(temp, dt))
    cdf = 0.5 * (1.0 + jax.lax.erf(z * c))
    y = 1 + jnp.sum(u[..., None] > cdf, axis=-1).astype(jnp.int32)
    if mask is not None:
        y = jnp.where(mask, y, 0)
    return y


def posterior_predictive(
    key: jax.Array,
    draws: dict,
    consts: GPIRTConstants,
    config: GPIRTConfig,
    mask: jnp.ndarray = None,
) -> jnp.ndarray:
    """Simulate replicate response cubes from stored posterior draws.

    Expects internal-layout draws (as returned by models.sampler.run_chain
    with store_f=True): f (S, H, n, m), theta (S, H, n), beta (S, H, 3, m),
    threshold (S, H, m, C+1). Returns (S, H, n, m) int32 replicates.
    """
    S = draws["theta"].shape[0]

    def one(i, k):
        from gpirt_tpu.models.gibbs import snap_indices

        state = GPIRTState(
            theta_idx=snap_indices(draws["theta"][i], config),
            f=draws["f"][i],
            beta=draws["beta"][i],
            thresholds=draws["threshold"][i],
            fstar=jnp.zeros((config.horizon, config.grid_size, config.m),
                            config.jdtype),
        )
        return sample_responses(k, state, consts, config, mask)

    keys = jax.random.split(key, S)
    return jax.vmap(one)(jnp.arange(S), keys)
