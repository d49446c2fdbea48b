"""The GP-IRT Gibbs sweep: batched latent/trait/cutpoint blocks, one fused
device op per inner step.

Redesign notes (vs the reference's per-item/per-respondent OpenMP loops):

* Every Gram on the hot path is a **gather** from the precomputed master grid
  Gram: theta is snapped to the fixed theta* grid after each draw (reference
  src/draw-theta.cpp:165-168), so K(theta,theta) = grid_gram[idx][:, idx] and
  K(theta, theta*) = grid_gram[idx]. Zero kernel evaluations per iteration.

* Three latent samplers (``f_method``), all targeting the same posterior
  (validated by the Geweke tests):
  - "conjugate" (auto default): Albert-Chib truncated-normal augmentation —
    f* and beta become exact Gaussian draws (no rejection loops), with a
    pathwise grid draw against one superbly-conditioned (n,n) factor of
    K + I per sweep.
  - "grid": one ESS directly on f* with the precomputed grid-Cholesky prior
    (f == f*[theta_idx]) — zero per-iteration factorizations at any n.
  - "two_stage": the reference's draw_f + draw_fstar pipeline, with the
    dominant per-iteration 1001x1001 posterior Cholesky
    (src/draw-fstar.cpp:26-36) replaced by **Matheron's rule**
      f* | f  =  u* + K*^T K^{-1} (f - u),   (u*, u) ~ joint prior,
    u = u*[idx] since theta lies on the grid (the reference-style
    posterior-Cholesky is kept as ``fstar_method="chol"`` for validation).

* Each ESS block updates *all* lanes (items or respondents, all horizons, and
  under vmap all chains) inside one ``lax.while_loop`` whose per-round
  likelihood is a single dense masked op — MXU/VPU-shaped instead of 600
  OpenMP tasks. The theta update defaults to the exact grid-conditional draw
  (MXU-matmul likelihood table + Gumbel-max).

Reference block semantics reproduced: draw_f (src/draw-f.cpp), draw_fstar
(src/draw-fstar.cpp), draw_theta with the three length-scale regimes and grid
snap (src/draw-theta.cpp), draw_beta with zero-observation skip
(src/draw-beta.cpp), draw_threshold in the delta parametrization
(src/draw_threshold.cpp), swept in the order of src/gpirtMCMC.cpp:261-356.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from gpirt_tpu.models.config import GPIRTConfig, GPIRTConstants, THETA_LO, THETA_HI
from gpirt_tpu.ops.ess import ess_update
from gpirt_tpu.ops.kernels import icc_gram
from gpirt_tpu.ops.likelihood import (
    ordinal_ll_terms,
    cutpoint_bounds,
    ll_terms_from_bounds,
    delta_to_threshold,
    threshold_to_delta,
)
from gpirt_tpu.ops.linalg import chol3, chol_with_jitter, tri3_solve, tri_solve

_SQRT2 = 1.4142135623730951
_TWO_PI = 6.283185307179586

__all__ = [
    "GPIRTState",
    "init_state",
    "gibbs_sweep",
    "snap_indices",
    "theta_from_indices",
    "compute_mu",
    "total_loglik",
    "draw_fstar",
    "affine_theta_moves",
    "shift_orbit_gibbs",
]


class GPIRTState(NamedTuple):
    """Markov chain state. Layouts put the horizon axis first.

    theta_idx:  (H, n)  int32 indices into the theta* grid
    f:          (H, n, m)  latent GP values at respondent locations
    beta:       (H, 3, m)  parametric mean coefficients
    thresholds: (H, m, C+1) ordinal cutpoints with +-inf endpoints
    fstar:      (H, N, m)  latent GP values on the theta* grid
    """

    theta_idx: jnp.ndarray
    f: jnp.ndarray
    beta: jnp.ndarray
    thresholds: jnp.ndarray
    fstar: jnp.ndarray


# ---------------------------------------------------------------------------
# small helpers
# ---------------------------------------------------------------------------


def snap_indices(theta: jnp.ndarray, config: GPIRTConfig) -> jnp.ndarray:
    """Continuous theta -> nearest grid index (reference round((t+5)/0.01))."""
    idx = jnp.round((theta - THETA_LO) / config.grid_step).astype(jnp.int32)
    return jnp.clip(idx, 0, config.grid_size - 1)


def theta_from_indices(idx: jnp.ndarray, consts: GPIRTConstants) -> jnp.ndarray:
    return consts.grid[idx]


def build_X(theta: jnp.ndarray) -> jnp.ndarray:
    """(H, n) -> (H, n, 3) design [1, theta, theta^2]."""
    return jnp.stack([jnp.ones_like(theta), theta, theta * theta], axis=-1)


def compute_mu(theta: jnp.ndarray, beta: jnp.ndarray) -> jnp.ndarray:
    """mu = X(theta) @ beta: (H,n),(H,3,m) -> (H,n,m)."""
    X = build_X(theta)
    return jnp.einsum("hnp,hpm->hnm", X, beta)


def compute_mu_star(consts: GPIRTConstants, beta: jnp.ndarray) -> jnp.ndarray:
    """mu* = Xstar @ beta: (N,3),(H,3,m) -> (H,N,m)."""
    return jnp.einsum("np,hpm->hnm", consts.Xstar, beta)


def gather_theta_gram(theta_idx: jnp.ndarray, consts: GPIRTConstants) -> jnp.ndarray:
    """K(theta_h, theta_h) for all horizons by gathering the grid Gram.

    theta_idx: (H, n) -> (H, n, n).
    """
    return consts.grid_gram[theta_idx[:, :, None], theta_idx[:, None, :]]


def theta_chol(theta_idx: jnp.ndarray, consts: GPIRTConstants, config: GPIRTConfig):
    """Batched (H, n, n) Cholesky of the gathered theta Gram + jitter."""
    return chol_with_jitter(
        gather_theta_gram(theta_idx, consts), config.device_jitter,
        normalized=config.chol_normalized,
    )


def combined_theta_chol(theta_idx: jnp.ndarray, consts, config):
    """constant_IRF: one (n*H, n*H) factor over all horizons stacked
    (reference src/draw-f.cpp:84-108)."""
    flat = theta_idx.reshape(-1)  # (H*n,) in [h*n + i] order
    gram = consts.grid_gram[flat[:, None], flat[None, :]]
    return chol_with_jitter(gram, config.device_jitter, normalized=config.chol_normalized)


def total_loglik(state: GPIRTState, y: jnp.ndarray, consts: GPIRTConstants) -> jnp.ndarray:
    """Total masked ordinal log-likelihood (reference src/gpirtMCMC.cpp:324-331)."""
    theta = theta_from_indices(state.theta_idx, consts)
    g = state.f + compute_mu(theta, state.beta)
    return jnp.sum(ordinal_ll_terms(g, y, state.thresholds))


# ---------------------------------------------------------------------------
# block: draw_f
# ---------------------------------------------------------------------------


def draw_f(
    key: jax.Array,
    state: GPIRTState,
    mu: jnp.ndarray,
    y: jnp.ndarray,
    consts: GPIRTConstants,
    config: GPIRTConfig,
) -> jnp.ndarray:
    """ESS redraw of f for every item (all horizons at once).

    Non-constant IRFs: lanes are (H, m) with site dimension n, prior
    N(0, K(theta_h, theta_h) + jitter I).
    Constant IRFs: lanes are (m,) with site dimension n*H over the stacked GP.
    Prior perturbations come from the gathered eigenbasis
    (theta_prior_perturbation) — no per-iteration (n, n) or (nH, nH)
    Cholesky (the reference factors K_theta every sweep for exactly this
    draw, src/draw-f.cpp:59).
    """
    H, n, m = state.f.shape
    k_nu, k_ess = jax.random.split(key)
    if not config.constant_IRF:
        nu = theta_prior_perturbation(k_nu, state.theta_idx, consts, config,
                                      m, state.f.dtype)  # (H, n, m)
        x = jnp.swapaxes(state.f, 1, 2)  # (H, m, n)
        nu_t = jnp.swapaxes(nu, 1, 2)
        # hoist the per-observation cutpoint gathers out of the shrink loop
        z_lo, z_hi, mask = cutpoint_bounds(y, state.thresholds)

        def loglik(xt):  # (H, m, n) -> (H, m)
            g = jnp.swapaxes(xt, 1, 2) + mu
            return jnp.sum(ll_terms_from_bounds(g, z_lo, z_hi, mask), axis=1)

        x_new = ess_update(k_ess, x, nu_t, loglik, max_rounds=config.ess_max_rounds)
        return jnp.swapaxes(x_new, 1, 2)

    # constant IRF: stack horizons into one (n*H)-dimensional GP (the
    # eigenbasis gather at the flat [h*n + i] indices IS the stacked-GP
    # factor the reference builds densely, src/draw-f.cpp:84-108)
    nh = n * H
    nu = theta_prior_perturbation(k_nu, state.theta_idx.reshape(-1), consts,
                                  config, m, state.f.dtype)  # (nh, m)
    f_flat = state.f.reshape(nh, m)
    mu_flat = mu.reshape(nh, m)
    y_flat = y.reshape(nh, m)
    thr0 = state.thresholds[0]  # shared cutpoints, slice 0
    x = f_flat.T  # (m, nh)
    z_lo, z_hi, mask = cutpoint_bounds(y_flat, thr0)

    def loglik(xt):  # (m, nh) -> (m,)
        g = xt.T + mu_flat
        return jnp.sum(ll_terms_from_bounds(g, z_lo, z_hi, mask), axis=0)

    x_new = ess_update(k_ess, x, nu.T, loglik, max_rounds=config.ess_max_rounds)
    return x_new.T.reshape(H, n, m)


# ---------------------------------------------------------------------------
# block: draw_fstar
# ---------------------------------------------------------------------------



def _normal2d(key, shape, dt):
    """``jax.random.normal`` generated with leading dims flattened.

    TPU layout assignment places an RNG output's SECOND-MINOR dim in the
    vreg sublane slot; for ≥3-D shapes whose second-minor dim is tiny —
    the (H, N, m) / (H, n, m) draws under a chain vmap with H = 1 — that
    yields a degenerate T(1,128) tiling, and every fused elementwise
    consumer of the bits runs at 1/8 VPU rate (measured: the grid nugget
    chain was ~5 of the 10 big T(1,128) ops in the senate116 sweep HLO).
    Generating (prod(lead), minor) and reshaping keeps T(8,128); the bit
    stream is unchanged (bits are assigned by flat position), so draws are
    bitwise identical to the direct-shape call.
    """
    if len(shape) <= 2:
        return jax.random.normal(key, shape, dt)
    flat = 1
    for s in shape[:-1]:
        flat *= int(s)
    return jax.random.normal(key, (flat, int(shape[-1])), dt).reshape(shape)


def _uniform2d(key, shape, dt):
    """``jax.random.uniform`` twin of :func:`_normal2d`."""
    if len(shape) <= 2:
        return jax.random.uniform(key, shape, dt)
    flat = 1
    for s in shape[:-1]:
        flat *= int(s)
    return jax.random.uniform(key, (flat, int(shape[-1])), dt).reshape(shape)


def grid_prior_draw(key, consts, config, lead_shape, m, dt):
    """GP prior draw on the theta* grid via the rank-(q+3) eigenbasis.

    K_grid + jitter I = U_se U_se^T + Psi Psi^T + jitter I to the ~1e-13
    truncation of consts.U_se (verified against the dense kernel in
    make_constants' eigendecomposition), so this is distributionally the
    L_grid @ z draw at N(q+3)m instead of N^2 m MACs — the dense triangular
    matmul was the single largest flop sink of the conjugate sweep (~53
    GFLOP at 64 senate116 chains; perf anatomy r2). HIGHEST-precision
    einsums are affordable at this size, removing the bf16 quantization the
    dense draw silently carried on TPU.
    """
    N = config.grid_size
    q = consts.U_se.shape[1]
    k_q, k_p, k_n = jax.random.split(key, 3)
    hi = jax.lax.Precision.HIGHEST
    z_q = _normal2d(k_q, lead_shape + (q, m), dt)
    z_p = _normal2d(k_p, lead_shape + (3, m), dt)
    z_n = _normal2d(k_n, lead_shape + (N, m), dt)
    return (jnp.einsum("aq,...qm->...am", consts.U_se, z_q, precision=hi)
            + jnp.einsum("ap,...pm->...am", consts.Psi_grid, z_p,
                         precision=hi)
            + jnp.sqrt(jnp.asarray(config.jitter, dt)) * z_n)


def theta_site_basis(theta_idx: jnp.ndarray, consts: GPIRTConstants):
    """Gathered low-rank basis U with U U^T = K(theta, theta) to the
    ~1e-13 eigendecomposition truncation of consts.U_se: rows of
    [U_se, Psi_grid] at the snapped grid indices. Any index shape
    (..., n) -> (..., n, q+3)."""
    return jnp.concatenate(
        [consts.U_se[theta_idx], consts.Psi_grid[theta_idx]], axis=-1
    )


def theta_prior_perturbation(key, theta_idx, consts, config, m, dt):
    """N(0, K(theta, theta) + device_jitter I) draw at the snapped theta
    sites via the gathered eigenbasis — the site-space twin of
    grid_prior_draw. Replaces the chol(K_theta) / L @ z pattern (the
    reference's prior perturbation for its ESS f updates,
    src/draw-f.cpp:59-66) at O(n(q+3)m) instead of O(n^3 + n^2 m), with
    no (n, n) factorization. theta_idx (..., n) -> (..., n, m)."""
    U = theta_site_basis(theta_idx, consts)  # (..., n, k)
    k = U.shape[-1]
    lead, n = theta_idx.shape[:-1], theta_idx.shape[-1]
    k_u, k_n = jax.random.split(key)
    z_u = _normal2d(k_u, lead + (k, m), dt)
    z_n = _normal2d(k_n, lead + (n, m), dt)
    return (jnp.einsum("...nk,...km->...nm", U, z_u, precision=_HI)
            + jnp.sqrt(jnp.asarray(config.device_jitter, dt)) * z_n)


def _fstar_matheron(key, f, theta_idx, consts, config):
    """Pathwise conditional draw on the grid; see module docstring.

    Returns the ZERO-MEAN GP conditional f* | f. Note a deliberate divergence
    from the reference here: the reference folds mu_star into its fstar
    (src/draw-fstar.cpp:52), then adds mu_star AGAIN in the theta likelihood
    (src/draw-theta.cpp:17), and snaps the mu-inclusive fstar back into the
    zero-mean f slot (src/gpirtMCMC.cpp:296) — double-counting the parametric
    mean (it self-stabilizes only because beta then collapses toward its
    prior and the composite kernel absorbs the mean). We keep f / f* strictly
    zero-mean internally and add the mean exactly once at each use site; the
    *returned* fstar draws add mu_star back for output parity (see
    sampler.run_chain). Verified by the Geweke joint-distribution test.

    The smoother k*^T (K_nn + jI)^{-1} r runs entirely in the rank-(q+3)
    eigenbasis via the push-through identity
        U_n^T (U_n U_n^T + jI)^{-1} = (U_n^T U_n + jI)^{-1} U_n^T,
    with k* = U_n U_N^T (exact: both Grams are gathers of the SAME master
    eigenbasis) — so the whole conditional is gathers + small matmuls + one
    (q+3, q+3) Cholesky. This replaced the (n, n) theta Cholesky + the
    O(n^2 N) triangular solve of the dense Matheron (the reference pays
    chol(K_theta) every iteration, src/draw-fstar.cpp:28-39); conditioning
    is IDENTICAL to the dense solve (same K_nn + jI spectrum), handled the
    same way as lowrank_bsolve: equilibrated capacitance + one refinement.
    """
    H, n, m = f.shape
    N = config.grid_size
    dt = f.dtype
    q = consts.U_se.shape[1]
    # prior draws on the grid, factored through the shared basis (see
    # draw_fstar_conjugate): u* = U_grid z_c + sqrt(j) z_n is never
    # materialized — its theta-site values come from the gathered basis and
    # the final f* fuses the projection into the SAME U_grid matmul
    k_q, k_p, k_n = jax.random.split(key, 3)
    z_q = _normal2d(k_q, (H, q, m), dt)
    z_p = _normal2d(k_p, (H, 3, m), dt)
    z_n = _normal2d(k_n, (H, N, m), dt)
    zc = jnp.concatenate([z_q, z_p], axis=1)  # (H, q+3, m)
    sj = jnp.sqrt(jnp.asarray(config.jitter, dt))
    U = theta_site_basis(theta_idx, consts)  # (H, n, k)
    k = U.shape[-1]
    u_theta = (jnp.einsum("hnk,hkm->hnm", U, zc, precision=_HI)
               + sj * jnp.take_along_axis(
                   z_n, theta_idx[:, :, None].astype(jnp.int32), axis=1))
    g = jnp.einsum("hnk,hnm->hkm", U, f - u_theta, precision=_HI)
    j = jnp.asarray(config.device_jitter, dt)
    C = j * jnp.eye(k, dtype=dt) + jnp.einsum(
        "hnk,hnl->hkl", U, U, precision=_HI
    )
    sc = jnp.sqrt(jnp.diagonal(C, axis1=-2, axis2=-1))  # (H, k)
    inv_sc = 1.0 / sc
    Lc = jnp.linalg.cholesky(C * (inv_sc[..., :, None] * inv_sc[..., None, :]))

    def c_solve(rhs):
        w = tri_solve(Lc, rhs * inv_sc[..., None])
        return tri_solve(Lc, w, trans=True) * inv_sc[..., None]

    x = c_solve(g)
    x = x + c_solve(g - jnp.einsum("hkl,hlm->hkm", C, x, precision=_HI))
    U_grid = jnp.concatenate([consts.U_se, consts.Psi_grid], axis=-1)  # (N, k)
    return jnp.einsum("ak,hkm->ham", U_grid, zc + x, precision=_HI) + sj * z_n


def _fstar_chol(key, f, theta_idx, L, consts, config):
    """Reference-style posterior Cholesky draw (src/draw-fstar.cpp:20-57),
    zero-mean like _fstar_matheron (the mean is added at use/output sites)."""
    kstar = consts.grid_gram[theta_idx]  # (H, n, N)
    V = tri_solve(L, kstar)  # L^{-1} K*
    K_post = consts.grid_gram[None] - jnp.einsum("hna,hnb->hab", V, V)
    L_post = chol_with_jitter(K_post, config.jitter)
    w = tri_solve(L, f)  # whitened f
    mean = jnp.einsum("hna,hnm->ham", V, w)
    z = _normal2d(key, mean.shape, f.dtype)
    return mean + jnp.einsum("hab,hbm->ham", L_post, z)


def _fstar_constant_irf(key, f, theta_idx, consts, config):
    """constant_IRF path: 100 inducing points + linear interpolation
    (reference src/draw-fstar.cpp:58-125), Matheron-ized.

    The reference interpolates the stacked f onto inducing points spread over
    [min(theta), max(theta)] and conditions the grid draw on those values.
    """
    H, n, m = f.shape
    N = config.grid_size
    p = config.n_inducing
    dt = f.dtype
    theta_all = theta_from_indices(theta_idx, consts).reshape(-1)  # (H*n,)
    f_all = f.reshape(H * n, m)
    lo, hi = jnp.min(theta_all), jnp.max(theta_all)
    inducing = lo + (hi - lo) * jnp.arange(p, dtype=dt) / (p - 1)

    # interp f onto inducing points (reference arma::interp1 "linear";
    # jnp.interp needs sorted x)
    order = jnp.argsort(theta_all)
    xs = theta_all[order]
    f_ind = jax.vmap(lambda col: jnp.interp(inducing, xs, col[order]), 1, 1)(f_all)

    sds = consts.beta_prior_sds[:, 0]
    K_ind = icc_gram(inducing, inducing, sds)
    L_ind = chol_with_jitter(K_ind, config.device_jitter, normalized=config.chol_normalized)
    kstar = icc_gram(inducing, consts.grid, sds)  # (p, N)

    ustar = grid_prior_draw(key, consts, config, (), m,
                            dt)  # shared prior draw on grid (one set of IRFs)
    u_ind = jax.vmap(lambda col: jnp.interp(inducing, consts.grid, col), 1, 1)(ustar)
    V = tri_solve(L_ind, kstar)  # (p, N)
    w = tri_solve(L_ind, f_ind - u_ind)  # (p, m)
    fstar0 = ustar + V.T @ w
    return jnp.broadcast_to(fstar0[None], (H, N, m))


def draw_fstar(
    key: jax.Array,
    f: jnp.ndarray,
    theta_idx: jnp.ndarray,
    consts: GPIRTConstants,
    config: GPIRTConfig,
) -> jnp.ndarray:
    """Zero-mean GP conditional draw of f* | f on the grid. Add mu_star at
    the use site (theta likelihood) or output boundary (stored draws).
    Only the opt-in reference-style "chol" method still factors the (n, n)
    theta Gram; the default Matheron path is fully low-rank."""
    if config.constant_IRF:
        return _fstar_constant_irf(key, f, theta_idx, consts, config)
    if config.fstar_method == "matheron":
        return _fstar_matheron(key, f, theta_idx, consts, config)
    L = theta_chol(theta_idx, consts, config)
    return _fstar_chol(key, f, theta_idx, L, consts, config)


def draw_fstar_direct(
    key: jax.Array,
    state: GPIRTState,
    mu: jnp.ndarray,
    y: jnp.ndarray,
    config: GPIRTConfig,
    consts: GPIRTConstants,
):
    """Grid-native latent update (f_method="grid"): ESS directly on f*.

    Because theta is snapped to the grid, f is *identically* f*[theta_idx]
    rows — the reference's two-stage pipeline (n-dim ESS on f, then the
    conditional f* | f, src/draw-f.cpp + src/draw-fstar.cpp) factors the same
    object twice and pays a fresh K(theta,theta) Cholesky every iteration.
    Here each item's full grid function f*_j is updated by one ESS move with
    the PRECOMPUTED grid Cholesky prior (nu = L_grid z) and a likelihood that
    just gathers the rows at theta_idx. Zero per-iteration factorizations at
    ANY n — the dominant cost of the reference's sampler disappears entirely.

    Differences from the two-stage pipeline (documented): respondents sharing
    a grid point share their latent value exactly (the reference separates
    them by its 1e-6 nugget), and the off-position part of f* makes one
    elliptical move instead of an exact conditional redraw. Both are
    O(nugget)/mixing-rate effects; the stationary distribution is validated
    by the Geweke joint-distribution test with f_method="grid".

    Returns (fstar, f) with f = f*[theta_idx].
    """
    H, N, m = state.fstar.shape
    idx = state.theta_idx  # (H, n)
    k_nu, k_ess = jax.random.split(key)
    z_lo, z_hi, mask = cutpoint_bounds(y, state.thresholds)  # (H, n, m)

    if config.constant_IRF:
        # one shared grid function across horizons: lanes (m,), sites N
        nu = grid_prior_draw(k_nu, consts, config, (), m,
                             state.fstar.dtype)  # (N, m)
        x = state.fstar[0].T  # (m, N)

        def loglik(xt):  # (m, N) -> (m,)
            fst = jnp.broadcast_to(xt.T[None], (H, N, m))
            f_at = jnp.take_along_axis(fst, idx[:, :, None], axis=1)
            return jnp.sum(ll_terms_from_bounds(f_at + mu, z_lo, z_hi, mask),
                           axis=(0, 1))

        x_new = ess_update(k_ess, x, nu.T, loglik, max_rounds=config.ess_max_rounds)
        fstar = jnp.broadcast_to(x_new.T[None], (H, N, m))
    else:
        nu = grid_prior_draw(k_nu, consts, config, (H,), m,
                             state.fstar.dtype)  # (H, N, m)
        x = jnp.swapaxes(state.fstar, 1, 2)  # (H, m, N)
        nu_t = jnp.swapaxes(nu, 1, 2)

        def loglik(xt):  # (H, m, N) -> (H, m)
            fst = jnp.swapaxes(xt, 1, 2)  # (H, N, m)
            f_at = jnp.take_along_axis(fst, idx[:, :, None], axis=1)  # (H,n,m)
            return jnp.sum(ll_terms_from_bounds(f_at + mu, z_lo, z_hi, mask),
                           axis=1)

        x_new = ess_update(k_ess, x, nu_t, loglik, max_rounds=config.ess_max_rounds)
        fstar = jnp.swapaxes(x_new, 1, 2)

    f = jnp.take_along_axis(fstar, idx[:, :, None], axis=1)
    return fstar, f


def _temp_scales(temp, dt):
    """(sqrt_T, inv_sqrt_T) for tempering; (None, None) when untempered.

    ``temp = None`` keeps every call site's HLO byte-identical to the
    untempered build; a traced scalar tempers the observation noise to
    sd sqrt(T) (see parallel/tempering.py).
    """
    if temp is None:
        return None, None
    t = jnp.asarray(temp, dt)
    s = jnp.sqrt(t)
    return s, 1.0 / s


def draw_z_truncnorm(
    key: jax.Array,
    g: jnp.ndarray,
    y: jnp.ndarray,
    thresholds: jnp.ndarray,
    temp=None,
) -> jnp.ndarray:
    """Albert-Chib (1993) latent responses: z_ij ~ N(g_ij, T) truncated to
    the observed category's cutpoint interval; unconstrained for missing
    cells (a valid conditional draw — missing responses carry no truncation
    information, and imputing them keeps the downstream GP regression a
    complete-data problem with one shared noise model). T = 1 unless
    tempered (``temp``).

    Inverse-CDF sampling: z = g + ndtri(Phi(lo-g) + u (Phi(hi-g) - Phi(lo-g))).

    The cutpoint interval is materialized by one-hot contractions over the
    (C+1)-sized threshold axis rather than per-cell take_along_axis gathers
    — the two (H, n, m)-indexed gathers measured ~2 ms of a 10 ms sweep at
    64 chains (random-access bound), while the contraction is a fused
    length-(C+1) dot per cell. Infinite endpoints are clamped to +-1e30 so
    0 * inf never produces NaN; semantics are unchanged.
    """
    dt = g.dtype
    big = jnp.asarray(1e30, dt)
    t_clip = jnp.clip(thresholds, -big, big)  # (H, m, C+1)
    Cp1 = thresholds.shape[-1]
    sqrt_t, inv_s = _temp_scales(temp, dt)
    c = jnp.asarray(0.7071067811865476, dt)
    if inv_s is not None:
        c = c * inv_s
    if Cp1 == 3:
        # binary (C = 2): the only finite bound of ANY observed cell is the
        # single interior cutpoint t_1 — one erf per cell instead of two,
        # and no one-hot contractions at all (y = 1 -> hi = t_1; y = 2 ->
        # lo = t_1; y = 0 missing -> unconstrained)
        t1 = t_clip[:, None, :, 1]  # (H, 1, m)
        cdf_b = 0.5 * (1.0 + jax.lax.erf((t1 - g) * c))
        cdf_lo = jnp.where(y == 2, cdf_b, 0.0)
        cdf_hi = jnp.where(y == 1, cdf_b, 1.0)
        z_lo = jnp.where(y == 2, t1, -big)  # for the far-tail fallback
        z_hi = jnp.where(y == 1, t1, big)
    else:
        oh_hi = jax.nn.one_hot(y, Cp1, dtype=dt)      # selects t[y]
        oh_lo = jax.nn.one_hot(y - 1, Cp1, dtype=dt)  # t[y-1]; y=0 -> none
        # HIGHEST: TPU default-bf16 matmuls would quantize the truncation
        # bounds to ~8-bit mantissa (~0.4% relative) — a systematic bias in
        # every float32 z draw the f64 Geweke tests cannot see; these are
        # length-(C+1) dots, true-f32 is free (ADVICE r2)
        hi_p = jax.lax.Precision.HIGHEST
        z_hi = jnp.einsum("hijc,hjc->hij", oh_hi, t_clip, precision=hi_p)
        z_lo = jnp.einsum("hijc,hjc->hij", oh_lo, t_clip, precision=hi_p)
        mask = y > 0
        cdf_lo = 0.5 * (1.0 + jax.lax.erf((z_lo - g) * c))
        cdf_hi = 0.5 * (1.0 + jax.lax.erf((z_hi - g) * c))
        # missing cells: full-support draw
        cdf_lo = jnp.where(mask, cdf_lo, 0.0)
        cdf_hi = jnp.where(mask, cdf_hi, 1.0)
    u = _uniform2d(key, g.shape, dt)
    eps = jnp.asarray(1e-6, dt)
    p = jnp.clip(cdf_lo + u * (cdf_hi - cdf_lo), eps, 1.0 - eps)
    # Phi^-1 via erf_inv: XLA's TPU erf_inv lowering is ~3x cheaper than
    # jax.scipy's ndtri rational-polynomial (0.29 vs 0.86 ms for this
    # (K=64,H,n,m) pass) at comparable f32 accuracy (max abs err 0.021 vs
    # 0.033 over the clipped domain, both in the 1e-6 tails)
    q = (_SQRT2 * jax.lax.erf_inv(2.0 * p - 1.0)).astype(dt)
    z = g + (q if sqrt_t is None else sqrt_t * q)
    # far-tail degenerate intervals: fall back to the nearest bound
    # (endpoint cutpoints are clamped to +-1e30, so test magnitude)
    tail = (cdf_hi - cdf_lo) < eps
    fallback = jnp.clip(g, jnp.where(z_lo > -1e29, z_lo, g),
                        jnp.where(z_hi < 1e29, z_hi, g))
    return jnp.where(tail, fallback, z)


def _fstar_conjugate_pooled(k_u, k_e, idx, z_resid, consts, config, sqrt_t,
                            temp, respondent_axis):
    """constant_IRF conjugate f* | z: the stacked (H*n)-site GP regression
    on one shared grid function (see draw_fstar_conjugate docstring)."""
    H, n, m = z_resid.shape
    N = config.grid_size
    dt = z_resid.dtype
    q = consts.U_se.shape[1]
    hi = jax.lax.Precision.HIGHEST
    k_q, k_p, k_n = jax.random.split(k_u, 3)
    z_q = _normal2d(k_q, (q, m), dt)
    z_p = _normal2d(k_p, (3, m), dt)
    z_n = _normal2d(k_n, (N, m), dt)
    zc = jnp.concatenate([z_q, z_p], axis=0)  # (q+3, m)
    sj = jnp.sqrt(jnp.asarray(config.jitter, dt))
    U_theta = theta_site_basis(idx, consts)  # (H, n, q+3)
    u_theta = (jnp.einsum("hnk,km->hnm", U_theta, zc, precision=hi)
               + sj * z_n[idx])  # same draw gathered at every horizon
    eps = _normal2d(k_e, (H, n, m), dt)
    if sqrt_t is not None:
        eps = eps * sqrt_t
    t = jnp.asarray(1.0 if temp is None else temp, dt)

    def _rsum(v):
        return v if respondent_axis is None else jax.lax.psum(
            v, respondent_axis)

    # push-through smoother pooled over horizons (one k-dim solve total)
    g_k = _rsum(jnp.einsum("hnk,hnm->km", U_theta,
                           z_resid - u_theta - eps, precision=hi))
    k_dim = U_theta.shape[-1]
    C = t * jnp.eye(k_dim, dtype=dt) + _rsum(jnp.einsum(
        "hnk,hnl->kl", U_theta, U_theta, precision=hi))
    sc = jnp.sqrt(jnp.diagonal(C))
    inv_sc = 1.0 / sc
    Lc = jnp.linalg.cholesky(C * (inv_sc[:, None] * inv_sc[None, :]))

    def c_solve(rhs):
        w = tri_solve(Lc, rhs * inv_sc[:, None])
        return tri_solve(Lc, w, trans=True) * inv_sc[:, None]

    ua = c_solve(g_k)
    ua = ua + c_solve(g_k - jnp.einsum("kl,lm->km", C, ua, precision=hi))
    U_grid = jnp.concatenate([consts.U_se, consts.Psi_grid], axis=-1)
    fstar0 = jnp.einsum("ak,km->am", U_grid, zc + ua, precision=hi) + sj * z_n
    fstar = jnp.broadcast_to(fstar0[None], (H, N, m))
    f = jnp.take_along_axis(fstar, idx[:, :, None], axis=1)
    return fstar, f


def draw_fstar_conjugate(
    key: jax.Array,
    state: GPIRTState,
    z_resid: jnp.ndarray,
    config: GPIRTConfig,
    consts: GPIRTConstants,
    temp=None,
    respondent_axis=None,
):
    """Exact Gaussian draw of f* | z (f_method="conjugate").

    Given Albert-Chib latents z = f(theta) + mu + eps with unit noise, f* on
    the grid is a GP-regression posterior; the pathwise (Matheron) draw is
        f* = u* + K_{*theta} (K_theta + I)^{-1} (z - mu - u - eps'),
    (u*, u) a joint prior draw (grid draw + gather) and eps' ~ N(0, I).
    The (K_theta + I)^{-1} solve runs through the Woodbury rank-3 kernel
    split (see WoodburyB): one (n, n) Cholesky of K_SE + I per sweep —
    condition <= n + 1 at any theta, float32-accurate at any data scale
    (the round-1 direct factorization lost float32 past n ~ 500) — shared
    across all items.

    Args:
      z_resid: (H, n, m) z - mu (the GP-part observations).
      respondent_axis: mesh axis name when the respondent dimension n is
        sharded (parallel/respondents.py). The grid-side prior draws
        (zc, z_n) use the REPLICATED key — every shard must hold the same
        grid randomness so the reassembled f* agrees — while the per-
        respondent noise eps folds the shard index (independent streams);
        the smoother's U^T-contractions complete via psum (lowrank_bsolve).
    Returns (fstar, f).
    """
    H, n, m = z_resid.shape
    N = config.grid_size
    dt = z_resid.dtype
    q = consts.U_se.shape[1]
    idx = state.theta_idx
    k_u, k_e = jax.random.split(key)
    if respondent_axis is not None:
        k_e = jax.random.fold_in(k_e, jax.lax.axis_index(respondent_axis))
    sqrt_t, _ = _temp_scales(temp, dt)
    hi = jax.lax.Precision.HIGHEST

    if config.constant_IRF:
        # ONE shared grid function observed at all H*n sites (the stacked
        # (n*H) GP, reference src/draw-f.cpp:85-125 + src/draw-fstar.cpp:
        # 58-125 semantics, conjugate-ized): the prior draw loses its
        # horizon axis, every horizon's sites gather from the SAME
        # (N, m) nugget/basis draw — sites of different horizons at the
        # same grid point share their latent exactly (the documented
        # grid-path quirk) — and the capacitance pools the basis Gram
        # over horizons: C = T I + sum_h U_h^T U_h.
        return _fstar_conjugate_pooled(k_u, k_e, idx, z_resid, consts,
                                       config, sqrt_t, temp,
                                       respondent_axis)

    # Eigenbasis prior draw + Matheron projection SHARE the basis
    # U_grid = [U_se, Psi], so the whole draw factors through ONE
    # (N, q+3) x (q+3, m) matmul:
    #   u*     = U_grid z_c + sqrt(jitter) z_n          (grid_prior_draw)
    #   f*     = u* + U_grid (U_theta^T alpha)
    #          = U_grid (z_c + U_theta^T alpha) + sqrt(jitter) z_n
    #   u(idx) = U_theta z_c + sqrt(jitter) z_n[idx]
    # vs materializing u* first this deletes two of the three N-sized
    # basis matmuls AND the (H, N, m) u* round trip through HBM (~214 MB
    # per 64-chain sweep) — same values up to float reassociation (the
    # key split mirrors grid_prior_draw, so the bit stream is unchanged).
    k_q, k_p, k_n = jax.random.split(k_u, 3)
    z_q = _normal2d(k_q, (H, q, m), dt)
    z_p = _normal2d(k_p, (H, 3, m), dt)
    z_n = _normal2d(k_n, (H, N, m), dt)
    zc = jnp.concatenate([z_q, z_p], axis=1)  # (H, q+3, m)
    sj = jnp.sqrt(jnp.asarray(config.jitter, dt))
    U_theta = theta_site_basis(idx, consts)  # (H, n, q+3)
    u_theta = (jnp.einsum("hnk,hkm->hnm", U_theta, zc, precision=hi)
               + sj * jnp.take_along_axis(z_n, idx[:, :, None], axis=1))
    eps = _normal2d(k_e, (H, n, m), dt)
    if sqrt_t is not None:
        eps = eps * sqrt_t  # tempered observation noise sd sqrt(T)

    # Push-through identity (same as _fstar_matheron's smoother): with
    # B = T I + U U^T and capacitance C = T I + U^T U,
    #     U^T B^{-1} rhs = C^{-1} U^T rhs        (exactly, any T)
    # and the grid projection only ever needs U^T alpha — so the full
    # n-dimensional B^{-1} solve (lowrank_bsolve: ~25 dependent small ops,
    # measured latency-bound at 0.5 TF/s, RESULTS.md anatomy) and the
    # (H, n, m) alpha materialization are deleted outright: ONE gathered
    # U^T contraction, one (q+3, q+3) equilibrated Cholesky solve with a
    # refinement step, one U_grid matmul. The rank-3 polynomial part
    # factors through the same basis, keeping the bf16-cancellation
    # failure mode out (raw K entries are ~theta^4; basis entries are
    # O(1)); HIGHEST (true f32) precision throughout.
    if H > 1:
        # Multi-session configs keep the round-4 formulation (explicit
        # alpha = B^{-1} rhs via lowrank_bsolve): the push-through program
        # below miscompiles XLA:TPU's kernel at dynamic scale — TPU worker
        # crash at 150x60xH10 / grid 1001 / rbg keys, bisected to this
        # commit's restructure (reproducer scripts/probe_dynamic_crash.py
        # `default`; `threefry`, `grid_f`, `tiny`, and every H=1 shape
        # pass). Same math either way; the push-through's measured wins
        # (RESULTS.md round-5 fstar table) are all at H = 1, so nothing
        # is forfeited by keeping the proven program shape here.
        alpha, _ = lowrank_bsolve(
            idx, consts, z_resid - u_theta - eps, temp=temp,
            psum_axis=respondent_axis,
        )
        ua = jnp.einsum("hnk,hnm->hkm", U_theta, alpha, precision=hi)
        if respondent_axis is not None:
            ua = jax.lax.psum(ua, respondent_axis)
        U_grid = jnp.concatenate([consts.U_se, consts.Psi_grid], axis=-1)
        fstar = (jnp.einsum("ak,hkm->ham", U_grid, zc + ua, precision=hi)
                 + sj * z_n)
        f = jnp.take_along_axis(fstar, idx[:, :, None], axis=1)
        return fstar, f

    t = jnp.asarray(1.0 if temp is None else temp, dt)

    def _rsum(v):
        return v if respondent_axis is None else jax.lax.psum(
            v, respondent_axis)

    g_k = _rsum(jnp.einsum("hnk,hnm->hkm", U_theta,
                           z_resid - u_theta - eps, precision=hi))
    k_dim = U_theta.shape[-1]
    C = t * jnp.eye(k_dim, dtype=dt) + _rsum(jnp.einsum(
        "hnk,hnl->hkl", U_theta, U_theta, precision=hi))
    sc = jnp.sqrt(jnp.diagonal(C, axis1=-2, axis2=-1))  # (H, k)
    inv_sc = 1.0 / sc
    Lc = jnp.linalg.cholesky(C * (inv_sc[..., :, None]
                                  * inv_sc[..., None, :]))

    def c_solve(rhs):  # C^{-1} rhs, equilibrated (f32 robustness)
        w = tri_solve(Lc, rhs * inv_sc[..., None])
        return tri_solve(Lc, w, trans=True) * inv_sc[..., None]

    ua = c_solve(g_k)
    ua = ua + c_solve(g_k - jnp.einsum("hkl,hlm->hkm", C, ua, precision=hi))
    U_grid = jnp.concatenate([consts.U_se, consts.Psi_grid], axis=-1)  # (N, q+3)
    fstar = jnp.einsum("ak,hkm->ham", U_grid, zc + ua, precision=hi) + sj * z_n
    f = jnp.take_along_axis(fstar, idx[:, :, None], axis=1)
    return fstar, f


def draw_beta_conjugate(
    key: jax.Array,
    theta: jnp.ndarray,
    z_minus_f: jnp.ndarray,
    consts: GPIRTConstants,
    config: GPIRTConfig,
    temp=None,
    respondent_axis=None,
) -> jnp.ndarray:
    """Exact Gaussian draw of beta | z, f (conjugate linear regression).

    z - f = X(theta) beta + eps, eps ~ N(0, 1), prior beta ~ N(0,
    diag(sds^2 + 1e-6)) (the sampler's zero-mean prior quirk, kept for
    parity with the ESS block). Per-(horizon, item) 3x3 posterior solves.

    float32 robustness: the regression runs in the STANDARDIZED basis
    Xt = [1, u, u^2] with u = (theta - c)/s (c, s the per-horizon location
    and scale of theta) — an exact change of basis X = Xt T, prior precision
    transformed as T^{-T} D^{-1} T^{-1}, draw mapped back by beta = T^{-1}
    beta_t. The raw [1, theta, theta^2] Gram's condition number grows like
    n * (|c| + s)^4 and a raw (even equilibrated) f32 solve fed O(1)-biased
    betas into mu -> z -> f* runaways once the affine moves let theta visit
    shifted/wide configurations; the standardized Gram is O(n)-conditioned
    at ANY location and scale.
    """
    H, n, m = z_minus_f.shape
    dt = z_minus_f.dtype
    if respondent_axis is None:
        c = jnp.mean(theta, axis=1)  # (H,)
        s = jnp.std(theta, axis=1) + jnp.asarray(1e-3, dt)  # (H,)
    else:
        # global standardization over ALL respondent shards — every shard
        # must agree on (c, s) so the change of basis (and the replicated
        # beta draw below) is identical everywhere
        n_glob = n * jax.lax.psum(1, respondent_axis)
        c = jax.lax.psum(jnp.sum(theta, axis=1), respondent_axis) / n_glob
        var = jax.lax.psum(
            jnp.sum(jnp.square(theta - c[:, None]), axis=1), respondent_axis
        ) / n_glob
        s = jnp.sqrt(var) + jnp.asarray(1e-3, dt)
    u = (theta - c[:, None]) / s[:, None]  # (H, n)
    Xt = jnp.stack([jnp.ones_like(u), u, u * u], axis=-1)  # (H, n, 3)
    # theta = s*u + c, theta^2 = s^2 u^2 + 2sc u + c^2, so X = Xt A with
    # A = [[1, c, c^2], [0, s, 2sc], [0, 0, s^2]]; Minv = A^{-1} (analytic)
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    Minv = jnp.stack([
        jnp.stack([one, -c / s, (c * c) / (s * s)], -1),
        jnp.stack([zero, 1.0 / s, -2 * c / (s * s)], -1),
        jnp.stack([zero, zero, 1.0 / (s * s)], -1),
    ], -2)  # (H, 3, 3) = T^{-1}
    hi = jax.lax.Precision.HIGHEST
    XtX = jnp.einsum("hnp,hnq->hpq", Xt, Xt, precision=hi)  # (H, 3, 3)
    Xtz = jnp.einsum("hnp,hnm->hpm", Xt, z_minus_f, precision=hi)  # (H, 3, m)
    if respondent_axis is not None:
        # the sufficient statistics complete over shards; everything after
        # this point is respondent-free, so the drawn beta (replicated key)
        # is identical on every shard
        XtX = jax.lax.psum(XtX, respondent_axis)
        Xtz = jax.lax.psum(Xtz, respondent_axis)
    if temp is not None:
        inv_t = 1.0 / jnp.asarray(temp, dt)  # noise variance T
        XtX = XtX * inv_t
        Xtz = Xtz * inv_t
    d_inv = 1.0 / (jnp.square(consts.beta_prior_sds) + 1e-6).astype(dt)  # (3, m)
    # prior precision in the standardized basis: M^T diag(d_inv_j) M
    pp = jnp.einsum("hpq,pm,hpr->hmqr", Minv, d_inv, Minv, precision=hi)  # (H, m, 3, 3)
    prec = XtX[:, None] + pp  # (H, m, 3, 3)
    # equilibrate (scale-free factorization) and draw
    sc = jnp.sqrt(jnp.diagonal(prec, axis1=-2, axis2=-1))  # (H, m, 3)
    inv_sc = 1.0 / sc
    Cm = prec * (inv_sc[..., :, None] * inv_sc[..., None, :])
    Lc = chol3(Cm)  # closed-form: 27k tiny LAPACK factorizations lower as
    # pure-latency loops on TPU; the scalar recurrence is elementwise VPU work
    rhs = jnp.swapaxes(Xtz, 1, 2) * inv_sc  # (H, m, 3)
    w = tri3_solve(Lc, rhs[..., None])
    mean = tri3_solve(Lc, w, trans=True)[..., 0] * inv_sc  # (H, m, 3)
    zeta = jax.random.normal(key, (H, m, 3), dt)
    samp = tri3_solve(Lc, zeta[..., None], trans=True)[..., 0] * inv_sc
    beta_t = mean + samp  # (H, m, 3) in the standardized basis
    beta = jnp.einsum("hpq,hmq->hmp", Minv, beta_t)  # back to [1, theta, theta^2]
    return jnp.swapaxes(beta, 1, 2)  # (H, 3, m)


# ---------------------------------------------------------------------------
# Woodbury solves against B = K(theta) + I  (conjugate path)
# ---------------------------------------------------------------------------


_HI = jax.lax.Precision.HIGHEST

# Replication-correctness note for the sharded sweeps (items / respondents):
# the design keeps per-item (resp. per-respondent) state REPLICATED and
# re-derives it on every shard from psum'd statistics, so it relies on
# ``psum`` returning BITWISE-identical results to every participant — a
# compare-based draw (an ESS accept, a Gumbel argmax) sitting on an ulp edge
# would otherwise fork the "replicated" state permanently. XLA's all-reduce
# performs one logical reduction and broadcasts it; the property is verified
# on the test backend by tests/test_respondents.py::test_psum_rank_consistent
# (a canary — if a backend ever violates it, swap the decision-feeding psums
# for all_gather + a fixed-order local sum, which is consistent by
# construction at ~P/2 x the collective bytes).


class WoodburyB(NamedTuple):
    """Factorization of B = K(theta) + I via the exact rank-3 kernel split
    K = K_SE + Psi Psi^T (see make_constants): B = A + Psi Psi^T with
    A = K_SE + I, so B^{-1} = A^{-1} - A^{-1} Psi C3^{-1} Psi^T A^{-1} and
    logdet B = logdet A + logdet C3, C3 = I3 + Psi^T A^{-1} Psi.

    cond(A) <= n + 1 for ANY theta configuration (K_SE has unit diagonal),
    which keeps every conjugate-path solve float32-accurate — a direct
    K + I factorization carries the polynomial kernel terms' ~theta^4
    diagonal and loses float32 past moderate n or wide theta (the round-1
    auto rule had to abandon the conjugate sampler at n > 500 over this).

    TPU numerics: default matmul precision is bfloat16, including inside the
    triangular-solve lowering (measured: 1e-3 relative solve error, which the
    ~theta^4 kernel entries amplify 25x past the signal). Every solve here
    therefore takes ONE iterative-refinement step against A at HIGHEST (true
    f32) precision — cond(A) <= n + 1 makes a single step fully
    f32-accurate — and every small contraction runs at HIGHEST outright.
    """

    La: jnp.ndarray       # (H, n, n) chol(A), A = K_SE + I
    A: jnp.ndarray        # (H, n, n) kept for refinement residuals
    Psi: jnp.ndarray      # (H, n, 3)
    AinvPsi: jnp.ndarray  # (H, n, 3) refined A^{-1} Psi
    C3: jnp.ndarray       # (H, 3, 3) I3 + Psi^T A^{-1} Psi
    Lc3: jnp.ndarray      # (H, 3, 3) chol(C3)
    logdet: jnp.ndarray   # (H,) logdet B per horizon


def _a_solve(La, A, r):
    """A^{-1} r via Cholesky solves + one f32 refinement step."""
    x = tri_solve(La, tri_solve(La, r), trans=True)
    res = r - jnp.einsum("hij,hjm->him", A, x, precision=_HI)
    return x + tri_solve(La, tri_solve(La, res), trans=True)


def _c3_solve(Lc3, C3, u):
    """C3^{-1} u (batched 3x3) with one f32 refinement step.

    Closed-form 3x3 substitutions (ops.linalg.tri3_solve) — elementwise over
    any leading batch shape, so the shift orbit's (J, H, 3, m) solves are one
    fused VPU op instead of J*H tiny LAPACK calls.
    """
    v = tri3_solve(Lc3, tri3_solve(Lc3, u), trans=True)
    res = u - jnp.einsum("...pq,...qm->...pm", C3, v, precision=_HI)
    return v + tri3_solve(Lc3, tri3_solve(Lc3, res), trans=True)


def woodbury_factors(
    theta_idx: jnp.ndarray, consts: GPIRTConstants, temp=None
) -> WoodburyB:
    """Factors of B = K(theta) + T I (T = 1 unless tempered)."""
    H, n = theta_idx.shape
    dt = consts.grid.dtype
    A = consts.grid_gram_se[theta_idx[:, :, None], theta_idx[:, None, :]]
    eye = jnp.eye(n, dtype=dt)
    A = A + (eye if temp is None else jnp.asarray(temp, dt) * eye)
    La = jnp.linalg.cholesky(A)
    Psi = consts.Psi_grid[theta_idx]  # (H, n, 3)
    AinvPsi = _a_solve(La, A, Psi)  # (H, n, 3)
    C3 = jnp.eye(3, dtype=dt) + jnp.einsum(
        "hnp,hnq->hpq", Psi, AinvPsi, precision=_HI
    )
    Lc3 = chol3(C3)
    logdet = 2.0 * (
        jnp.sum(jnp.log(jnp.diagonal(La, axis1=-2, axis2=-1)), axis=-1)
        + jnp.sum(jnp.log(jnp.diagonal(Lc3, axis1=-2, axis2=-1)), axis=-1)
    )
    return WoodburyB(La=La, A=A, Psi=Psi, AinvPsi=AinvPsi, C3=C3, Lc3=Lc3,
                     logdet=logdet)


def lowrank_bsolve(theta_idx: jnp.ndarray, consts: GPIRTConstants,
                   r: jnp.ndarray, temp=None, psum_axis=None):
    """(B^{-1} r, logdet B) for B = K(theta) + T I with NO (n, n) work.

    The ICC kernel splits exactly as K = K_SE + Psi Psi^T, and the smooth SE
    part's grid Gram has numerical rank ~26 (eigendecomposed once at setup,
    consts.U_se, truncation ~1e-10 relative) — so
        B = T I + U U^T,   U = [U_se, Psi][theta_idx]  (n, q+3),
    and B^{-1} r = (r - U C^{-1} U^T r)/T with the (q+3, q+3) capacitance
    C = T I + U^T U. Everything is a gather + small matmuls + one tiny
    batched Cholesky: the (n, n) gather/Cholesky/triangular-solve chain this
    replaces measured 9.3 ms of a 16 ms sweep at 64 chains (latency-bound,
    not flops-bound — scripts/perf_anatomy.py).

    float32: C is equilibrated before factorization (the Psi columns put
    ~theta^4 on its diagonal) and the solve takes one refinement step
    against C and one against B, all at HIGHEST-precision einsums.

    ``psum_axis``: mesh axis name when the RESPONDENT dimension n is sharded
    (parallel/respondents.py). Each device holds its theta/r rows; every
    U^T-contraction (the capacitance build, U^T rhs, and the refinement
    residual projections) is completed by one psum of a (q+3)-sized
    quantity — the low-rank structure makes the collective O(k·m) floats
    instead of O(n·m), exactly why this axis shards cheaply.
    """
    H, n = theta_idx.shape
    dt = r.dtype
    t = jnp.asarray(1.0 if temp is None else temp, dt)

    def _rsum(v):  # complete a local U^T-contraction over all shards
        return v if psum_axis is None else jax.lax.psum(v, psum_axis)

    U = jnp.concatenate(
        [consts.U_se[theta_idx], consts.Psi_grid[theta_idx]], axis=-1
    )  # (H, n, k)
    k = U.shape[-1]
    C = t * jnp.eye(k, dtype=dt) + _rsum(jnp.einsum(
        "hnk,hnl->hkl", U, U, precision=_HI
    ))
    sc = jnp.sqrt(jnp.diagonal(C, axis1=-2, axis2=-1))  # (H, k)
    inv_sc = 1.0 / sc
    Ceq = C * (inv_sc[..., :, None] * inv_sc[..., None, :])
    Lc = jnp.linalg.cholesky(Ceq)

    def c_solve(rhs):  # C^{-1} rhs with equilibration + one refinement
        def once(b):
            w = tri_solve(Lc, b * inv_sc[..., None])
            return tri_solve(Lc, w, trans=True) * inv_sc[..., None]
        w = once(rhs)
        resid = rhs - jnp.einsum("hkl,hlm->hkm", C, w, precision=_HI)
        return w + once(resid)

    def b_solve(rhs):
        Ur = _rsum(jnp.einsum("hnk,hnm->hkm", U, rhs, precision=_HI))
        return (rhs - jnp.einsum("hnk,hkm->hnm", U, c_solve(Ur),
                                 precision=_HI)) / t

    x = b_solve(r)
    # one refinement step against B itself (B-apply is cheap small matmuls)
    Bx = t * x + jnp.einsum(
        "hnk,hkm->hnm", U,
        _rsum(jnp.einsum("hnk,hnm->hkm", U, x, precision=_HI)), precision=_HI,
    )
    x = x + b_solve(r - Bx)
    n_glob = n if psum_axis is None else n * jax.lax.psum(1, psum_axis)
    logdet = (n_glob - k) * jnp.log(t) + 2.0 * (
        jnp.sum(jnp.log(jnp.diagonal(Lc, axis1=-2, axis2=-1)), axis=-1)
        + jnp.sum(jnp.log(sc), axis=-1)
    )
    return x, logdet


def woodbury_solve(wb: WoodburyB, r: jnp.ndarray) -> jnp.ndarray:
    """B^{-1} r for (H, n, m) right-hand sides."""
    x = _a_solve(wb.La, wb.A, r)  # (H, n, m)
    u = jnp.einsum("hnp,hnm->hpm", wb.Psi, x, precision=_HI)  # (H, 3, m)
    v = _c3_solve(wb.Lc3, wb.C3, u)
    return x - jnp.einsum("hnp,hpm->hnm", wb.AinvPsi, v, precision=_HI)


def woodbury_quad_parts(wb: WoodburyB, r: jnp.ndarray):
    """(p, q) with r^T B^{-1} r = sum(p) - sum(q), both elementwise arrays.

    p = r * (A^{-1} r) has shape (H, n, m); q = u * (C3^{-1} u) with
    u = Psi^T A^{-1} r has shape (H, 3, m). Kept elementwise so MH
    acceptance ratios can difference candidates entry-by-entry (the totals
    are O(n*m) while candidate differences are O(1)).
    """
    x = _a_solve(wb.La, wb.A, r)
    p = r * x
    u = jnp.einsum("hnp,hnm->hpm", wb.Psi, x, precision=_HI)
    v = _c3_solve(wb.Lc3, wb.C3, u)
    return p, u * v


def _lowrank_quad_parts(theta_idx: jnp.ndarray, consts: GPIRTConstants,
                        r: jnp.ndarray, temp=None, psum_axis=None):
    """(p, q, logdet) of B = K(theta) + T I via the rank-(q+3) split, with
    NO (n, n) work: sum(p) - sum(q) = r^T B^{-1} r and logdet = logdet B.

    The low-rank dual of woodbury_quad_parts for mesh-sharded respondents
    (same B = T I + U U^T split as lowrank_bsolve): p = r*r/T has the local
    respondent rows (its global sum needs a psum over ``psum_axis``), while
    q = Ur * C^{-1} Ur / T (H, k, m) is built from psum-COMPLETE
    U^T-contractions, so it is identical on every respondent shard and must
    NOT be psum'd again. Both stay elementwise so MH acceptance ratios can
    difference candidates entry-by-entry (the totals are O(n*m) while
    candidate differences are O(1) — see woodbury_quad_parts).
    """
    H, n = theta_idx.shape
    dt = r.dtype
    t = jnp.asarray(1.0 if temp is None else temp, dt)

    def _rsum(v):
        return v if psum_axis is None else jax.lax.psum(v, psum_axis)

    U = jnp.concatenate(
        [consts.U_se[theta_idx], consts.Psi_grid[theta_idx]], axis=-1
    )  # (H, n, k)
    k = U.shape[-1]
    C = t * jnp.eye(k, dtype=dt) + _rsum(jnp.einsum(
        "hnk,hnl->hkl", U, U, precision=_HI
    ))
    sc = jnp.sqrt(jnp.diagonal(C, axis1=-2, axis2=-1))  # (H, k)
    inv_sc = 1.0 / sc
    Ceq = C * (inv_sc[..., :, None] * inv_sc[..., None, :])
    Lc = jnp.linalg.cholesky(Ceq)

    def c_solve(rhs):  # C^{-1} rhs with equilibration + one refinement
        def once(b):
            w = tri_solve(Lc, b * inv_sc[..., None])
            return tri_solve(Lc, w, trans=True) * inv_sc[..., None]
        w = once(rhs)
        resid = rhs - jnp.einsum("hkl,hlm->hkm", C, w, precision=_HI)
        return w + once(resid)

    Ur = _rsum(jnp.einsum("hnk,hnm->hkm", U, r, precision=_HI))  # (H, k, m)
    p = r * r / t
    q = Ur * c_solve(Ur) / t
    n_glob = n if psum_axis is None else n * jax.lax.psum(1, psum_axis)
    logdet = (n_glob - k) * jnp.log(t) + 2.0 * (
        jnp.sum(jnp.log(jnp.diagonal(Lc, axis1=-2, axis2=-1)), axis=-1)
        + jnp.sum(jnp.log(sc), axis=-1)
    )
    return p, q, logdet


# ---------------------------------------------------------------------------
# collective affine moves (conjugate path)
# ---------------------------------------------------------------------------


def _theta_logprior_total(theta: jnp.ndarray, consts: GPIRTConstants,
                          config: GPIRTConfig) -> jnp.ndarray:
    """Total log-prior of a full theta configuration (H, n), scalar.

    Matches the per-regime priors the grid-Gibbs theta update targets
    (_draw_theta_grid): CST counts each respondent once with variance
    1 + sds^2 (reference src/draw-theta.cpp:158), RDM per (session,
    respondent), GP the time-kernel Gaussian with precision Lambda_time.
    """
    var = 1.0 + jnp.square(consts.theta_prior_sds[0]).astype(theta.dtype)  # (n,)
    regime = config.theta_regime
    if regime == "CST":
        return -0.5 * jnp.sum(jnp.square(theta[0]) / var)
    if regime == "RDM":
        return -0.5 * jnp.sum(jnp.square(theta) / var[None, :])
    lam = consts.Lambda_time.astype(theta.dtype)  # (H, H)
    return -0.5 * jnp.einsum("hi,hg,gi->", theta, lam, theta)


def _z_marginal_parts(
    theta_idx: jnp.ndarray,
    z: jnp.ndarray,
    beta: jnp.ndarray,
    consts: GPIRTConstants,
    config: GPIRTConfig,
    temp=None,
    item_axis=None,
    respondent_axis=None,
):
    """Pieces of log p(theta) + log p(z | theta, beta), GP f* marginalized.

    Under the Albert-Chib augmentation the complete-data latents are
    z = f(theta) + mu(theta) + eps with unit noise, so integrating f over its
    GP prior gives z_.j ~ N(mu_j(theta), K_theta + I) — one shared (n, n)
    factor across all m items per horizon (the same B the conjugate f* draw
    solves against).

    Returns (p, q, small): the Woodbury quadratic-form pieces (see
    woodbury_quad_parts; quad = sum(p) - sum(q)) and
    ``small = -0.5*m*logdet(B) + logprior``, the O(n)-sized remainder.
    The caller forms acceptance ratios from the ELEMENTWISE differences:
    the total quadratic form is O(n*m) ~ 1e5 while candidate differences are
    O(1), which a float32 subtraction of totals would cancel away;
    elementwise differencing keeps the error ~ sqrt(n*m)*eps.

    Mesh sharding (match _z_marginal_delta's axes): under ``item_axis`` the
    item dimension m of z/beta is device-local — p and q carry local item
    columns (summed+psum'd by the delta) and ``small`` uses the GLOBAL item
    count against the logdet. Under ``respondent_axis`` the dense (n, n)
    Woodbury factorization is replaced by the rank-(q+3) capacitance path
    (_lowrank_quad_parts): p holds the local respondent rows, q is built
    from psum-complete contractions (identical on every shard), and the
    theta log-prior is psum-completed here so ``small`` is replicated.
    """
    H, n, m = z.shape
    theta = theta_from_indices(theta_idx, consts)
    mu = compute_mu(theta, beta)
    m_glob = m if item_axis is None else m * jax.lax.psum(1, item_axis)
    if respondent_axis is None:
        wb = woodbury_factors(theta_idx, consts, temp=temp)
        p, q = woodbury_quad_parts(wb, z - mu)
        logdet = wb.logdet
    else:
        p, q, logdet = _lowrank_quad_parts(
            theta_idx, consts, z - mu, temp=temp, psum_axis=respondent_axis
        )
    lp = _theta_logprior_total(theta, consts, config)
    if respondent_axis is not None:
        lp = jax.lax.psum(lp, respondent_axis)
    small = -0.5 * m_glob * jnp.sum(logdet) + lp
    return p, q, small


def _z_marginal_delta(parts_new, parts_old, item_axis=None,
                      respondent_axis=None) -> jnp.ndarray:
    """log-posterior difference new - old from _z_marginal_parts pieces.

    Axis discipline (the dual of _z_marginal_parts): p rows are
    respondent-local AND item-local (psum over both axes); q columns are
    item-local but already respondent-complete (psum over the item axis
    only); ``small`` is replicated. The result is identical on every shard,
    so a replicated-key MH decision stays consistent across the mesh.
    """
    p_n, q_n, s_n = parts_new
    p_o, q_o, s_o = parts_old
    dp = jnp.sum(p_n - p_o)
    dq = jnp.sum(q_n - q_o)
    if respondent_axis is not None:
        dp = jax.lax.psum(dp, respondent_axis)
    if item_axis is not None:
        dp = jax.lax.psum(dp, item_axis)
        dq = jax.lax.psum(dq, item_axis)
    return -0.5 * (dp - dq) + (s_n - s_o)


def _dilation_interval_logq(d: jnp.ndarray, dp: jnp.ndarray, sd: float,
                            respondent_axis=None):
    """log q(idx -> idx') for the dilation proposal idx' = round(cen + a*d).

    The set of dilation factors a = e^l (l ~ N(0, sd^2)) mapping centered
    indices d to dp is the interval intersection over sites of
    {a : a*d_i in [dp_i - 1/2, dp_i + 1/2]}; its proposal probability is an
    exact Gaussian-CDF difference in log-factor space. Sites at the center
    (d_i = 0) are unconstrained; dp_i = 0 with d_i != 0 is unreachable in
    reverse (log q = -inf), which correctly rejects irreversible collapses
    onto the center. float32-safe: bounds clamped inside [1e-30, 1e30].

    Under ``respondent_axis`` the sites (respondents) are device-local, so
    the interval intersection is completed with one pmax/pmin pair —
    every shard then holds the identical global log q.
    """
    from jax.scipy.special import log_ndtr

    safe_d = jnp.where(d == 0, 1.0, d)
    lo_pos = (dp - 0.5) / safe_d
    hi_pos = (dp + 0.5) / safe_d
    lo = jnp.where(d > 0, lo_pos, hi_pos)
    hi = jnp.where(d > 0, hi_pos, lo_pos)
    # d == 0: round(cen + a*0) == cen for every a, so dp == 0 is
    # unconstrained and dp != 0 is unreachable (empty interval)
    reachable = (d != 0) | (dp == 0)
    lo = jnp.where(d == 0, 1e-30, lo)
    hi = jnp.where(d == 0, 1e30, hi)
    hi = jnp.where(reachable, hi, -1.0)  # forces a_hi < a_lo -> -inf
    lo_max, hi_min = jnp.max(lo), jnp.min(hi)
    if respondent_axis is not None:
        lo_max = jax.lax.pmax(lo_max, respondent_axis)
        hi_min = jax.lax.pmin(hi_min, respondent_axis)
    a_lo = jnp.clip(lo_max, 1e-30, 1e30)
    a_hi = jnp.clip(hi_min, 1e-30, 1e30)
    llo = jnp.log(a_lo) / sd
    lhi = jnp.log(a_hi) / sd
    # log(Phi(lhi) - Phi(llo)) stably: logPhi(hi) + log1p(-exp(logPhi(lo)-logPhi(hi)))
    lp_hi = log_ndtr(lhi)
    lp_lo = log_ndtr(llo)
    diff = jnp.where(lp_hi > lp_lo, -jnp.expm1(lp_lo - lp_hi), 0.0)
    logq = lp_hi + jnp.log(jnp.maximum(diff, 1e-30))
    return jnp.where(a_hi > a_lo, logq, -jnp.inf)


def _beta_shift_map(beta: jnp.ndarray, delta) -> jnp.ndarray:
    """T_delta(beta): the unique coefficient map with mu_{beta'}(theta +
    delta) == mu_beta(theta) pointwise. Unit-triangular in (b0, b1, b2), so
    |det dT/dbeta| = 1 — a measure-preserving deterministic MH coupling.
    """
    b0, b1, b2 = beta[:, 0], beta[:, 1], beta[:, 2]
    return jnp.stack(
        [b0 - b1 * delta + b2 * delta * delta, b1 - 2.0 * b2 * delta, b2],
        axis=1,
    )


def _beta_logprior_delta(beta_new, beta_old, consts) -> jnp.ndarray:
    """log p(beta') - log p(beta) under the sampler's N(0, sds^2 + 1e-6)
    prior (the reference's zero-mean ESS-prior quirk, src/draw-beta.cpp:16).
    Computed elementwise-then-summed so float32 keeps the O(1) difference."""
    var = (jnp.square(consts.beta_prior_sds) + 1e-6).astype(beta_new.dtype)
    return -0.5 * jnp.sum(
        (jnp.square(beta_new) - jnp.square(beta_old)) / var[None]
    )


def _shift_orbit_lowrank(idx_jc, r, consts, temp=None, psum_axis=None):
    """Per-offset (q, logdet) of the z-marginal over a shift orbit via the
    rank-(q+3) split — the respondent-sharded dual of the dense orbit math
    in shift_orbit_gibbs. Returns (q, ld), both (J,), psum-complete.

    With B_j = T I + U_j U_j^T (U_j the eigenbasis rows gathered at the
    shifted indices), r^T B_j^{-1} r = (r^T r - Ur_j^T C_j^{-1} Ur_j)/T; the
    r^T r / T term is offset-invariant (r is the orbit-invariant residual)
    and drops from relative log-probabilities, so only q_j = Ur_j^T C_j^{-1}
    Ur_j / T and the full logdet B_j vary. Unlike the dense path there is no
    shared (n, n) factor — but each offset costs only one (k, k) capacitance
    from psum'd U^T-contractions, so the whole orbit is small matmuls.
    """
    dt = r.dtype
    t = jnp.asarray(1.0 if temp is None else temp, dt)
    U_j = jnp.concatenate(
        [consts.U_se[idx_jc], consts.Psi_grid[idx_jc]], axis=-1
    )  # (J, H, n, k)
    k = U_j.shape[-1]

    def _rsum(v):
        return v if psum_axis is None else jax.lax.psum(v, psum_axis)

    C = t * jnp.eye(k, dtype=dt) + _rsum(jnp.einsum(
        "jhnk,jhnl->jhkl", U_j, U_j, precision=_HI
    ))
    Ur = _rsum(jnp.einsum("jhnk,hnm->jhkm", U_j, r, precision=_HI))
    sc = jnp.sqrt(jnp.diagonal(C, axis1=-2, axis2=-1))  # (J, H, k)
    inv_sc = 1.0 / sc
    Ceq = C * (inv_sc[..., :, None] * inv_sc[..., None, :])
    Lc = jnp.linalg.cholesky(Ceq)

    def c_solve(rhs):  # C^{-1} rhs with equilibration + one refinement
        def once(b):
            w = tri_solve(Lc, b * inv_sc[..., None])
            return tri_solve(Lc, w, trans=True) * inv_sc[..., None]
        w = once(rhs)
        resid = rhs - jnp.einsum("...kl,...lm->...km", C, w, precision=_HI)
        return w + once(resid)

    q = jnp.einsum("jhkm,jhkm->j", Ur, c_solve(Ur), precision=_HI) / t
    _, H, n, _ = U_j.shape
    n_glob = n if psum_axis is None else n * jax.lax.psum(1, psum_axis)
    ld = (
        H * (n_glob - k) * jnp.log(t)
        + 2.0 * jnp.sum(jnp.log(jnp.diagonal(Lc, axis1=-2, axis2=-1)),
                        axis=(1, 2))
        + 2.0 * jnp.sum(jnp.log(sc), axis=(1, 2))
    )
    return q, ld


def shift_orbit_gibbs(
    key: jax.Array,
    theta_idx: jnp.ndarray,
    z: jnp.ndarray,
    beta: jnp.ndarray,
    consts: GPIRTConstants,
    config: GPIRTConfig,
    temp=None,
    item_axis=None,
    respondent_axis=None,
):
    """Windowed Gibbs draw of the collective location mode. Returns
    (theta_idx, beta).

    The compensated-shift group G_k(theta, beta) = (theta + k steps,
    T_k beta) (_beta_shift_map; T composes exactly, so the orbit of the
    current state is closed) leaves two quantities of the z-marginal
    EXACTLY invariant: A = K_SE + I (the SE Gram depends only on pairwise
    distances, which a uniform-grid shift preserves) and the residual
    r = z - mu (the compensation keeps mu pointwise invariant). The
    expensive pieces — the (n, n) Cholesky and A^{-1}r — are therefore
    computed ONCE, and every orbit member costs only rank-3 gathers,
    (n, 3)-solves and 3x3 algebra: ~100x cheaper per candidate than a full
    _z_marginal_parts evaluation.

    That makes an (almost-)Gibbs draw over a whole window of shifts
    affordable every sweep: log pi is evaluated on offsets [-2W, 2W], a
    candidate is drawn from the softmax over the centered window [-W, W],
    and the draw is Metropolized with the window-normalizer ratio
    Z(center)/Z(candidate window) — exact for the windowed proposal
    (plain truncation to a state-centered window would bias the draw near
    the window edges). W = config.affine_shift_max.

    Mesh sharding: the caller must pass a REPLICATED key. Under
    ``item_axis`` the per-offset quadratic forms and beta-prior sums are
    psum-completed over the local item columns (the (n, n) orbit math is
    replicated — theta_idx is full-n on every item shard). Under
    ``respondent_axis`` the dense orbit is replaced by the rank-(q+3)
    per-offset capacitance path (_shift_orbit_lowrank) and the theta prior
    and grid-validity checks are completed with psum/pmin/pmax. Either way
    every shard computes the identical logp vector, so the Gumbel pick and
    MH accept agree across the mesh.
    """
    N = config.grid_size
    W = config.affine_shift_max
    dt = z.dtype
    step = 10.0 / (N - 1)
    H, n, m = z.shape
    J = 4 * W + 1
    offs = jnp.arange(-2 * W, 2 * W + 1, dtype=jnp.int32)  # (J,)
    m_glob = m if item_axis is None else m * jax.lax.psum(1, item_axis)

    theta = theta_from_indices(theta_idx, consts)
    mu = compute_mu(theta, beta)
    r = z - mu

    idx_j = theta_idx[None] + offs[:, None, None]  # (J, H, n)
    mn = jnp.min(idx_j, axis=(1, 2))
    mx = jnp.max(idx_j, axis=(1, 2))
    if respondent_axis is not None:
        mn = jax.lax.pmin(mn, respondent_axis)
        mx = jax.lax.pmax(mx, respondent_axis)
    valid = (mn >= 0) & (mx <= N - 1)  # (J,)
    idx_jc = jnp.clip(idx_j, 0, N - 1)

    if respondent_axis is None:
        # orbit-invariant heavy pieces (A = K_SE + T I; T = 1 untempered)
        A = consts.grid_gram_se[theta_idx[:, :, None], theta_idx[:, None, :]]
        eye_n = jnp.eye(n, dtype=dt)
        A = A + (eye_n if temp is None else jnp.asarray(temp, dt) * eye_n)
        La = jnp.linalg.cholesky(A)

        Psi_j = consts.Psi_grid[idx_jc]  # (J, H, n, 3)
        Pfl = jnp.transpose(Psi_j, (1, 2, 0, 3)).reshape(H, n, J * 3)
        # one fused solve for both A^{-1}r and A^{-1}Psi_j (triangular
        # solves on TPU are latency-bound in n; batching the rhs widths is
        # ~free)
        sol = _a_solve(La, A, jnp.concatenate([r, Pfl], axis=-1))
        x, AinvP = sol[..., :m], sol[..., m:]
        u = jnp.einsum("jhnp,hnm->jhpm", Psi_j, x, precision=_HI)  # (J,H,3,m)
        AinvP = AinvP.reshape(H, n, J, 3)
        AinvP = jnp.transpose(AinvP, (2, 0, 1, 3))  # (J, H, n, 3)
        C3 = jnp.eye(3, dtype=dt) + jnp.einsum(
            "jhnp,jhnq->jhpq", Psi_j, AinvP, precision=_HI
        )
        Lc3 = chol3(C3)
        v = _c3_solve(Lc3, C3, u)  # (J, H, 3, m)
        q = jnp.einsum("jhpm,jhpm->j", u, v, precision=_HI)
        # relative logdet over the orbit: logdet B_j = logdet A (invariant,
        # drops in the softmax) + logdet C3_j
        ld = 2.0 * jnp.sum(
            jnp.log(jnp.diagonal(Lc3, axis1=-2, axis2=-1)), axis=(1, 2)
        )  # (J,)
    else:
        q, ld = _shift_orbit_lowrank(idx_jc, r, consts, temp=temp,
                                     psum_axis=respondent_axis)
    if item_axis is not None:
        q = jax.lax.psum(q, item_axis)

    th_j = consts.grid[idx_jc].astype(dt)  # (J, H, n)
    thp = jax.vmap(lambda th: _theta_logprior_total(th, consts, config))(th_j)
    if respondent_axis is not None:
        thp = jax.lax.psum(thp, respondent_axis)
    delta_j = offs.astype(dt) * jnp.asarray(step, dt)  # (J,)
    beta_j = jax.vmap(lambda d: _beta_shift_map(beta, d))(delta_j)  # (J,H,3,m)
    var_b = (jnp.square(consts.beta_prior_sds) + 1e-6).astype(dt)
    bp = -0.5 * jnp.sum(jnp.square(beta_j) / var_b[None, None], axis=(1, 2, 3))
    if item_axis is not None:
        bp = jax.lax.psum(bp, item_axis)

    # relative log pi over the orbit (the invariant sum(p) term drops):
    # -0.5(sum p - q_j) - 0.5 m logdet(B_j) + priors
    logp = 0.5 * q - 0.5 * m_glob * ld + thp + bp
    logp = jnp.where(valid, logp, -jnp.inf)

    k_pick, k_acc = jax.random.split(key)
    center = jax.lax.dynamic_slice_in_dim(logp, W, 2 * W + 1)  # offsets -W..W
    pick = _gumbel_argmax(k_pick, center[None], axis=1)[0]  # 0..2W
    o_star = pick - W
    logZ_s = jax.scipy.special.logsumexp(center)
    rev = jax.lax.dynamic_slice_in_dim(logp, W + o_star, 2 * W + 1)
    logZ_r = jax.scipy.special.logsumexp(rev)
    log_u = jnp.log(jax.random.uniform(k_acc, (), dt))
    acc = log_u < (logZ_s - logZ_r)

    j_star = jnp.where(acc, 2 * W + o_star, 2 * W)
    return (
        jnp.clip(theta_idx + jnp.where(acc, o_star, 0), 0, N - 1),
        beta_j[j_star],
    )


def affine_theta_moves(
    key: jax.Array,
    theta_idx: jnp.ndarray,
    z: jnp.ndarray,
    beta: jnp.ndarray,
    consts: GPIRTConstants,
    config: GPIRTConfig,
    temp=None,
    item_axis=None,
    respondent_axis=None,
):
    """Collective shift/dilation MH moves on (theta, beta). Returns
    (theta_idx, beta).

    The (theta | f*) / (f* | z) blocking leaves global soft modes — the
    location and scale of the theta configuration, against which the
    likelihood is nearly invariant with f and beta compensating — mixing by
    O(1/sqrt(n)) accumulation per sweep (measured tau ~ 2000+ sweeps on
    senate116 while the *standardized* configuration mixes ~13x faster;
    scripts/diag_mixing.py). These moves update all respondents at once
    along exactly those modes, with f* collapsed out through the z-marginal
    (_z_marginal_parts) — a partially collapsed step: z has already consumed
    the old f*, the move targets pi(theta, beta | z, t), and f* is redrawn
    from its exact conditional immediately after (gibbs_sweep order).

      shift:    one windowed Gibbs draw over the compensated-shift orbit
                (theta + k, T_k beta) — see shift_orbit_gibbs. Exactly the
                collective analog of the per-respondent grid-Gibbs theta
                update, and nearly free (the orbit shares the (n, n)
                factorization).
      dilation: idx' = round(cen + a(idx-cen)), log a ~ N(0, dilate_sd^2),
                beta unchanged (the compensating map for dilation has
                Jacobian a^{-3mH}, which concentrates all mass — so the
                scale mode moves uncompensated in small steps). The
                round-to-grid map is corrected by exact interval proposal
                probabilities (_dilation_interval_logq); affine_rounds MH
                rounds per sweep.

    Proposals that leave the grid are rejected. Everything is
    elementwise/batched linear algebra — vmap-safe across chains.

    Mesh sharding (``item_axis`` / ``respondent_axis``): the caller must
    pass a key REPLICATED across the mesh — proposals and accept decisions
    are global scalars, completed from psum'd statistics (see
    shift_orbit_gibbs / _z_marginal_parts), so every shard takes the
    identical transition on its local slice of (theta_idx, beta).
    """
    N = config.grid_size
    cen = (N - 1) / 2.0
    sd = config.affine_dilate_sd
    dt = z.dtype

    k_shift, k_dil = jax.random.split(key)
    if config.affine_shift_max > 0:
        theta_idx, beta = shift_orbit_gibbs(
            k_shift, theta_idx, z, beta, consts, config, temp=temp,
            item_axis=item_axis, respondent_axis=respondent_axis,
        )
    if config.affine_rounds == 0:
        return theta_idx, beta

    parts0 = _z_marginal_parts(theta_idx, z, beta, consts, config, temp=temp,
                               item_axis=item_axis,
                               respondent_axis=respondent_axis)

    def accept(carry_parts, cand_parts, acc):
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(acc, b, a), carry_parts, cand_parts
        )

    def one_round(carry, k):
        idx, parts = carry
        k_d, k_du = jax.random.split(k)

        ell = jax.random.normal(k_d, (), dt) * sd
        a = jnp.exp(ell)
        d = idx.astype(dt) - cen
        idx_d = jnp.round(cen + a * d).astype(jnp.int32)
        mn, mx = jnp.min(idx_d), jnp.max(idx_d)
        if respondent_axis is not None:
            mn = jax.lax.pmin(mn, respondent_axis)
            mx = jax.lax.pmax(mx, respondent_axis)
        ok = (mn >= 0) & (mx <= N - 1)
        idx_d = jnp.clip(idx_d, 0, N - 1)
        dp = idx_d.astype(dt) - cen
        logq_fwd = _dilation_interval_logq(d, dp, sd, respondent_axis)
        logq_rev = _dilation_interval_logq(dp, d, sd, respondent_axis)
        parts_d = _z_marginal_parts(idx_d, z, beta, consts, config, temp=temp,
                                    item_axis=item_axis,
                                    respondent_axis=respondent_axis)
        log_u = jnp.log(jax.random.uniform(k_du, (), dt))
        ratio = (_z_marginal_delta(parts_d, parts, item_axis, respondent_axis)
                 + logq_rev - logq_fwd)
        acc = ok & jnp.isfinite(ratio) & (log_u < ratio)
        idx = jnp.where(acc, idx_d, idx)
        parts = accept(parts, parts_d, acc)
        return (idx, parts), acc

    keys = jax.random.split(k_dil, config.affine_rounds)
    (idx, _), _ = jax.lax.scan(one_round, (theta_idx, parts0), keys)
    return idx, beta


# ---------------------------------------------------------------------------
# block: draw_theta
# ---------------------------------------------------------------------------


def _category_logprobs(
    g: jnp.ndarray, thresholds: jnp.ndarray, C: int, inv_s=None
) -> jnp.ndarray:
    """log P(y = c | g) for every category: (..., m) g -> (..., m, C).

    One Phi evaluation per INTERIOR cutpoint boundary — the t_0 = -inf and
    t_C = +inf endpoints have constant CDF 0/1, so evaluating erf there
    wastes 2 of C+1 transcendental passes (3x for binary data; this
    function dominates draw_theta's table and draw_threshold's ESS rounds).
    ``inv_s = 1/sqrt(T)`` tempers (see ll_terms_from_bounds).
    """
    # interior thresholds (..., m, C-1) broadcast against g (..., m)
    t_int = thresholds[..., 1:C]
    z = t_int - g[..., None]  # (..., m, C-1)
    c = jnp.asarray(0.7071067811865476, g.dtype)
    if inv_s is not None:
        c = c * inv_s
    cdf = 0.5 * (1.0 + jax.lax.erf(z * c))
    shp = cdf.shape[:-1]
    zero = jnp.zeros(shp + (1,), g.dtype)
    one = jnp.ones(shp + (1,), g.dtype)
    cdf = jnp.concatenate([zero, cdf, one], axis=-1)  # (..., m, C+1)
    p = cdf[..., 1:] - cdf[..., :-1]  # (..., m, C)
    return jnp.log(p + jnp.asarray(1e-6, g.dtype))


def _theta_ll_table(
    fstar: jnp.ndarray,
    mu_star: jnp.ndarray,
    y: jnp.ndarray,
    thresholds: jnp.ndarray,
    C: int,
    inv_s=None,
    item_axis=None,
) -> jnp.ndarray:
    """Per-respondent log-likelihood at EVERY grid point: (H, N, n).

    TPU-style trade: instead of lazily re-evaluating observed items inside
    a rejection loop (reference src/draw-theta.cpp:4-24), evaluate all N
    candidate thetas at once. Because the candidate g values depend on
    (grid point, item) but not on the respondent, the table factorizes into
      logprobs[h, k, j, c]  (N*m*(C+1) transcendentals)
      one_hot(y)[h, i, j, c]  (static per run)
    contracted over (j, c) — one MXU matmul of shape (N, m*C) x (m*C, n).
    Missing responses have an all-zero one-hot row and drop out exactly.

    The table then makes every theta ESS round a pure gather — and enables
    the exact grid-Gibbs conditional draw (theta_method="grid").

    ``item_axis``: mesh axis name when the item dimension m is sharded
    across devices (parallel/items.py). The local contraction covers this
    shard's items; the psum completes the sum over all items — the ONE
    collective of the item-sharded sweep (the table is the only place
    items couple across the sweep).
    """
    gstar = fstar + mu_star  # (H, N, m)
    logp = _category_logprobs(gstar, thresholds[:, None], C, inv_s)  # (H, N, m, C)
    onehot = jax.nn.one_hot(y - 1, C, dtype=gstar.dtype)  # (H, n, m, C); y=0 -> zeros
    # HIGHEST: with TPU bf16-default matmuls this (m*C)-deep reduction of
    # O(10)-sized log-probs carries +-1-4 absolute noise, visibly distorting
    # the exact grid-Gibbs conditional; true-f32 passes cost < 1 ms here.
    table = jnp.einsum("hkjc,hijc->hki", logp, onehot,
                       precision=jax.lax.Precision.HIGHEST)
    if item_axis is not None:
        table = jax.lax.psum(table, item_axis)
    return table


def _table_lookup(table: jnp.ndarray, idx_hn: jnp.ndarray) -> jnp.ndarray:
    """table (H, N, n), idx (H, n) -> (H, n) values table[h, idx[h,i], i]."""
    return jnp.take_along_axis(table, idx_hn[:, None, :], axis=1)[:, 0, :]


def _gumbel_argmax(key: jax.Array, logits: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Exact categorical sampling via the Gumbel-max trick (TPU-friendly:
    one fused elementwise + argmax, no CDF scan)."""
    g = -jnp.log(-jnp.log(_uniform2d(key, logits.shape, logits.dtype)))
    return jnp.argmax(logits + g, axis=axis).astype(jnp.int32)


def draw_theta(
    key: jax.Array,
    state: GPIRTState,
    mu_star: jnp.ndarray,
    y: jnp.ndarray,
    consts: GPIRTConstants,
    config: GPIRTConfig,
    temp=None,
    item_axis=None,
) -> jnp.ndarray:
    """Redraw theta on the grid. Returns new theta_idx (H, n).

    Three regimes keyed on the time length-scale (src/draw-theta.cpp:112-236):
    CST (one theta per respondent shared across sessions), RDM (independent
    per session), GP (time-GP prior).

    Two methods:
      * "grid" (default): exact Gibbs draw from the conditional posterior
        restricted to the theta* grid — the brute-force inverse-transform
        update the reference *documents* (vignettes/gpirt-vignette.Rmd:111-112)
        — via the full ll table + Gumbel-max. Mixes strictly better than a
        local ESS walk and costs one fused broadcast-reduce.
      * "ess": the reference *code*'s ESS + grid-snap update
        (src/draw-theta.cpp:26-84, 165-168), kept for parity validation.

    ``item_axis``: items sharded over this mesh axis (the table psum is the
    only collective; ``key`` must be the REPLICATED key so every shard draws
    the identical theta — see gibbs_sweep).
    """
    if config.theta_method == "grid":
        return _draw_theta_grid(key, state, mu_star, y, consts, config, temp,
                                item_axis)
    if temp is not None:
        raise NotImplementedError("tempering needs theta_method='grid'")
    return _draw_theta_ess(key, state, mu_star, y, consts, config, item_axis)


def _draw_theta_grid(key, state, mu_star, y, consts, config, temp=None,
                     item_axis=None) -> jnp.ndarray:
    H, n = state.theta_idx.shape
    dt = state.f.dtype
    N = config.grid_size
    _, inv_s = _temp_scales(temp, dt)
    table = _theta_ll_table(state.fstar, mu_star, y, state.thresholds,
                            config.C, inv_s, item_axis)  # (H,N,n)
    grid = consts.grid  # (N,)
    regime = config.theta_regime

    if regime == "CST":
        var = (1.0 + jnp.square(consts.theta_prior_sds[0])).astype(dt)  # (n,)
        logprior = -0.5 * jnp.square(grid[None, :]) / var[:, None]  # (n, N)
        logits = jnp.sum(table, axis=0).T + logprior  # (n, N)
        idx = _gumbel_argmax(key, logits, axis=1)  # (n,)
        return jnp.broadcast_to(idx[None, :], (H, n))

    if regime == "RDM":
        var = (1.0 + jnp.square(consts.theta_prior_sds[0])).astype(dt)  # (n,)
        logprior = -0.5 * jnp.square(grid[None, None, :]) / var[None, :, None]
        logits = jnp.swapaxes(table, 1, 2) + logprior  # (H, n, N)
        return _gumbel_argmax(key, logits, axis=2)  # (H, n)

    # GP regime: sequential Gibbs over sessions; the likelihood factorizes
    # over h, so each session's conditional is (ll table row) + (Gaussian
    # prior conditional from the time-kernel precision Lambda).
    Lam = consts.Lambda_time  # (H, H)
    theta = theta_from_indices(state.theta_idx, consts)  # (H, n)

    # Gumbel noise for all H session draws up front (bit-identical to
    # drawing inside the scan: session h uses split(key, H)[h] either way)
    # — one batched RNG call instead of H scan-carried ones. Hoisting is
    # also load-bearing: with the rbg PRNG, RngBitGenerator ops inside
    # this scan miscompile on TPU when the sweep's ll output is dead-code
    # -eliminated (the burn-phase advance program) — the worker dies with
    # a kernel fault. Reproduced/verified by scripts/probe_dynamic_crash.py.
    keys = jax.random.split(key, H)
    gumbel = -jnp.log(-jnp.log(jax.vmap(
        lambda k: _uniform2d(k, (n, N), dt)
    )(keys)))  # (H, n, N)

    def step(theta, inputs):
        h, g = inputs
        lam_row = Lam[h]  # (H,)
        lam_hh = lam_row[h]
        # conditional mean: -1/Lam_hh * sum_{h' != h} Lam_{h,h'} theta_{h'}
        cross = lam_row @ theta - lam_hh * theta[h]  # (n,)
        mean = -cross / lam_hh
        var = 1.0 / lam_hh
        logprior = -0.5 * jnp.square(grid[None, :] - mean[:, None]) / var  # (n,N)
        logits = table[h].T + logprior  # (n, N)
        idx = jnp.argmax(logits + g, axis=1).astype(jnp.int32)  # (n,)
        theta = theta.at[h].set(grid[idx])
        return theta, idx

    theta, idxs = jax.lax.scan(step, theta, (jnp.arange(H), gumbel))
    return idxs  # (H, n) in scan order == session order


def _draw_theta_ess(key, state, mu_star, y, consts, config,
                    item_axis=None) -> jnp.ndarray:
    H, n = state.theta_idx.shape
    dt = state.f.dtype
    table = _theta_ll_table(state.fstar, mu_star, y, state.thresholds,
                            config.C, item_axis=item_axis)  # (H,N,n)
    theta = theta_from_indices(state.theta_idx, consts)  # (H, n)
    clamp = lambda v: jnp.clip(v, THETA_LO, THETA_HI)
    k_nu, k_ess = jax.random.split(key)
    regime = config.theta_regime

    def ll_nH(theta_nH):  # (n, H) -> (n,)
        idx = snap_indices(theta_nH, config)  # (n, H)
        return jnp.sum(_table_lookup(table, idx.T), axis=0)

    if regime == "CST":
        # prior sd_i = sqrt(1 + theta_prior_sds[0,i]^2)  (src/draw-theta.cpp:158)
        sd = jnp.sqrt(1.0 + jnp.square(consts.theta_prior_sds[0])).astype(dt)  # (n,)
        x = theta[0][:, None]  # (n, 1)
        nu = jax.random.normal(k_nu, (n, 1), dt) * sd[:, None]

        def loglik(xt):  # (n, 1) -> (n,)
            return ll_nH(jnp.broadcast_to(xt, (n, H)))

        x_new = ess_update(
            k_ess, x, nu, loglik, transform=clamp, max_rounds=config.ess_max_rounds
        )
        idx = snap_indices(x_new[:, 0], config)  # (n,)
        return jnp.broadcast_to(idx[None, :], (H, n))

    if regime == "RDM":
        sd = jnp.sqrt(1.0 + jnp.square(consts.theta_prior_sds[0])).astype(dt)  # (n,)
        x = theta.T.reshape(n * H, 1)
        nu = (jax.random.normal(k_nu, (n, H), dt) * sd[:, None]).reshape(n * H, 1)

        def loglik(xt):  # (n*H, 1) -> (n*H,)
            idx = snap_indices(xt.reshape(n, H), config)
            return _table_lookup(table, idx.T).T.reshape(n * H)

        x_new = ess_update(
            k_ess, x, nu, loglik, transform=clamp, max_rounds=config.ess_max_rounds
        )
        return snap_indices(x_new.reshape(n, H).T, config)

    # GP regime: prior N(0, L_time L_time^T) over sessions, shared factor
    x = theta.T  # (n, H)
    z = jax.random.normal(k_nu, (n, H), dt)
    nu = z @ consts.L_time.T
    x_new = ess_update(
        k_ess, x, nu, ll_nH, transform=clamp, max_rounds=config.ess_max_rounds
    )
    return snap_indices(x_new.T, config)


# ---------------------------------------------------------------------------
# block: draw_beta
# ---------------------------------------------------------------------------


def draw_beta(
    key: jax.Array,
    beta: jnp.ndarray,
    theta: jnp.ndarray,
    f: jnp.ndarray,
    thresholds: jnp.ndarray,
    y: jnp.ndarray,
    consts: GPIRTConstants,
    config: GPIRTConfig,
) -> jnp.ndarray:
    """ESS redraw of the 3 mean coefficients per item per horizon.

    Prior N(0, diag(sds^2 + 1e-6)) — the reference's ESS rotates beta around
    the origin regardless of beta_prior_means (src/draw-beta.cpp:16), a quirk
    we reproduce (default means are zero anyway). Items with zero observations
    keep their current beta (src/draw-beta.cpp:97-99).
    """
    H, _, m = beta.shape
    dt = beta.dtype
    X = build_X(theta)  # (H, n, 3)
    k_nu, k_ess = jax.random.split(key)
    z = jax.random.normal(k_nu, (H, m, 3), dt)
    sd = jnp.sqrt(jnp.square(consts.beta_prior_sds) + 1e-6).astype(dt)  # (3, m)
    nu = z * sd.T[None]  # (H, m, 3)
    x = jnp.swapaxes(beta, 1, 2)  # (H, m, 3)
    z_lo, z_hi, mask = cutpoint_bounds(y, thresholds)

    def loglik(xt):  # (H, m, 3) -> (H, m)
        mu_p = jnp.einsum("hnp,hmp->hnm", X, xt)
        return jnp.sum(ll_terms_from_bounds(f + mu_p, z_lo, z_hi, mask), axis=1)

    x_new = ess_update(k_ess, x, nu, loglik, max_rounds=config.ess_max_rounds)
    has_obs = jnp.any(y > 0, axis=1)  # (H, m)
    x_new = jnp.where(has_obs[..., None], x_new, x)
    return jnp.swapaxes(x_new, 1, 2)


# ---------------------------------------------------------------------------
# block: draw_threshold
# ---------------------------------------------------------------------------


def _draw_threshold_binary_newton(key, thresholds, g, y, config, inv_s,
                                  psum_axis=None):
    """Newton-proposal independence MH on the binary cutpoint t_1.

    Targets the SAME y-marginal conditional as the delta-ESS update (prior
    t_1 ~ N(0,1), likelihood sum of log(Phi(s(t_1-g)) + 1e-6) over observed
    cells) — so unlike the collapsed z-box draw it inherits none of the
    z-anchoring pathology (RESULTS.md threshold A/B) — but replaces the
    ~10 bracket-shrink rounds (one fused (H,n,m) erf pass each) with
    ``threshold_mh_tries`` MH tries at ONE pass per try (+1 for the
    initial stats): each pass computes (psi, psi', psi'') of the
    log-concave 1-D conditional in fused form, the proposal is
    N(t + clip(Newton step), -eta^2/psi''), and the reverse-direction
    Newton stats come from the proposal's own pass, so the acceptance
    ratio is exact (proposal-aware independence MH / full-Newton MALA).
    Acceptance is near 1 (the n-cell conditional is close to Gaussian);
    exactness is gated by tests/test_geweke.py::TestGewekeBinaryNewton.
    """
    H, m, Cp1 = thresholds.shape
    dt = thresholds.dtype
    pooled = bool(config.constant_IRF)
    sgn = jnp.where(y == 1, 1.0, -1.0).astype(dt) * (y > 0)  # (H, n, m)
    cscale = jnp.asarray(1.0, dt) if inv_s is None else inv_s.astype(dt)
    inv_sqrt2 = jnp.asarray(0.7071067811865476, dt)
    inv_sqrt2pi = jnp.asarray(0.3989422804014327, dt)
    floor = jnp.asarray(1e-6, dt)
    eta2 = jnp.asarray(1.21, dt)  # proposal-variance inflation 1.1^2
    red_axes = (0, 1) if pooled else (1,)

    def stats(t1):
        """(psi, proposal mean, proposal var) at cutpoint t1 per lane."""
        u = sgn * (t1[..., None, :] - g) * cscale  # (H, n, m) std normal arg
        phi_cdf = 0.5 * (1.0 + jax.lax.erf(u * inv_sqrt2)) + floor
        pdf = inv_sqrt2pi * jnp.exp(-0.5 * u * u)
        r = pdf / phi_cdf
        obs = y > 0
        term = jnp.log(phi_cdf) * obs
        grad_c = sgn * r  # sgn carries the obs mask (0 on missing cells)
        hess_c = (r * (-u - r)) * obs
        data_sums = jnp.stack([
            jnp.sum(term, axis=red_axes),
            jnp.sum(grad_c, axis=red_axes),
            jnp.sum(hess_c, axis=red_axes),
        ])
        if psum_axis is not None:
            # respondent-sharded rows: complete the data sums over shards
            # (the N(0,1) prior terms below are shard-free and added once)
            data_sums = jax.lax.psum(data_sums, psum_axis)
        psi = -0.5 * t1 * t1 + data_sums[0]
        dpsi = -t1 + cscale * data_sums[1]
        d2psi = -1.0 + cscale * cscale * data_sums[2]
        d2psi = jnp.minimum(d2psi, -1.0)  # concave up to the 1e-6 floors
        mean = t1 + jnp.clip(-dpsi / d2psi, -3.0, 3.0)
        var = -eta2 / d2psi
        return psi, mean, var

    def log_q(x, mean, var):
        return -0.5 * (jnp.log(var) + jnp.square(x - mean) / var)

    if pooled:
        t1 = thresholds[0, :, 1]  # (m,) shared cutpoint
    else:
        t1 = thresholds[..., 1]  # (H, m)
    cur = stats(t1)
    for k in range(config.threshold_mh_tries):
        k_z, k_u, key = jax.random.split(jax.random.fold_in(key, k), 3)
        psi0, mean0, var0 = cur
        prop = mean0 + jnp.sqrt(var0) * jax.random.normal(k_z, t1.shape, dt)
        psi1, mean1, var1 = stats(prop)
        log_a = (psi1 - psi0
                 + log_q(t1, mean1, var1) - log_q(prop, mean0, var0))
        acc = jnp.log(jax.random.uniform(k_u, t1.shape, dt)) < log_a
        t1 = jnp.where(acc, prop, t1)
        cur = tuple(jnp.where(acc, new, old)
                    for new, old in zip((psi1, mean1, var1), cur))

    big = jnp.asarray(jnp.inf, dt)
    if pooled:
        thr = jnp.stack([jnp.full_like(t1, -big), t1,
                         jnp.full_like(t1, big)], axis=-1)  # (m, 3)
        return jnp.broadcast_to(thr[None], (H, m, Cp1))
    return jnp.stack([jnp.full_like(t1, -big), t1,
                      jnp.full_like(t1, big)], axis=-1)  # (H, m, 3)


def _draw_threshold_newton_ordinal(key, thresholds, g, y, config, inv_s,
                                   psum_axis=None):
    """Newton-proposal independence MH on the ordinal cutpoint vector.

    The C > 2 generalization of ``_draw_threshold_binary_newton``: targets
    the SAME y-marginal conditional as the delta-ESS update — delta-space
    prior N(0, I) (the reference's parametrization,
    src/draw_threshold.cpp:99-169 via src/log-likelihood.cpp:66-88),
    likelihood sum of log(P(y_ij | t) + 1e-6) — but replaces the ~10
    bracket-shrink rounds with ``threshold_mh_tries`` joint MH tries at
    one fused pass per try. Each pass computes, per item lane:

      * psi(d): the log conditional (one (H, n, m, C-1) erf table);
      * the exact likelihood gradient/Hessian in CUTPOINT space — per
        cell only the category's own two bounds contribute, so grad_t is
        one pdf contraction and H_t is TRIDIAGONAL (diag from each bound,
        one off-diagonal from cells whose lower bound c and upper bound
        c+1 are both interior, i.e. y = c+1);
      * the chain-rule transport to delta space (J lower-triangular with
        exp(delta) columns; the curvature term adds sum_{c>=j} grad_t[c]
        exp(d_j) to the diagonal).

    The proposal is N(d + clip(Newton step), eta^2 (-H_psi)^{-1}) with
    H_psi made strictly negative-definite by a Gershgorin
    diagonal-dominance ridge (proposal-only — psi itself is exact, so the
    acceptance ratio is exact proposal-aware independence MH, same shape
    as the binary kernel). Exactness is gated by
    tests/test_geweke.py::TestGewekeOrdinalNewton.

    ``psum_axis``: respondent-sharded rows complete their data sums via
    one psum per pass (prior terms added once, shard-free).
    """
    H, m, Cp1 = thresholds.shape
    C = Cp1 - 1
    q = C - 1  # interior cutpoints == delta dimension
    dt = thresholds.dtype
    pooled = bool(config.constant_IRF)
    red_axes = (0, 1) if pooled else (1,)
    cscale = jnp.asarray(1.0, dt) if inv_s is None else inv_s.astype(dt)
    inv_sqrt2 = jnp.asarray(0.7071067811865476, dt)
    inv_sqrt2pi = jnp.asarray(0.3989422804014327, dt)
    floor = jnp.asarray(1e-6, dt)
    eta = jnp.asarray(1.1, dt)  # proposal-sd inflation (binary kernel's)
    onehot = jax.nn.one_hot(y - 1, C, dtype=dt)  # (H, n, m, C); y=0 -> 0
    up = onehot[..., :q]   # cell's upper bound is interior cutpoint c
    lo = onehot[..., 1:]   # cell's lower bound is interior cutpoint c

    def stats(d):
        """psi, Newton proposal (mean, chol(-H_psi)) at delta d per lane.

        d: (m, q) pooled or (H, m, q). Returns (psi, mean, L, logdet)
        with lane shapes (m,)/(H, m) + (q,)/(q, q) trailing.
        """
        thr = delta_to_threshold(d)  # (..., m, C+1)
        t_int = thr[..., 1:C]  # (..., m, q)
        b = t_int[..., None, :, :] if pooled else t_int[:, None]
        u = (b - g[..., None]) * cscale  # (H, n, m, q)
        cdf = 0.5 * (1.0 + jax.lax.erf(u * inv_sqrt2))
        pdf = inv_sqrt2pi * jnp.exp(-0.5 * u * u)
        shp = cdf.shape[:-1]
        zero = jnp.zeros(shp + (1,), dt)
        one = jnp.ones(shp + (1,), dt)
        cdf_full = jnp.concatenate([zero, cdf, one], axis=-1)
        p_cat = cdf_full[..., 1:] - cdf_full[..., :-1]  # (H, n, m, C)
        # per-cell interval probability + floor (the exact target's floor)
        hi_p = jax.lax.Precision.HIGHEST
        p_cell = jnp.einsum("hijc,hijc->hij", p_cat, onehot,
                            precision=hi_p) + floor
        obs = y > 0
        term = jnp.log(p_cell) * obs
        # cutpoint-space derivatives: w_c = (up_c - lo_c) pdf_c / p_cell
        sgn_b = up - lo  # (H, n, m, q), 0 on missing cells (one_hot of -1)
        w = sgn_b * pdf / p_cell[..., None]
        grad_c = w  # sum over cells below
        # diagonal: pdf'(u) = -u pdf; (up - lo)^2 = up + lo (disjoint)
        diag_c = (-u * pdf * sgn_b - pdf * pdf * (up + lo)
                  / p_cell[..., None]) / p_cell[..., None]
        # off-diagonal (c, c+1): cells with y = c+1 have lower bound c and
        # upper bound c+1; d^2 log p / dt_c dt_{c+1} = +pdf_c pdf_{c+1}/p^2
        # (p = Phi(u_{c+1}) - Phi(u_c): dp/dt_c = -s pdf_c, so the quotient
        # rule's two minuses cancel)
        off_c = (pdf[..., :-1] * pdf[..., 1:] * lo[..., :-1]
                 / (p_cell[..., None] ** 2)) if q > 1 else None
        sums = [jnp.sum(term, axis=red_axes),
                jnp.sum(grad_c, axis=red_axes),
                jnp.sum(diag_c, axis=red_axes)]
        if q > 1:
            sums.append(jnp.sum(off_c, axis=red_axes))
        if psum_axis is not None:
            sums = [jax.lax.psum(s, psum_axis) for s in sums]
        ll_sum, grad_t, diag_t = sums[0], sums[1], sums[2]
        off_t = sums[3] if q > 1 else None
        grad_t = grad_t * cscale
        diag_t = diag_t * cscale * cscale
        if q > 1:
            off_t = off_t * cscale * cscale

        # delta-space transport: t_c = d_1 + sum_{2<=j<=c} exp(d_j)
        # J[c, j] = 1 (j = 1), exp(d_j) (2 <= j <= c), 0 (j > c)
        ed = jnp.exp(d)  # (..., q)
        col = jnp.where(jnp.arange(q) == 0, jnp.ones((), dt), ed)  # (..., q)
        tri = (jnp.arange(q)[:, None] >= jnp.arange(q)[None, :]).astype(dt)
        J = tri * col[..., None, :]  # (..., q, q)
        grad_d = jnp.einsum("...cj,...c->...j", J, grad_t, precision=hi_p)
        # H_t tridiagonal -> dense (q, q), then J^T H_t J
        Ht = jnp.zeros(diag_t.shape + (q,), dt)
        ii = jnp.arange(q)
        Ht = Ht.at[..., ii, ii].set(diag_t)
        if q > 1:
            jj = jnp.arange(q - 1)
            Ht = Ht.at[..., jj, jj + 1].set(off_t)
            Ht = Ht.at[..., jj + 1, jj].set(off_t)
        Hd = jnp.einsum("...ci,...cd,...dj->...ij", J, Ht, J,
                        precision=hi_p)
        # curvature of the map: d^2 t_c / d d_j^2 = exp(d_j) for j >= 2
        curv = col * jnp.cumsum(grad_t[..., ::-1], axis=-1)[..., ::-1]
        curv = jnp.where(jnp.arange(q) == 0, jnp.zeros((), dt), curv)
        Hd = Hd + jnp.zeros_like(Hd).at[..., ii, ii].set(curv)

        psi = -0.5 * jnp.sum(d * d, axis=-1) + ll_sum
        grad_psi = -d + grad_d
        A = -(Hd - jnp.eye(q, dtype=dt))  # -(H_lik + H_prior)
        # Gershgorin diagonal-dominance ridge: tau >= 0 makes A + tau I
        # strictly PD (proposal-only; psi stays exact)
        offsum = jnp.sum(jnp.abs(A), axis=-1) - jnp.abs(
            jnp.diagonal(A, axis1=-2, axis2=-1))
        tau = jnp.maximum(
            0.0, jnp.max(offsum - jnp.diagonal(A, axis1=-2, axis2=-1)
                         + 1.0, axis=-1))
        A = A + tau[..., None, None] * jnp.eye(q, dtype=dt)
        L = jnp.linalg.cholesky(A)
        # Newton step: A step = grad_psi
        step = jax.scipy.linalg.cho_solve((L, True), grad_psi[..., None])
        mean = d + jnp.clip(step[..., 0], -3.0, 3.0)
        logdet = 2.0 * jnp.sum(
            jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
        return psi, mean, L, logdet

    def log_q(x, mean, L, logdet):
        # N(mean, eta^2 A^{-1}): 0.5 logdet(A) - q log(eta)
        #   - |L^T (x - mean)|^2 / (2 eta^2)
        r = jnp.einsum("...ij,...i->...j", L, x - mean)
        return (0.5 * logdet - q * jnp.log(eta)
                - 0.5 * jnp.sum(r * r, axis=-1) / (eta * eta))

    d0 = threshold_to_delta(thresholds[0] if pooled else thresholds)
    d_cur = d0
    cur = stats(d_cur)
    for k in range(config.threshold_mh_tries):
        k_z, k_u, key = jax.random.split(jax.random.fold_in(key, k), 3)
        psi0, mean0, L0, ld0 = cur
        z = jax.random.normal(k_z, d_cur.shape, dt)
        # prop = mean + eta L^{-T} z  (covariance eta^2 A^{-1})
        prop = mean0 + eta * jax.lax.linalg.triangular_solve(
            L0, z[..., None], left_side=True, lower=True,
            transpose_a=True)[..., 0]
        psi1, mean1, L1, ld1 = stats(prop)
        log_a = (psi1 - psi0
                 + log_q(d_cur, mean1, L1, ld1)
                 - log_q(prop, mean0, L0, ld0))
        acc = jnp.log(jax.random.uniform(k_u, psi0.shape, dt)) < log_a
        accq = acc[..., None]
        d_cur = jnp.where(accq, prop, d_cur)
        cur = (jnp.where(acc, psi1, psi0),
               jnp.where(accq, mean1, mean0),
               jnp.where(accq[..., None], L1, L0),
               jnp.where(acc, ld1, ld0))

    thr_new = delta_to_threshold(d_cur)
    if pooled:
        return jnp.broadcast_to(thr_new[None], (H, m, Cp1))
    return thr_new


def _ess_binary_twophase(key, x, nu, ll_full, ll_rows, *, r1, max_rounds,
                         s_max):
    """One ESS update over flat scalar lanes, later rounds compacted.

    Identical Markov kernel to ``ess_update`` at d = 1 (same slice
    threshold, same bracket-shrink recursion, same bail-at-cap identity) —
    only the COMPUTE is restructured: after ``r1`` full-batch rounds
    (chosen ≈ the p90 accept round, so ~10% of lanes remain), the
    still-active lanes' bracket state is gathered into ``s_max`` compacted
    rows and the remaining rounds evaluate the likelihood only there
    (~L/s_max× cheaper per round). Lanes still active beyond ``s_max``
    capacity keep their state (the standard max-rounds identity bail —
    exact, Geweke-proven at binding caps). NOTE this is a CONTINUATION of
    one update; re-running a fresh ESS only on bailed lanes would NOT be
    invariant (the bail event tilts the conditional).

    Args:
      x, nu: (L,) current state / prior draw per lane.
      ll_full: (L,) -> (L,) log-likelihood for all lanes.
      ll_rows: (idx (S,), vals (S,)) -> (S,) log-likelihood for a lane
        subset.
    """
    L = x.shape[0]
    dt = x.dtype
    k_u, k_eps, k_p1, k_p2 = jax.random.split(key, 4)
    u = jax.random.uniform(k_u, (L,), dtype=dt)
    log_y = ll_full(x) + jnp.log(u)
    eps = jax.random.uniform(k_eps, (L,), dtype=dt, maxval=_TWO_PI)
    lo, hi = eps - _TWO_PI, jnp.full((L,), _TWO_PI, dt)
    active = jnp.ones((L,), bool)

    def body1(carry):
        key, x_out, eps, lo, hi, act, r = carry
        prop = x * jnp.cos(eps) + nu * jnp.sin(eps)
        accept = ll_full(prop) > log_y
        newly = act & accept
        x_out = jnp.where(newly, prop, x_out)
        still = act & ~accept
        lo = jnp.where(still & (eps < 0), eps, lo)
        hi = jnp.where(still & (eps >= 0), eps, hi)
        key, k_r = jax.random.split(key)
        rr = jax.random.uniform(k_r, (L,), dtype=dt)
        eps = jnp.where(still, lo + rr * (hi - lo), eps)
        return key, x_out, eps, lo, hi, still, r + 1

    def cond1(carry):
        return jnp.logical_and(jnp.any(carry[5]), carry[6] < r1)

    _, x1, eps, lo, hi, active, _ = jax.lax.while_loop(
        cond1, body1, (k_p1, x, eps, lo, hi, active, jnp.zeros((), jnp.int32))
    )

    # compact: still-active lanes first (stable argsort of the bail mask)
    idx = jnp.argsort(~active, stable=True)[:s_max]
    act_s = active[idx]
    x_s, nu_s = x[idx], nu[idx]
    ly_s = log_y[idx]
    xo_s, eps_s, lo_s, hi_s = x1[idx], eps[idx], lo[idx], hi[idx]

    def body2(carry):
        key, x_out, eps, lo, hi, act, r = carry
        prop = x_s * jnp.cos(eps) + nu_s * jnp.sin(eps)
        accept = ll_rows(idx, prop) > ly_s
        newly = act & accept
        x_out = jnp.where(newly, prop, x_out)
        still = act & ~accept
        lo = jnp.where(still & (eps < 0), eps, lo)
        hi = jnp.where(still & (eps >= 0), eps, hi)
        key, k_r = jax.random.split(key)
        rr = jax.random.uniform(k_r, (s_max,), dtype=dt)
        eps = jnp.where(still, lo + rr * (hi - lo), eps)
        return key, x_out, eps, lo, hi, still, r + 1

    def cond2(carry):
        return jnp.logical_and(jnp.any(carry[5]),
                               carry[6] < max_rounds - r1)

    _, xo_s, _, _, _, _, _ = jax.lax.while_loop(
        cond2, body2,
        (k_p2, xo_s, eps_s, lo_s, hi_s, act_s, jnp.zeros((), jnp.int32)),
    )
    # scatter: only lanes that were genuinely active (overflow rows keep x1)
    return x1.at[idx].set(jnp.where(act_s, xo_s, x1[idx]))


def draw_threshold_shift(
    key: jax.Array,
    thresholds: jnp.ndarray,
    beta: jnp.ndarray,
    consts: GPIRTConstants,
    config: GPIRTConfig,
):
    """Exact Gibbs draw along the (cutpoints, intercept) likelihood-null
    direction: t_{jc} += delta_j for every cutpoint c AND beta0_j += delta_j.

    The ordinal likelihood depends on (t_c - g) only, and beta0 enters g
    additively for every respondent, so this direction leaves the
    likelihood EXACTLY invariant (at any tempering T — it cancels). The
    conditional over delta is therefore just the prior restricted to the
    line: delta-space prior N(0, 1) on delta_0 = t_1 (gaps exp(delta_c)
    are shift-invariant) x the beta block's N(0, sds0^2 + 1e-6) intercept
    prior — a closed-form 1-D Gaussian per item, loop-free.

    Why it exists: three independent measurements (collapsed draw,
    ESS-round cap, Newton MH — RESULTS.md) showed within-theta mixing
    tracks per-sweep cutpoint movement ~1:1; the cutpoint conditional is
    O(1/sqrt(n))-narrow, so the y-marginal ESS can only creep. This move
    lets (t, beta0) travel the prior-width soft mode in one exact draw —
    the same interweaving idea as the beta-compensated theta shifts.

    Not implemented for constant_IRF (the pooled-cutpoint prior structure
    differs; the sweep skips the move there).

    Returns (thresholds_new, beta_new, delta_h).
    """
    H, m, Cp1 = thresholds.shape
    dt = thresholds.dtype
    b0 = beta[:, 0, :]  # (H, m)
    s0sq = (jnp.square(consts.beta_prior_sds[0]) + 1e-6).astype(dt)  # (m,)
    t1 = thresholds[..., 1]  # (H, m) = delta_0
    prec = 1.0 + 1.0 / s0sq  # (m,) broadcast over H
    mean = -(t1 + b0 / s0sq) / prec  # (H, m)
    delta_h = mean + jax.random.normal(key, mean.shape, dt) / jnp.sqrt(prec)
    # shift every INTERIOR cutpoint; +-inf endpoints absorb the add
    interior = jnp.zeros((Cp1,), bool).at[1:-1].set(True)
    thr_new = jnp.where(interior, thresholds + delta_h[..., None], thresholds)
    beta_new = beta.at[:, 0, :].add(delta_h)
    return thr_new, beta_new, delta_h


def draw_threshold(
    key: jax.Array,
    thresholds: jnp.ndarray,
    f: jnp.ndarray,
    mu: jnp.ndarray,
    y: jnp.ndarray,
    config: GPIRTConfig,
    temp=None,
    psum_axis=None,
) -> jnp.ndarray:
    """ESS redraw of cutpoints in the unconstrained delta parametrization,
    identity-covariance prior (src/draw_threshold.cpp). constant_IRF shares
    one cutpoint vector across horizons (slice 0, copied).

    ``psum_axis``: mesh axis name when the RESPONDENT dimension is sharded
    (parallel/respondents.py). Item lanes are computed redundantly on every
    shard from the REPLICATED ``key``; each likelihood round reduces the
    local respondent rows then psums the (m,)-sized lane totals, so every
    shard takes identical accept decisions and holds identical cutpoints.
    """
    H, m, Cp1 = thresholds.shape
    C = Cp1 - 1
    dt = thresholds.dtype
    _, inv_s = _temp_scales(temp, dt)
    g = f + mu
    k_nu, k_ess = jax.random.split(key)

    def _rsum(v):  # complete a local respondent reduction over all shards
        return v if psum_axis is None else jax.lax.psum(v, psum_axis)

    if C == 2:
        if config.resolved_threshold_method == "newton":
            return _draw_threshold_binary_newton(key, thresholds, g, y,
                                                 config, inv_s, psum_axis)
        # binary fast path: the single interior cutpoint t_1 enters every
        # observed cell as log(Phi(s (t_1 - g)) + 1e-6) with s = +1 for
        # y = 1 and -1 for y = 2 (P(y=2) = 1 - Phi = Phi of the negated
        # argument), so each ESS round is ONE fused
        # erf -> log -> masked-sum pass over (H, n, m) — no (H, n, m, C+1)
        # cdf table, no concat/diff, no one-hot contraction. The y-marginal
        # ESS cutpoint update was the top block of the senate116 sweep
        # (2.56 ms of 6.2 at 64 chains, perf anatomy r3) and its rounds are
        # memory-bound on exactly those intermediates.
        sgn = jnp.where(y == 1, 1.0, -1.0).astype(dt) * (y > 0)  # (H, n, m)
        c = jnp.asarray(0.7071067811865476, dt)
        if inv_s is not None:
            c = c * inv_s
        floor = jnp.asarray(1e-6, dt)

        def _binary_ll(t1, pool_horizons):
            # t1: (H, m) interior cutpoint (or (m,) broadcast when pooled)
            x = sgn * (t1[..., None, :] - g) * c  # (H, n, m)
            term = jnp.log(0.5 * (1.0 + jax.lax.erf(x)) + floor)
            term = term * (y > 0)
            return _rsum(jnp.sum(term, axis=(0, 1)) if pool_horizons
                         else jnp.sum(term, axis=1))

        if config.constant_IRF:
            delta = threshold_to_delta(thresholds[0])  # (m, C-1)
            nu = jax.random.normal(k_nu, delta.shape, dt)
            d_new = ess_update(
                k_ess, delta, nu,
                lambda d: _binary_ll(delta_to_threshold(d)[..., 1], True),
                max_rounds=config.ess_max_rounds)
            return jnp.broadcast_to(delta_to_threshold(d_new)[None],
                                    (H, m, Cp1))
        delta = threshold_to_delta(thresholds)  # (H, m, C-1)
        nu = jax.random.normal(k_nu, delta.shape, dt)
        if (config.resolved_threshold_backend == "pallas"
                and psum_axis is None and temp is None
                and not config.constant_IRF):
            # whole ESS loop in one VMEM-resident kernel: g/sgn/obs stream
            # from HBM once (not once per shrink round) and each 128-lane
            # tile exits at its own max round (ops/pallas_threshold.py)
            from gpirt_tpu.ops.pallas_threshold import (
                binary_threshold_ess_pallas,
            )

            L = H * m
            g_rows = jnp.moveaxis(g, 1, 0).reshape(g.shape[1], L)  # (n, H*m)
            s_rows = jnp.moveaxis(sgn, 1, 0).reshape(g.shape[1], L)
            o_rows = jnp.moveaxis((y > 0), 1, 0).reshape(g.shape[1], L)
            t_new = binary_threshold_ess_pallas(
                k_ess, delta[..., 0].reshape(L), nu[..., 0].reshape(L),
                g_rows, s_rows, o_rows, c,
            )
            return delta_to_threshold(t_new.reshape(H, m)[..., None])
        if config.threshold_ess_twophase:
            # continuation-compacted rounds: the lockstep while_loop costs
            # the MAX accept round over all lanes (~12-17 on senate116)
            # while the mean lane needs 2.9; after r1 = 6 full rounds
            # (~p90) the stragglers continue on an L/4-row gather (the
            # ~10% active lanes overflow this capacity ~never). For
            # binary data delta is the scalar t_1, so endpoints/log-gap
            # transforms drop out of the lane math entirely.
            L = H * m
            s_max = max(min(L, 32), L // 8)
            # (H, m, n) lane-major copies for the compacted rows
            g_rows = jnp.swapaxes(g, -1, -2).reshape(L, -1)
            s_rows = jnp.swapaxes(sgn, -1, -2).reshape(L, -1)
            obs_rows = jnp.swapaxes(y > 0, -1, -2).reshape(L, -1)
            floor_ = floor

            def ll_full(t_flat):
                return _binary_ll(t_flat.reshape(H, m), False).reshape(L)

            def ll_rows(idx, t_s):
                xr = s_rows[idx] * (t_s[:, None] - g_rows[idx]) * c
                term = jnp.log(0.5 * (1.0 + jax.lax.erf(xr)) + floor_)
                return _rsum(jnp.sum(term * obs_rows[idx], axis=1))

            t_new = _ess_binary_twophase(
                k_ess, delta[..., 0].reshape(L), nu[..., 0].reshape(L),
                ll_full, ll_rows, r1=6, max_rounds=config.ess_max_rounds,
                s_max=s_max)
            return delta_to_threshold(t_new.reshape(H, m)[..., None])
        d_new = ess_update(
            k_ess, delta, nu,
            lambda d: _binary_ll(delta_to_threshold(d)[..., 1], False),
            max_rounds=config.ess_max_rounds)
        return delta_to_threshold(d_new)

    if config.resolved_threshold_method == "newton":
        return _draw_threshold_newton_ordinal(key, thresholds, g, y,
                                              config, inv_s, psum_axis)

    # gather-free likelihood: all C category log-probs (categories share
    # cutpoint boundaries, so this costs (C+1) Phi per observation) dotted
    # with the static one-hot of y — no take_along_axis inside the loop
    onehot = jax.nn.one_hot(y - 1, C, dtype=dt)  # (H, n, m, C); y=0 -> zeros

    if config.constant_IRF:
        delta = threshold_to_delta(thresholds[0])  # (m, C-1)
        nu = jax.random.normal(k_nu, delta.shape, dt)

        def loglik(d):  # (m, C-1) -> (m,)
            thr = delta_to_threshold(d)  # (m, C+1)
            logp = _category_logprobs(g, thr[None, None], C, inv_s)  # (H, n, m, C)
            return _rsum(jnp.einsum("hijc,hijc->j", logp, onehot,
                                    precision=jax.lax.Precision.HIGHEST))

        d_new = ess_update(k_ess, delta, nu, loglik, max_rounds=config.ess_max_rounds)
        thr0 = delta_to_threshold(d_new)
        return jnp.broadcast_to(thr0[None], (H, m, Cp1))

    delta = threshold_to_delta(thresholds)  # (H, m, C-1)
    nu = jax.random.normal(k_nu, delta.shape, dt)

    def loglik(d):  # (H, m, C-1) -> (H, m)
        thr = delta_to_threshold(d)  # (H, m, C+1)
        logp = _category_logprobs(g, thr[:, None], C, inv_s)  # (H, n, m, C)
        return _rsum(jnp.einsum("hijc,hijc->hj", logp, onehot,
                                precision=jax.lax.Precision.HIGHEST))

    d_new = ess_update(k_ess, delta, nu, loglik, max_rounds=config.ess_max_rounds)
    return delta_to_threshold(d_new)


def draw_threshold_collapsed(
    key: jax.Array,
    thresholds: jnp.ndarray,
    z: jnp.ndarray,
    y: jnp.ndarray,
    config: GPIRTConfig,
    respondent_axis=None,
) -> jnp.ndarray:
    """Cutpoint update CONDITIONED on the Albert-Chib latents z.

    Given z, the ordinal likelihood collapses to box constraints on the
    interior cutpoints: for c = 1..C-1,

        lo_c = max{z_ij : y_ij = c}  <=  t_c  <  hi_c = min{z_ij : y_ij = c+1}

    (missing cells, y = 0, are unconstrained), so p(t | z, y) is the delta
    prior N(0, I) (src/draw_threshold.cpp:17,109 in the reference's delta
    parametrization, src/log-likelihood.cpp:66-88) restricted to the box —
    no (n, m, C)-sized erf table per rejection round (the y-marginal ESS in
    draw_threshold spends ~26% of the senate116 sweep there).

    The box always contains the current cutpoints: every z was drawn inside
    its cell's CURRENT truncation interval (draw_z_truncnorm), so
    lo_c <= t_c^old < hi_c by construction and the update never starts
    outside its own support.

    C == 2 (binary data): the single interior cutpoint has prior
    t_1 = delta_0 ~ N(0, 1) — the conditional is a truncated normal, drawn
    exactly by inverse-CDF, loop-free. C > 2: ESS on delta with the 0/-inf
    box-indicator likelihood (exact: ESS of a truncated Gaussian), each
    shrink round a length-(C-1) compare per item instead of the erf table.

    Valid at any tempering T: the tempered model's augmentation is
    z ~ N(g, T) with the SAME cutpoint indicator (draw_z_truncnorm), so
    p(t | z, y) does not involve T. constant_IRF shares one cutpoint vector
    across horizons (src/draw_threshold.cpp:181-204): the box pools all
    horizons' constraints.
    """
    from jax.scipy.special import ndtri

    H, m, Cp1 = thresholds.shape
    C = Cp1 - 1
    dt = thresholds.dtype
    big = jnp.asarray(1e30, dt)
    cats = jnp.arange(1, C)[None, None, None, :]  # interior cutpoints 1..C-1
    yb = y[..., None]  # (H, n, m, 1)
    zb = z[..., None].astype(dt)
    lo = jnp.max(jnp.where(yb == cats, zb, -big), axis=1)  # (H, m, C-1)
    hi = jnp.min(jnp.where(yb == cats + 1, zb, big), axis=1)
    if respondent_axis is not None:
        # the z order-statistic box pools ALL respondents: complete the
        # shard-local extrema over the respondent mesh axis (the draw below
        # then uses the replicated key, so every shard holds identical t)
        lo = jax.lax.pmax(lo, respondent_axis)
        hi = jax.lax.pmin(hi, respondent_axis)
    if config.constant_IRF:
        lo = jnp.max(lo, axis=0)  # pool horizons: (m, C-1)
        hi = jnp.min(hi, axis=0)

    if C == 2:
        # exact inverse-CDF truncated-normal draw of t_1 ~ N(0, 1) | box
        c = jnp.asarray(0.7071067811865476, dt)
        cdf_lo = 0.5 * (1.0 + jax.lax.erf(lo * c))
        cdf_hi = 0.5 * (1.0 + jax.lax.erf(hi * c))
        u = jax.random.uniform(key, lo.shape, dt)
        eps = jnp.asarray(1e-6, dt)
        p = jnp.clip(cdf_lo + u * (cdf_hi - cdf_lo), eps, 1.0 - eps)
        t1 = ndtri(p).astype(dt)
        # far-tail saturated CDFs can land outside the box — clamp back
        # (the +-1e30 unconstrained fills never bind)
        t1 = jnp.clip(t1, lo, hi)
        ninf = jnp.full_like(t1, -jnp.inf)
        pinf = jnp.full_like(t1, jnp.inf)
        thr = jnp.concatenate([ninf, t1, pinf], axis=-1)  # (..., 3)
        if config.constant_IRF:
            thr = jnp.broadcast_to(thr[None], (H, m, Cp1))
        return thr

    # C > 2: ESS on delta against the box indicator (exact truncated-
    # Gaussian sampling; the current state is always inside, see above)
    k_nu, k_ess = jax.random.split(key)
    if config.constant_IRF:
        delta = threshold_to_delta(thresholds[0])  # (m, C-1)
        nu = jax.random.normal(k_nu, delta.shape, dt)

        def loglik(d):  # (m, C-1) -> (m,)
            t_int = delta_to_threshold(d)[..., 1:C]
            ok = jnp.all((t_int >= lo) & (t_int < hi), axis=-1)
            return jnp.where(ok, 0.0, -jnp.inf)

        d_new = ess_update(k_ess, delta, nu, loglik,
                           max_rounds=config.ess_max_rounds)
        return jnp.broadcast_to(delta_to_threshold(d_new)[None], (H, m, Cp1))

    delta = threshold_to_delta(thresholds)  # (H, m, C-1)
    nu = jax.random.normal(k_nu, delta.shape, dt)

    def loglik(d):  # (H, m, C-1) -> (H, m)
        t_int = delta_to_threshold(d)[..., 1:C]
        ok = jnp.all((t_int >= lo) & (t_int < hi), axis=-1)
        return jnp.where(ok, 0.0, -jnp.inf)

    d_new = ess_update(k_ess, delta, nu, loglik,
                       max_rounds=config.ess_max_rounds)
    return delta_to_threshold(d_new)


# ---------------------------------------------------------------------------
# initialization and the full sweep
# ---------------------------------------------------------------------------


def init_state(
    key: jax.Array,
    theta_init: jnp.ndarray,
    thresholds_init: jnp.ndarray,
    y: jnp.ndarray,
    consts: GPIRTConstants,
    config: GPIRTConfig,
    item_axis=None,
) -> GPIRTState:
    """Draw initial f and beta from their priors (src/gpirtMCMC.cpp:148-227).

    theta_init is snapped to the grid up front — the reference keeps the
    (clamped) continuous init for exactly one iteration before the first snap;
    with a 0.01-step grid this is a sub-MC-error difference we take for the
    gather-everything design. Deliberate divergence, documented in SURVEY 7.3.

    ``item_axis``: items sharded over this mesh axis — every init draw is
    per-item, so the whole init is local given a per-shard folded key.
    """
    H, n, m = y.shape
    dt = config.jdtype
    theta_idx = snap_indices(jnp.asarray(theta_init, dt), config)  # (H, n)
    if item_axis is not None:
        key = jax.random.fold_in(key, jax.lax.axis_index(item_axis))
    k_beta, k_f, k_fstar = jax.random.split(key, 3)

    if config.resolved_f_method in ("grid", "conjugate"):
        # grid-native init: f* ~ GP prior on the grid (precomputed factor),
        # f = its rows at theta — no n x n factorization even at startup.
        if config.constant_IRF:
            z_b = jax.random.normal(k_beta, (1, 3, m), dt)
            beta = jnp.broadcast_to(
                consts.beta_prior_means + z_b * consts.beta_prior_sds, (H, 3, m)
            )
            z = jax.random.normal(k_f, (config.grid_size, m), dt)
            fstar = jnp.broadcast_to(
                (consts.L_grid @ z)[None], (H, config.grid_size, m)
            )
        else:
            z_b = jax.random.normal(k_beta, (H, 3, m), dt)
            beta = consts.beta_prior_means[None] + z_b * consts.beta_prior_sds[None]
            z = jax.random.normal(k_f, (H, config.grid_size, m), dt)
            fstar = jnp.einsum("ab,hbm->ham", consts.L_grid, z)
        f = jnp.take_along_axis(fstar, theta_idx[:, :, None], axis=1)
        return GPIRTState(
            theta_idx=theta_idx,
            f=f,
            beta=beta,
            thresholds=jnp.asarray(thresholds_init, dt),
            fstar=fstar,
        )

    if config.constant_IRF:
        z_b = jax.random.normal(k_beta, (1, 3, m), dt)
        beta = consts.beta_prior_means + z_b * consts.beta_prior_sds
        beta = jnp.broadcast_to(beta, (H, 3, m))
        # one GP draw shared across horizons (src/gpirtMCMC.cpp:189-194):
        # the reference draws an n-dim prior sample and tiles it.
        f0 = theta_prior_perturbation(k_f, theta_idx[0], consts, config, m, dt)
        f = jnp.broadcast_to(f0[None], (H, n, m))
    else:
        z_b = jax.random.normal(k_beta, (H, 3, m), dt)
        beta = consts.beta_prior_means[None] + z_b * consts.beta_prior_sds[None]
        f = theta_prior_perturbation(k_f, theta_idx, consts, config, m, dt)

    thresholds = jnp.asarray(thresholds_init, dt)
    state = GPIRTState(
        theta_idx=theta_idx,
        f=f,
        beta=beta,
        thresholds=thresholds,
        fstar=jnp.zeros((H, config.grid_size, m), dt),
    )
    # initial fstar draw before the loop (src/gpirtMCMC.cpp:227)
    fstar = draw_fstar(k_fstar, f, theta_idx, consts, config)
    return state._replace(fstar=fstar)


def gibbs_sweep(
    state: GPIRTState,
    key: jax.Array,
    y: jnp.ndarray,
    consts: GPIRTConstants,
    config: GPIRTConfig,
    temp=None,
    iteration=None,
    item_axis=None,
    respondent_axis=None,
) -> Tuple[GPIRTState, jnp.ndarray]:
    """One full Gibbs iteration. Returns (new_state, total log-likelihood).

    Order matches src/gpirtMCMC.cpp:261-331:
      f | theta, beta, t  ->  f* | f  ->  theta | f*  ->  f := f*(theta)
      ->  beta | f, theta  ->  t | f, mu  ->  ll.
    The theta Cholesky is computed once per sweep (the reference computes it
    twice, src/draw-f.cpp:59 + src/gpirtMCMC.cpp:314).

    ``temp`` (None = 1) tempers the observation noise to sd sqrt(T) — the
    likelihood family behind parallel tempering (parallel/tempering.py);
    supported on the conjugate path only. The returned ll is the lane's OWN
    tempered log-likelihood (its convergence trace).

    ``iteration`` (absolute sweep index, traced or static; None = 0) only
    matters under threshold_method="interleave", where it selects which
    sweeps run the y-marginal ESS cutpoint update (i % threshold_ess_every
    == 0) vs the collapsed draw. It deliberately does NOT enter the key
    schedule — callers already fold the iteration into ``key``.

    ``item_axis``: mesh axis name when the ITEM dimension m is sharded
    across devices under shard_map (parallel/items.py — the TPU-native
    mapping of the reference's OpenMP-over-items fan-out,
    src/draw-f.cpp:67-69 etc., onto ICI). Per-item state (f, fstar, beta,
    thresholds, z) and every per-item block stay device-local; the sweep's
    only collectives are the theta-table psum and the ll-trace psum.
    Key discipline: item-local blocks fold this shard's axis_index into
    their keys (independent streams per shard); the theta draw uses the
    REPLICATED key so every shard samples the identical theta from the
    identical psum'd table. Conjugate path only.

    ``respondent_axis``: mesh axis name when the RESPONDENT dimension n is
    sharded (parallel/respondents.py — the dual axis: per-respondent state
    theta_idx/f/z and the theta-table columns stay device-local; the per-
    item arrays beta/thresholds/fstar are replicated, their draws completed
    by psums of (q+3)- or m-sized sufficient statistics). Key discipline is
    the dual of item sharding: the theta/z/eps draws (respondent-local)
    fold the shard index; the grid prior draws, beta noise and cutpoint
    update use the replicated key on psum'd statistics so every shard holds
    identical beta/thresholds/fstar. Composes with ``item_axis`` as a 3-D
    (chains x items x respondents) mesh: the two collectives sets are
    disjoint (theta table over items; sufficient stats over respondents).
    Conjugate path only.
    """
    if temp is not None and config.resolved_f_method != "conjugate":
        raise NotImplementedError(
            "tempering is implemented for f_method='conjugate' only"
        )
    if item_axis is not None or respondent_axis is not None:
        which = "item" if item_axis is not None else "respondent"
        if config.resolved_f_method != "conjugate":
            raise NotImplementedError(
                f"{which}-sharded sweeps need f_method='conjugate'"
            )
    k_f, k_fs, k_th, k_b, k_t = jax.random.split(key, 5)
    # the affine moves need a key REPLICATED across any mesh axis (their
    # proposals/accepts are global decisions on psum'd statistics); capture
    # k_f before the per-shard folds below — identical to k_f when unsharded
    k_f_repl = k_f
    if item_axis is not None:
        # independent per-shard streams for the item-local blocks; k_th
        # stays replicated (every shard must draw the same theta)
        shard = jax.lax.axis_index(item_axis)
        k_f = jax.random.fold_in(k_f, shard)
        k_fs = jax.random.fold_in(k_fs, shard)
        k_b = jax.random.fold_in(k_b, shard)
        k_t = jax.random.fold_in(k_t, shard)
    if respondent_axis is not None:
        # the dual: per-respondent draws (theta, z) fold the shard index;
        # k_b / k_t / the fstar grid keys stay as-is (replicated across
        # respondent shards) so the psum-completed blocks draw identically
        rshard = jax.lax.axis_index(respondent_axis)
        k_th = jax.random.fold_in(k_th, rshard)

    mu_star = compute_mu_star(consts, state.beta)

    # Latent block(s), repeated ``mix_subsweeps`` times. Each pass is a valid
    # set of Gibbs updates (the reference does exactly one,
    # src/gpirtMCMC.cpp:270-298); repeating is the cheap mixing lever for
    # theta, whose conditional is sharp and only decorrelates through fresh
    # f* wiggle off the current positions. The Geweke joint-distribution test
    # passes for any count and either f_method.
    if config.resolved_f_method == "conjugate":
        # Albert-Chib augmentation: exact Gaussian latent updates.
        # Valid composite kernel on (theta, f*, beta, t): the theta update
        # marginalizes z (grid conditional); z is then drawn fresh and
        # consumed by the exact f* and beta draws within the same sweep.
        z = None
        _, inv_s = _temp_scales(temp, state.f.dtype)
        for s in range(config.mix_subsweeps):
            theta_idx = draw_theta(
                jax.random.fold_in(k_th, s), state, mu_star, y, consts,
                config, temp, item_axis,
            )
            f = jnp.take_along_axis(state.fstar, theta_idx[:, :, None], axis=1)
            state = state._replace(theta_idx=theta_idx, f=f)
            theta = theta_from_indices(theta_idx, consts)
            mu = compute_mu(theta, state.beta)
            k_z = jax.random.fold_in(k_f, 3 * s)
            if respondent_axis is not None:
                k_z = jax.random.fold_in(k_z, rshard)  # respondent-local draw
            z = draw_z_truncnorm(k_z, f + mu, y, state.thresholds, temp)
            if config.affine_rounds > 0 or config.affine_shift_max > 0:
                # partially collapsed step: z has consumed the old f*; move
                # (theta, beta) collectively against the z-marginal, then
                # regenerate f* from its exact conditional below
                theta_idx, beta_m = affine_theta_moves(
                    jax.random.fold_in(k_f_repl, 3 * s + 1), theta_idx, z,
                    state.beta, consts, config, temp,
                    item_axis=item_axis, respondent_axis=respondent_axis,
                )
                state = state._replace(theta_idx=theta_idx, beta=beta_m)
                theta = theta_from_indices(theta_idx, consts)
                mu = compute_mu(theta, state.beta)
            fstar, f = draw_fstar_conjugate(
                jax.random.fold_in(k_f, 3 * s + 2), state, z - mu, config,
                consts, temp, respondent_axis,
            )
            state = state._replace(fstar=fstar, f=f)
        beta = draw_beta_conjugate(k_b, theta, z - state.f, consts, config,
                                   temp, respondent_axis)
        state = state._replace(beta=beta)

        # cutpoints: the reference's y-marginal ESS (default), the collapsed
        # exact draw given z, or their interleave — then the ll trace
        mu = compute_mu(theta, beta)
        t_method = config.resolved_threshold_method
        if t_method == "collapsed":
            thresholds = draw_threshold_collapsed(
                k_t, state.thresholds, z, y, config, respondent_axis
            )
        elif t_method == "interleave":
            # cyclic kernel: both components leave the target invariant, so
            # any deterministic schedule does too. The periodic y-marginal
            # ESS move lets the cutpoints travel beyond the O(1/n)
            # order-statistic box the collapsed draw anchors them to.
            it = 0 if iteration is None else iteration
            marg_f, marg_mu = state.f, mu
            thresholds = jax.lax.cond(
                (it % config.threshold_ess_every) == 0,
                lambda: draw_threshold(k_t, state.thresholds, marg_f, marg_mu,
                                       y, config, temp, respondent_axis),
                lambda: draw_threshold_collapsed(
                    k_t, state.thresholds, z, y, config, respondent_axis
                ),
            )
        else:
            thresholds = draw_threshold(k_t, state.thresholds, state.f, mu, y,
                                        config, temp, respondent_axis)
        state = state._replace(thresholds=thresholds)
        if config.threshold_shift and not config.constant_IRF:
            thresholds, beta, dlt = draw_threshold_shift(
                jax.random.fold_in(k_t, 1), thresholds, state.beta, consts,
                config,
            )
            state = state._replace(thresholds=thresholds, beta=beta)
            mu = mu + dlt[:, None, :]
        ll = jnp.sum(ordinal_ll_terms(state.f + mu, y, thresholds, inv_s))
        if item_axis is not None:
            ll = jax.lax.psum(ll, item_axis)
        if respondent_axis is not None:
            ll = jax.lax.psum(ll, respondent_axis)
        return state, ll

    if config.resolved_f_method == "grid":
        # grid-native: one ESS on f* replaces draw_f + draw_fstar; no
        # per-iteration Cholesky at any n (see draw_fstar_direct).
        for s in range(config.mix_subsweeps):
            theta = theta_from_indices(state.theta_idx, consts)
            mu = compute_mu(theta, state.beta)
            fstar, f = draw_fstar_direct(
                jax.random.fold_in(k_f, s), state, mu, y, config, consts
            )
            state = state._replace(fstar=fstar, f=f)
            theta_idx = draw_theta(
                jax.random.fold_in(k_th, s), state, mu_star, y, consts, config
            )
            f = jnp.take_along_axis(fstar, theta_idx[:, :, None], axis=1)
            state = state._replace(theta_idx=theta_idx, f=f)
    else:  # "two_stage": the reference pipeline
        theta = theta_from_indices(state.theta_idx, consts)
        mu = compute_mu(theta, state.beta)

        # 1. f (eigenbasis prior perturbations — no per-sweep factorization)
        f = draw_f(k_f, state, mu, y, consts, config)
        state = state._replace(f=f)

        # 2-4. (f* | f) -> (theta | f*) -> f := f*(theta)
        for s in range(config.mix_subsweeps):
            k_fs_s = jax.random.fold_in(k_fs, s)
            k_th_s = jax.random.fold_in(k_th, s)
            fstar = draw_fstar(k_fs_s, state.f, state.theta_idx, consts,
                               config)
            state = state._replace(fstar=fstar)
            theta_idx = draw_theta(k_th_s, state, mu_star, y, consts, config)
            f = jnp.take_along_axis(fstar, theta_idx[:, :, None], axis=1)
            state = state._replace(theta_idx=theta_idx, f=f)

    theta_idx = state.theta_idx
    theta = theta_from_indices(theta_idx, consts)
    f = state.f

    # 5. beta
    beta = draw_beta(k_b, state.beta, theta, f, state.thresholds, y, consts, config)
    state = state._replace(beta=beta)

    # 6. thresholds (with mu from the new theta and new beta)
    mu = compute_mu(theta, beta)
    thresholds = draw_threshold(k_t, state.thresholds, f, mu, y, config)
    state = state._replace(thresholds=thresholds)
    if config.threshold_shift and not config.constant_IRF:
        thresholds, beta2, dlt = draw_threshold_shift(
            jax.random.fold_in(k_t, 1), thresholds, state.beta, consts, config
        )
        state = state._replace(thresholds=thresholds, beta=beta2)
        mu = mu + dlt[:, None, :]

    # 7. total log-likelihood trace
    ll = jnp.sum(ordinal_ll_terms(f + mu, y, thresholds))
    return state, ll
