"""Campaign-replicated posterior estimation: R independent SMC campaigns.

The GP-IRT posterior under wide IRF priors is multi-basin (soft monotone
warp modes of theta; RESULTS.md mixing study). A single run's ensemble —
however many chains — is ONE draw from the basin-placement distribution,
and the round-4 calibration gate measured its consequence directly: the
implied information of a whole campaign is ~1 effective draw, no matter
how the within-run estimator (pooled, rank-normalized, or otherwise)
scores it. The only estimator that pays that variance component is
campaign-level replication: run R fully independent campaigns — each an
SMC annealed initialization (parallel/smc.py) followed by a short sampling
run at the measured pooled-frontier schedule — and charge the
across-campaign variance of the campaign means.

``gpirt_campaigns`` productizes that estimator. All R campaigns anneal in
ONE batched device program (``anneal_init_batched``; campaign b is
bit-compatible with a solo run from the same keys) and sample as one
lane-stacked ensemble, so the whole analysis costs two compiled
gibbs-bearing programs regardless of R. Campaigns shard embarrassingly
parallel over a device mesh (``campaign_axis``).

The reference cannot express this at all: one sequential chain per run
(/root/reference/R/gpirtMCMC.R:112), so its estimates are single-basin
conditioned rather than merely slow.
"""

from __future__ import annotations

import sys
import time
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from gpirt_tpu.models.config import GPIRTConfig, THETA_LO, THETA_HI

__all__ = ["gpirt_campaigns", "campaign_schedule"]


# The measured pooled-frontier schedule (RESULTS.md pooled-basis study +
# calibration gate, round 4): smc 160 / burn 25 / 100 draws, Newton-MH
# cutpoint kernel where available. Shorter anneals claim higher pooled
# numbers but the calibration gate rejected them as under-dispersion
# artifacts; 160 had the best implied-ESS calibration of the ladder.
def campaign_schedule(C: int = 2) -> Dict[str, Any]:
    """The measured-frontier per-campaign schedule (RESULTS.md round 4)."""
    return {
        "n_chains": 64,
        "sample_iterations": 100,
        "burn_iterations": 25,
        "smc_steps": 160,
        "smc_max_temp": 64.0,
        "threshold_method": "newton" if C == 2 else "ess",
    }


def _campaign_estimator(theta, R, K, S, P):
    """Device-side campaign estimator (jit-able).

    theta: (R*K, S, P) draws. Sign-aligns every draw against one global
    centered reference (the theta -> -theta reflection invariance,
    utils/diagnostics.align_theta_signs), then reduces to the small
    summaries the estimator needs — only (R, P)-sized results cross the
    host boundary (fetching the full draw cube over a tunneled TPU costs
    more than the sampling; RESULTS.md measurement-honesty notes).
    Returns (campaign_means (R, P), post_var (P,)).
    """
    x = theta.reshape(R, K, S, P)
    ref = x[0, 0, 0] - jnp.mean(x[0, 0, 0])
    cent = x - jnp.mean(x, axis=3, keepdims=True)
    proj = jnp.einsum("rksp,p->rks", cent, ref)
    sign = jnp.where(proj < 0, -1.0, 1.0)
    xa = x * sign[..., None]
    campaign_means = jnp.mean(xa, axis=(1, 2))
    post_var = jnp.var(xa.reshape(R * K * S, P), axis=0, ddof=1)
    return campaign_means, post_var


def gpirt_campaigns(
    data,
    n_campaigns: int = 8,
    *,
    n_chains: Optional[int] = None,
    sample_iterations: Optional[int] = None,
    burn_iterations: Optional[int] = None,
    smc_steps: Optional[int] = None,
    smc_max_temp: Optional[float] = None,
    threshold_method: Optional[str] = None,
    SEED: int = 1,
    vote_codes=...,
    beta_prior_means: Optional[np.ndarray] = None,
    beta_prior_sds: Optional[np.ndarray] = None,
    theta_prior_means: Optional[np.ndarray] = None,
    theta_prior_sds: Optional[np.ndarray] = None,
    theta_os: float = 1.0,
    theta_ls: float = 10.0,
    KERNEL: str = "Matern",
    thresholds: Optional[np.ndarray] = None,
    dtype: str = "float32",
    grid_size: int = 1001,
    prng_impl: str = "auto",
    jitter: Optional[float] = None,
    store_draws: bool = True,
    mesh: Optional[jax.sharding.Mesh] = None,
    campaign_axis: str = "campaigns",
    chunk_iterations: int = 250,
    verbose: bool = True,
) -> Dict[str, Any]:
    """Posterior estimation by R independent SMC campaigns.

    Runs ``n_campaigns`` fully independent campaigns — campaign r uses
    chain seeds ``SEED + r*K .. SEED + (r+1)*K - 1`` (disjoint streams;
    the per-chain-seed idiom of R/gpirtMCMC.R:114 lifted one level) — each
    at the measured pooled-frontier schedule (``campaign_schedule``;
    override any field via the keyword of the same name), then reports
    campaign-replicated uncertainty: the across-campaign variance of the
    campaign posterior means is an unbiased estimate of the squared
    standard error of the grand mean, because campaigns are independent
    by construction. This is the honest estimator the round-4 calibration
    gate identified — it charges the basin-placement variance that every
    single-run diagnostic is structurally blind to.

    Data handling matches ``gpirt_mcmc`` (vote-code recoding, priors,
    default qnorm cutpoints). ``mesh`` with a ``campaign_axis`` axis
    shards campaigns over devices (embarrassingly parallel — zero
    collectives; ``n_campaigns`` must divide the axis size); without a
    mesh all campaigns batch into one single-device program.

    Returns a dict:
      theta_mean   (n, H)  grand posterior mean (sign-aligned)
      theta_se     (n, H)  campaign-replicated standard error of theta_mean
      campaign_means (R, n, H) per-campaign posterior means (aligned)
      ess_campaign (n, H)  implied ESS of the grand mean per coordinate
                           (posterior_var / var(campaign mean) * ... see
                           below); ess_campaign_median its median
      pooled_ess_per_campaign (R,) per-campaign pooled rank-ESS medians
                           (the single-run basis, reported for comparison)
      final_weight_ess (R,) SMC final weight-ESS per campaign
      n_resamples  (R,)    SMC resample counts
      walls        dict    smc_sec / sampling_sec / total_sec
      schedule     dict    the resolved per-campaign schedule
      draws        dict    (if store_draws) theta (R, K, S, n, H),
                           threshold (R, K, S, m, C+1, H), ll (R, K, S)
      respondents/items    labels when the input carried dimnames
    """
    from gpirt_tpu.api import (
        DEFAULT_VOTE_CODES,
        _as_cube,
        _cached_constants,
        _coerce_thresholds,
        _strip_h,
        default_thresholds,
    )
    from gpirt_tpu.parallel.chains import (
        canonical_mesh,
        chain_keys,
        run_chains_chunked,
    )
    from gpirt_tpu.parallel.smc import anneal_init_batched
    from gpirt_tpu.utils.diagnostics import effective_sample_size_device
    from gpirt_tpu.utils.response import (
        as_response_matrix,
        encode_categories,
        recode_cube,
    )

    if vote_codes is ...:
        vote_codes = DEFAULT_VOTE_CODES
    if vote_codes is not None:
        stripped = _strip_h(data)
        if np.asarray(stripped).ndim == 3:
            data = recode_cube(stripped, vote_codes, verbose=verbose)
        else:
            data = as_response_matrix(stripped, vote_codes, verbose=verbose)
    row_names = getattr(data, "row_names", None)
    col_names = getattr(data, "col_names", None)

    cube = _as_cube(data)
    y, C, _ = encode_categories(cube)  # (H, n, m)
    H, n, m = y.shape

    sched = campaign_schedule(C)
    if n_chains is not None:
        sched["n_chains"] = int(n_chains)
    if sample_iterations is not None:
        sched["sample_iterations"] = int(sample_iterations)
    if burn_iterations is not None:
        sched["burn_iterations"] = int(burn_iterations)
    if smc_steps is not None:
        sched["smc_steps"] = int(smc_steps)
    if smc_max_temp is not None:
        sched["smc_max_temp"] = float(smc_max_temp)
    if threshold_method is not None:
        sched["threshold_method"] = threshold_method
    K = sched["n_chains"]
    R = int(n_campaigns)
    if R < 2:
        raise ValueError(
            "n_campaigns must be >= 2: the campaign-replicated standard "
            "error is the across-campaign variance, undefined for one "
            "campaign (for a single run use gpirt_mcmc)")

    if beta_prior_means is None:
        beta_prior_means = np.zeros((3, m))
    if beta_prior_sds is None:
        beta_prior_sds = np.full((3, m), 3.0)
    if theta_prior_means is None:
        theta_prior_means = np.zeros((2, n))
    if theta_prior_sds is None:
        theta_prior_sds = np.zeros((2, n))
    beta_prior_means = np.broadcast_to(
        np.asarray(beta_prior_means, np.float64), (3, m))
    beta_prior_sds = np.broadcast_to(
        np.asarray(beta_prior_sds, np.float64), (3, m))
    theta_prior_means = np.broadcast_to(
        np.asarray(theta_prior_means, np.float64), (2, n))
    theta_prior_sds = np.broadcast_to(
        np.asarray(theta_prior_sds, np.float64), (2, n))

    config = GPIRTConfig(
        n=n, m=m, horizon=H, C=C, grid_size=grid_size,
        theta_os=float(theta_os), theta_ls=float(theta_ls), kernel=KERNEL,
        dtype=dtype, threshold_method=sched["threshold_method"],
        prng_impl=prng_impl,
        jitter=jitter if jitter is not None
        else (1e-6 if dtype == "float64" else 1e-5),
    )
    consts = _cached_constants(
        config, beta_prior_means, beta_prior_sds,
        theta_prior_means, theta_prior_sds)

    if thresholds is None:
        thresholds_init = default_thresholds(C, m, H)
    else:
        thresholds_init = _coerce_thresholds(
            np.asarray(thresholds, np.float64), m, C, H)

    # Overdispersed per-chain inits (shared across campaigns — campaign
    # stochasticity comes entirely from the keys): random permutations of
    # an equispaced theta ladder, the measured frontier's init.
    rng = np.random.default_rng(SEED)
    theta_init = np.stack([
        np.broadcast_to(rng.permutation(np.linspace(-2, 2, n))[None], (H, n))
        for _ in range(K)
    ])
    theta_init = np.clip(theta_init, THETA_LO, THETA_HI)

    mesh = canonical_mesh(mesh)
    keys = jnp.stack([
        chain_keys(SEED + r * K, K, impl=config.resolved_prng_impl)
        for r in range(R)
    ])  # (R, K)

    yj = jnp.asarray(y)
    t0 = time.time()
    states, info = anneal_init_batched(
        keys, yj, theta_init, thresholds_init, consts, config,
        n_steps=sched["smc_steps"], max_temp=sched["smc_max_temp"],
        mesh=mesh, campaign_axis=campaign_axis)
    # fetch-sync: on the tunneled runtime block_until_ready only enqueues;
    # a wall must end with a device fetch (utils/profiling.fetch_sync)
    from gpirt_tpu.utils.profiling import fetch_sync

    fetch_sync(states)
    smc_sec = time.time() - t0
    if verbose:
        we = info["final_weight_ess"]
        print(f"[gpirt] {R} campaigns annealed ({sched['smc_steps']} steps "
              f"from T={sched['smc_max_temp']:g}): {smc_sec:.2f}s, final "
              f"weight-ESS min/med {we.min():.1f}/{np.median(we):.1f}/{K}",
              file=sys.stderr)

    # Sampling: campaigns are lane-independent, so all R*K lanes advance as
    # one chunked run (campaign-major flattening keeps campaigns contiguous
    # — device-local when the mesh's campaign axis divides R).
    flat_keys = keys.reshape((R * K,))
    flat_states = jax.tree_util.tree_map(
        lambda a: a.reshape((R * K,) + a.shape[2:]), states)
    t1 = time.time()
    draws = run_chains_chunked(
        flat_keys, yj, jnp.asarray(theta_init, config.jdtype),
        jnp.asarray(thresholds_init, config.jdtype), consts, config,
        sample_iterations=sched["sample_iterations"],
        burn_iterations=sched["burn_iterations"],
        initial_states=flat_states, chunk_iterations=chunk_iterations,
        mesh=mesh, axis=campaign_axis,
    )
    fetch_sync(draws)
    sampling_sec = time.time() - t1

    # Estimator + per-campaign pooled rank-ESS, all on device: only the
    # (R, P)-sized summaries come back over the tunnel, never the draw
    # cube (fetching it costs more than the sampling itself).
    S = sched["sample_iterations"]
    P = H * n
    theta_dev = draws["theta"].reshape((R * K, S, P))

    @jax.jit
    def summaries(th):
        cm, pv = _campaign_estimator(th, R, K, S, P)
        pooled = jax.vmap(effective_sample_size_device)(
            th.reshape(R, K, S, P))
        return cm, pv, pooled

    cm_d, pv_d, pooled_d = summaries(theta_dev)
    campaign_means = np.asarray(cm_d, np.float64).reshape(R, H, n)
    post_var = np.asarray(pv_d, np.float64).reshape(H, n)
    pooled = np.median(np.asarray(pooled_d), axis=1)  # (R,)

    grand_mean = campaign_means.mean(axis=0)  # (H, n)
    # Campaign-replicated SE: campaigns are iid replicates of the whole
    # estimator, so var over campaigns / R estimates var(grand mean).
    var_c = campaign_means.var(axis=0, ddof=1)  # (H, n)
    se = np.sqrt(var_c / R)
    # Implied ESS of the grand mean: ESS is defined by
    # var(estimate) = posterior_var / ESS (the calibration-gate identity),
    # with posterior_var estimated from all draws pooled.
    ess_campaign = post_var / np.maximum(se * se, 1e-300)
    ess_med = float(np.median(ess_campaign))

    total_sec = time.time() - t0
    if verbose:
        print(f"[gpirt] campaign estimator: {R} x ({sched['smc_steps']} smc "
              f"+ {sched['burn_iterations']}+{S} sweeps x {K} chains), "
              f"sampling {sampling_sec:.2f}s; implied campaign ESS median "
              f"{ess_med:.1f}, theta SE median {np.median(se):.4f} "
              f"(single-run pooled basis would claim "
              f"{np.median(pooled):.0f}/campaign)", file=sys.stderr)

    out: Dict[str, Any] = {
        # reference-like trailing-horizon layouts
        "theta_mean": np.moveaxis(grand_mean, 0, -1),  # (n, H)
        "theta_se": np.moveaxis(se, 0, -1),
        "campaign_means": np.moveaxis(campaign_means, 1, -1),  # (R, n, H)
        "ess_campaign": np.moveaxis(ess_campaign, 0, -1),
        "ess_campaign_median": ess_med,
        "pooled_ess_per_campaign": pooled,
        "final_weight_ess": np.asarray(info["final_weight_ess"]),
        "n_resamples": np.asarray(info["n_resamples"]),
        "walls": {"smc_sec": smc_sec, "sampling_sec": sampling_sec,
                  "total_sec": total_sec},
        "schedule": dict(sched, n_campaigns=R),
    }
    if store_draws:
        # raw (unaligned) draws; the host fetch happens only on request
        theta_np = np.asarray(draws["theta"]).reshape(R, K, S, H, n)
        st: Dict[str, np.ndarray] = {
            "theta": np.moveaxis(theta_np, 3, -1),  # (R, K, S, n, H)
            "ll": np.asarray(draws["ll"]).reshape(R, K, S),
        }
        if "threshold" in draws:
            thr = np.asarray(draws["threshold"]).reshape(
                R, K, S, H, m, C + 1)
            st["threshold"] = np.moveaxis(thr, 3, -1)
        if "beta" in draws:
            b = np.asarray(draws["beta"]).reshape(R, K, S, H, 3, m)
            st["beta"] = np.moveaxis(b, 3, -1)  # (R, K, S, 3, m, H)
        out["draws"] = st
    if row_names is not None:
        out["respondents"] = list(row_names)
    if col_names is not None:
        out["items"] = list(col_names)
    return out
