"""Calibration gate for the pooled-optimal schedule: is the claimed pooled
ESS real, or is a short anneal gaming the estimator by under-dispersion?

Danger mode: the rank-normalized pooled ESS charges between-chain
disagreement, so an anneal too short to spread chains across all posterior
basins makes chains AGREE more (higher claimed ESS) while the ensemble is
jointly biased/under-dispersed. The r4 frontier sweep saw pooled/campaign
RISE from 146 to 227 when smc_steps dropped 160 -> 96 — exactly the
signature that needs this gate.

Gold standard: ESS is DEFINED by var(posterior-mean estimate) =
posterior_var / ESS. Campaigns are fully independent (fresh SMC, fresh
chains), so the across-campaign variance of the campaign pooled mean is an
unbiased measure of the estimator's true information content:

    ESS_implied_i = var_post(theta_i) / var_across_campaigns(mean_i)

computed per respondent, medianed. If ESS_implied ~ the rank-normalized
claim, the schedule is honest; if ESS_implied << claim at short anneals,
the short schedule is under-dispersed and must be rejected regardless of
its pooled/sec. Also reports the campaign-mean drift from the
longest-anneal reference (placement bias shows up as disagreement of the
across-campaign grand means).

Usage: python scripts/probe_smc_calibration.py [--campaigns 8]
       [--steps 96,160,320]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gpirt_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--campaigns", type=int, default=8)
    ap.add_argument("--steps", default="96,160,320")
    ap.add_argument("--chains", type=int, default=64)
    ap.add_argument("--draws", type=int, default=100)
    ap.add_argument("--burn", type=int, default=25)
    ap.add_argument("--threshold-method", default="newton")
    args = ap.parse_args()
    steps_list = [int(s) for s in args.steps.split(",")]

    import jax
    import jax.numpy as jnp

    from gpirt_tpu.api import default_thresholds
    from gpirt_tpu.models import GPIRTConfig, make_constants
    from gpirt_tpu.parallel.chains import chain_keys, run_chains_chunked
    from gpirt_tpu.parallel.smc import anneal_init
    from gpirt_tpu.utils.datasets import senate116_response_matrix
    from gpirt_tpu.utils.diagnostics import effective_sample_size_device
    from gpirt_tpu.utils.profiling import fetch_sync
    from gpirt_tpu.utils.response import encode_categories

    rm, _, _ = senate116_response_matrix()
    y, C, _ = encode_categories(np.asarray(rm))
    H, n, m = y.shape
    yj = jnp.asarray(y)
    thr = default_thresholds(C, m, H)
    K = args.chains

    config = GPIRTConfig(n=n, m=m, horizon=H, C=C, dtype="float32",
                         jitter=1e-4,
                         threshold_method=args.threshold_method)
    consts = make_constants(
        config,
        beta_prior_means=np.zeros((3, m)),
        beta_prior_sds=np.full((3, m), 3.0),
        theta_prior_means=np.zeros((2, n)),
        theta_prior_sds=np.zeros((2, n)),
    )
    rng = np.random.default_rng(0)
    theta_init = np.stack(
        [rng.permutation(np.linspace(-2, 2, n))[None] for _ in range(K)]
    )
    pooled_j = jax.jit(effective_sample_size_device)

    # device-side per-campaign summaries: sign-aligned pooled mean (n,),
    # pooled var (n,), pooled rank-normalized ESS (n,)
    @jax.jit
    def summarize(th):  # (K, S, n)
        ref = jnp.sign(jnp.arange(n) - n / 2).astype(th.dtype)
        s = jnp.sign(jnp.sum(jnp.mean(th, axis=1) * ref, axis=-1))
        th = th * s[:, None, None]
        return (jnp.mean(th, axis=(0, 1)), jnp.var(th, axis=(0, 1)),
                pooled_j(th))

    t0 = time.time()
    results = {}
    for steps in steps_list:
        means, vars_, esss, walls = [], [], [], []
        for c in range(1, args.campaigns + 1):
            seed = 1000 * steps + c  # disjoint seeds per cell
            keys = chain_keys(seed, K, impl=config.resolved_prng_impl)
            tc = time.time()
            st, info = anneal_init(keys, yj, theta_init, thr, consts,
                                   config, n_steps=steps)
            fetch_sync(st)
            dr = run_chains_chunked(
                keys, yj, theta_init, thr, consts, config,
                sample_iterations=args.draws, burn_iterations=args.burn,
                chunk_iterations=250, initial_states=st,
            )
            mean, var, ess = summarize(dr["theta"][:, :, 0])
            fetch_sync((mean, var, ess))
            walls.append(time.time() - tc)
            means.append(np.asarray(mean))
            vars_.append(np.asarray(var))
            esss.append(float(np.median(np.asarray(ess))))
        means = np.stack(means)          # (Ncamp, n)
        var_post = np.mean(np.stack(vars_), axis=0)  # (n,)
        var_mean = np.var(means, axis=0, ddof=1)     # (n,)
        ess_implied = var_post / np.maximum(var_mean, 1e-12)
        row = {
            "smc_steps": steps,
            "campaigns": args.campaigns,
            "pooled_claim_med": float(np.mean(esss)),
            "ess_implied_med": float(np.median(ess_implied)),
            "ess_implied_q25": float(np.quantile(ess_implied, 0.25)),
            "wall_per_campaign": float(np.mean(walls)),
            "grand_mean": means.mean(axis=0).tolist(),
            "t": round(time.time() - t0, 1),
        }
        results[steps] = row
        pr = {k: v for k, v in row.items() if k != "grand_mean"}
        pr["implied_per_sec"] = row["ess_implied_med"] / row["wall_per_campaign"]
        pr["claim_per_sec"] = row["pooled_claim_med"] / row["wall_per_campaign"]
        print(json.dumps(pr), flush=True)

    # placement drift vs the longest-anneal reference
    ref_steps = max(steps_list)
    gm_ref = np.asarray(results[ref_steps]["grand_mean"])
    sd_ref = np.sqrt(np.maximum(
        np.var(np.asarray([results[s]["grand_mean"] for s in steps_list]), 0),
        1e-12))
    for steps in steps_list:
        gm = np.asarray(results[steps]["grand_mean"])
        se = np.sqrt(2.0) * np.std(gm - gm_ref)  # rough scale
        print(json.dumps({
            "drift_vs_ref": steps,
            "ref": ref_steps,
            "corr": float(np.corrcoef(gm, gm_ref)[0, 1]),
            "max_abs_diff": float(np.max(np.abs(gm - gm_ref))),
            "rms_diff": float(np.sqrt(np.mean((gm - gm_ref) ** 2))),
        }), flush=True)


if __name__ == "__main__":
    main()
