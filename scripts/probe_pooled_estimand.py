"""Probe: what between-chain disagreement does the pooled ESS basis charge?

Round-4 finding from the (K, draws) grid (scripts/tune_pooled.py): pooled
theta-ESS per campaign is ~2.4 per chain, flat in the draw budget — the
basis is gated by residual between-chain disagreement, not by chain length.
The r2 mixing study says that disagreement lives in the soft-mode family:
collective location/scale/warp maps of theta with f/beta compensating,
anchored per sweep by the latents z (RESULTS.md "theta-mixing study").

This probe decomposes the charge. For one bench-default campaign it
computes pooled ESS of
  raw         theta draws as stored (bench.py already sign-aligns);
  centered    theta minus its per-draw respondent mean (location mode out);
  standardized  centered / per-draw respondent sd (location+scale out);
  rankwarp    per-draw rank -> average-configuration quantile (all
              monotone warps out — the full soft-mode family).
If pooled ESS climbs toward the within-chain basis as invariances are
removed, the disagreement is (to that fraction) soft-mode wander in the
weakly identified directions, not basin disagreement about the
configuration itself — and the standardized estimand (how ideal points
are consumed in practice: only relative positions are identified) is the
honest pooled-basis quantity.

Usage: python scripts/probe_pooled_estimand.py [--chains 64] [--draws 500]
       [--seeds 3] [--smc-steps 320]
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
    ap.add_argument("--chains", type=int, default=64)
    ap.add_argument("--draws", type=int, default=500)
    ap.add_argument("--burn", type=int, default=100)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--smc-steps", type=int, default=320)
    args = ap.parse_args()

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
                         jitter=1e-4)
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

    @jax.jit
    def within(th):
        per = jax.vmap(lambda ch: effective_sample_size_device(ch[None]))(th)
        return jnp.sum(per, axis=0)

    @jax.jit
    def transforms(th):  # (K, S, n) sign-aligned
        mean = jnp.mean(th, axis=-1, keepdims=True)
        cen = th - mean
        sd = jnp.std(th, axis=-1, keepdims=True) + 1e-12
        std = cen / sd
        # rank-warp: map each draw's config to the quantiles of the grand
        # mean configuration (kills every monotone warp)
        order = jnp.argsort(jnp.argsort(th, axis=-1), axis=-1)  # ranks
        ref = jnp.sort(jnp.mean(std, axis=(0, 1)))  # (n,) reference shape
        warp = ref[order]
        return cen, std, warp

    @jax.jit
    def align_signs(th):
        ref = jnp.sign(jnp.arange(n) - n / 2).astype(th.dtype)
        s = jnp.sign(jnp.sum(jnp.mean(th, axis=1) * ref, axis=-1))
        return th * s[:, None, None]

    t0 = time.time()
    for seed in range(1, args.seeds + 1):
        keys = chain_keys(seed, K, impl=config.resolved_prng_impl)
        states, info = anneal_init(keys, yj, theta_init, thr, consts, config,
                                   n_steps=args.smc_steps)
        fetch_sync(states)
        dr = run_chains_chunked(
            keys, yj, theta_init, thr, consts, config,
            sample_iterations=args.draws, burn_iterations=args.burn,
            chunk_iterations=250, initial_states=states,
        )
        th = align_signs(dr["theta"][:, :, 0])  # (K, S, n)
        cen, std, warp = transforms(th)
        row = {"seed": seed, "weight_ess": info["final_weight_ess"]}
        for name, arr in (("raw", th), ("centered", cen),
                          ("standardized", std), ("rankwarp", warp)):
            row[f"pooled_{name}"] = float(np.median(np.asarray(pooled_j(arr))))
        row["within_raw"] = float(np.median(np.asarray(within(th))))
        row["within_std"] = float(np.median(np.asarray(within(std))))
        row["t"] = round(time.time() - t0, 1)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
