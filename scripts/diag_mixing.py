"""Diagnose the theta-mixing bottleneck on senate116 (VERDICT r1 item 2).

Decomposes the low pooled theta ESS (BENCH_r01: median 38 / 128k draws) into
candidate causes:
  (a) within-chain autocorrelation of raw theta_i (self-reinforcement through
      the (theta | f*) / (f* | f) blocking),
  (b) between-chain disagreement (burn-in too short / multimodality),
  (c) soft affine modes: the likelihood is nearly invariant under
      theta -> a*theta + b with f* compensating, so mean(theta) and sd(theta)
      drift on the prior's timescale while the *shape* (standardized theta)
      is well mixed.

Usage: python scripts/diag_mixing.py [--chains 16] [--samples 2000]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

from gpirt_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()  # env var alone is read too early; see utils/cache.py

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=16)
    ap.add_argument("--samples", type=int, default=2000)
    ap.add_argument("--burn", type=int, default=500)
    ap.add_argument("--f-method", default="auto")
    ap.add_argument("--mix-subsweeps", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from gpirt_tpu.utils.profiling import fetch_sync

    from gpirt_tpu.api import default_thresholds
    from gpirt_tpu.models import GPIRTConfig, make_constants
    from gpirt_tpu.parallel.chains import chain_keys, run_chains_chunked
    from gpirt_tpu.utils.datasets import senate116_response_matrix
    from gpirt_tpu.utils.diagnostics import (
        align_theta_signs,
        effective_sample_size,
        split_rhat,
    )
    from gpirt_tpu.utils.response import encode_categories

    rm, _, _ = senate116_response_matrix()
    y, C, _ = encode_categories(np.asarray(rm))
    H, n, m = y.shape
    config = GPIRTConfig(n=n, m=m, horizon=H, C=C, dtype="float32", jitter=1e-4,
                         f_method=args.f_method, mix_subsweeps=args.mix_subsweeps)
    consts = make_constants(config, np.zeros((3, m)), np.full((3, m), 3.0),
                            np.zeros((2, n)), np.zeros((2, n)))
    thr = default_thresholds(C, m, H)
    rng = np.random.default_rng(0)
    K = args.chains
    ti = np.stack([rng.permutation(np.linspace(-2, 2, n))[None] for _ in range(K)])
    yj = jnp.asarray(y)

    t0 = time.time()
    # chunked: the tunneled TPU runtime faults on single device calls > ~45 s
    d = run_chains_chunked(chain_keys(1, K), yj, ti, thr, consts, config,
                           sample_iterations=args.samples,
                           burn_iterations=args.burn, chunk_iterations=250)
    fetch_sync(d)
    wall = time.time() - t0
    print(f"run: {K} chains x {args.samples}+{args.burn} iters, {wall:.1f}s "
          f"(f_method={config.resolved_f_method})")

    ll = np.asarray(d["ll"])  # (K, S)
    S = ll.shape[1]
    drift = ll[:, -S // 10:].mean(axis=1) - ll[:, S // 4: S // 4 + S // 10].mean(axis=1)
    print(f"ll final per chain: min {ll[:, -1].min():.0f} max {ll[:, -1].max():.0f}; "
          f"late-vs-early drift: median {np.median(drift):.1f} max {drift.max():.1f} "
          f"(>0 = still burning in)")

    theta = np.asarray(d["theta"][:, :, 0])  # (K, S, n)
    ref = theta[0, 0]
    aligned = np.stack([align_theta_signs(c, reference=ref) for c in theta])

    # (a) within-chain ESS: treat each chain separately, take medians
    per_chain = np.stack([
        effective_sample_size(aligned[k][None]) for k in range(K)
    ])  # (K, n)
    print(f"\n(a) per-chain theta ESS (S={args.samples} draws each):")
    print(f"    median over (chain, respondent): {np.median(per_chain):.1f}")
    print(f"    chain medians: min {np.median(per_chain, 1).min():.1f}, "
          f"max {np.median(per_chain, 1).max():.1f}")

    # (b) pooled ESS + R-hat
    pooled = effective_sample_size(aligned)
    rh = split_rhat(aligned)
    print(f"\n(b) pooled over {K} chains: ESS median {np.median(pooled):.1f} "
          f"(of {K * args.samples}), R-hat median {np.median(rh):.3f} "
          f"max {np.max(rh):.3f}")
    # between-chain spread of posterior means
    cm = aligned.mean(axis=1)  # (K, n)
    print(f"    between-chain sd of per-respondent means: "
          f"median {np.median(cm.std(0)):.4f}; within-chain posterior sd: "
          f"median {np.median(aligned.std(1)):.4f}")

    # (c) affine-mode decomposition
    mu_t = aligned.mean(axis=2)   # (K, S) location mode
    sd_t = aligned.std(axis=2)    # (K, S) scale mode
    z = (aligned - mu_t[..., None]) / sd_t[..., None]  # standardized shape
    ess_mu = effective_sample_size(mu_t[..., None])
    ess_sd = effective_sample_size(sd_t[..., None])
    z_per_chain = np.stack([
        effective_sample_size(z[k][None]) for k in range(K)
    ])
    z_pooled = effective_sample_size(z)
    print(f"\n(c) affine modes: ESS[mean(theta)] {ess_mu[0]:.1f}, "
          f"ESS[sd(theta)] {ess_sd[0]:.1f} (pooled)")
    print(f"    standardized theta: per-chain ESS median "
          f"{np.median(z_per_chain):.1f}, pooled median {np.median(z_pooled):.1f}")
    print(f"    sd(theta) range across draws: "
          f"[{sd_t.min():.3f}, {sd_t.max():.3f}]; mean(theta) range: "
          f"[{mu_t.min():.3f}, {mu_t.max():.3f}]")

    # per-chain trace summary of one respondent (most/least mixed)
    worst = int(np.argmin(np.median(per_chain, axis=0)))
    best = int(np.argmax(np.median(per_chain, axis=0)))
    print(f"\nworst respondent {worst}: per-chain ESS median "
          f"{np.median(per_chain[:, worst]):.1f}; chain0 trace quantiles "
          f"{np.quantile(aligned[0, :, worst], [0, .25, .5, .75, 1]).round(3)}")
    print(f"best respondent {best}: per-chain ESS median "
          f"{np.median(per_chain[:, best]):.1f}")


if __name__ == "__main__":
    main()
