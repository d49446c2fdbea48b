"""ROADMAP item: data-subsampled tempering — measure the necessary condition.

Round-2 measured that NOISE tempering cannot unfreeze the GP-IRT
posterior's soft warp modes: the augmented z-dynamics re-anchor every
sweep and the per-item anchor cost does not drop with temperature
(RESULTS.md mixing study). The open question: hot rungs that see a
SUBSAMPLED item set attack the m-multiplication of the anchor directly
(the z-box cost of a theta perturbation is a sum over items, so keeping a
fraction p of items scales it by p). A subsampled-likelihood ladder can
only help if its hot rungs actually traverse basins — that necessary
condition is what this probe measures, before any ladder is built.

Design: for p in {1.0, 0.5, 0.25, 0.1} run K chains on a fixed random
p-fraction item subset of senate116 from overdispersed inits (NO SMC —
the point is whether the dynamics themselves mix), same sweep budget,
and compare the between-chain spread of sign-aligned posterior means
(the basin-lottery signature: ~0.3 at p=1 without SMC) and pooled vs
within ESS. If the spread stays at the frozen level even at p=0.1, a
subsampled ladder has no mixing to transport to the cold rung and the
ROADMAP item closes as measured-and-rejected.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)

import numpy as np
import jax
from gpirt_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()  # env var alone is read too early; see utils/cache.py
import jax.numpy as jnp

from gpirt_tpu.models import GPIRTConfig, make_constants
from gpirt_tpu.parallel.chains import chain_keys, run_chains_chunked
from gpirt_tpu.utils.datasets import senate116_response_matrix
from gpirt_tpu.utils.response import encode_categories
from gpirt_tpu.api import default_thresholds
from gpirt_tpu.utils.profiling import fetch_sync
from gpirt_tpu.utils.diagnostics import effective_sample_size

K, SWEEPS, BURN = 16, 500, 300

rm, _, _ = senate116_response_matrix()
y_full, C, _ = encode_categories(np.asarray(rm))
H, n, m_full = y_full.shape
rng = np.random.default_rng(42)
perm = rng.permutation(m_full)

for p in (1.0, 0.5, 0.25, 0.1):
    m = max(8, int(round(p * m_full)))
    y = np.ascontiguousarray(y_full[:, :, perm[:m]])
    config = GPIRTConfig(n=n, m=m, horizon=H, C=C, dtype="float32",
                         jitter=1e-4)
    consts = make_constants(
        config,
        beta_prior_means=np.zeros((3, m)),
        beta_prior_sds=np.full((3, m), 3.0),
        theta_prior_means=np.zeros((2, n)),
        theta_prior_sds=np.zeros((2, n)),
    )
    thr = default_thresholds(C, m, H)
    r2 = np.random.default_rng(0)
    ti = np.stack([r2.permutation(np.linspace(-2, 2, n))[None]
                   for _ in range(K)])
    t0 = time.time()
    draws = run_chains_chunked(
        chain_keys(1, K, impl=config.resolved_prng_impl), jnp.asarray(y),
        ti, thr, consts, config,
        sample_iterations=SWEEPS, burn_iterations=BURN, chunk_iterations=250,
    )
    fetch_sync(draws)
    wall = time.time() - t0
    th = np.asarray(draws["theta"])[:, :, 0]  # (K, S, n)
    ch = th.mean(axis=1)  # (K, n)
    sign = np.sign(ch @ ch[0])
    sign[sign == 0] = 1
    cha = ch * sign[:, None]
    tha = th * sign[:, None, None]
    between_sd = float(cha.std(axis=0).mean())
    # normalize by the posterior's own width: frozen chains have
    # between-chain mean spread comparable to (or larger than) the
    # within-chain posterior sd; mixing chains have spread ~ sd/sqrt(ESS)
    within_sd = float(tha.std(axis=1).mean())
    within = np.median([
        np.median(effective_sample_size(tha[k][None])) for k in range(K)
    ])
    pooled = float(np.median(effective_sample_size(tha)))
    from gpirt_tpu.utils.diagnostics import split_rhat
    rhat = float(np.median(split_rhat(tha)))
    print(f"p={p:4.2f} m={m:3d}: between/within sd {between_sd:.3f}/"
          f"{within_sd:.3f} (ratio {between_sd / within_sd:4.2f})  "
          f"R-hat(med) {rhat:5.2f}  within-ESS {within:6.1f}  "
          f"pooled-ESS {pooled:6.1f}  wall {wall:.1f}s", flush=True)
