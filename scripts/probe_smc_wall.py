"""Measure the SMC annealing wall at bench scale (senate116, 64 chains).

Used to evaluate the lax.cond-gated resample gather (parallel/smc.py):
~2/3 of annealing steps skip the resample, and the identity lane-pytree
gather those steps previously paid is ~107 MB of HBM traffic each.
Prior measurement (ungated, round 3): ~2.4 s/seed at 320 steps.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gpirt_tpu.models import GPIRTConfig, make_constants
from gpirt_tpu.parallel.chains import chain_keys
from gpirt_tpu.parallel.smc import anneal_init
from gpirt_tpu.utils.datasets import senate116_response_matrix
from gpirt_tpu.utils.response import encode_categories
from gpirt_tpu.api import default_thresholds
from gpirt_tpu.utils.profiling import fetch_sync

import argparse
_ap = argparse.ArgumentParser()
_ap.add_argument("--steps", type=int, default=320)
_ap.add_argument("--sweeps", type=int, default=1)
_a = _ap.parse_args()
n_chains, smc_steps, max_temp = 64, _a.steps, 64.0

rm, _, _ = senate116_response_matrix()
y, C, _ = encode_categories(np.asarray(rm))
H, n, m = y.shape
config = GPIRTConfig(n=n, m=m, horizon=H, C=C, dtype="float32", jitter=1e-4)
consts = make_constants(
    config,
    beta_prior_means=np.zeros((3, m)),
    beta_prior_sds=np.full((3, m), 3.0),
    theta_prior_means=np.zeros((2, n)),
    theta_prior_sds=np.zeros((2, n)),
)
thr = default_thresholds(C, m, H)
rng = np.random.default_rng(0)
theta_init = np.stack(
    [rng.permutation(np.linspace(-2, 2, n))[None] for _ in range(n_chains)]
)
yj = jnp.asarray(y)

t0 = time.time()
keys = chain_keys(99, n_chains, impl=config.resolved_prng_impl)
states, info = anneal_init(keys, yj, theta_init, thr, consts, config,
                           n_steps=smc_steps, max_temp=max_temp,
                           sweeps_per_step=_a.sweeps)
fetch_sync(states)
print(f"warmup (compile): {time.time() - t0:.1f}s", file=sys.stderr)

walls = []
for s in (1, 2, 3, 4, 5):
    keys = chain_keys(s, n_chains, impl=config.resolved_prng_impl)
    t0 = time.time()
    states, info = anneal_init(keys, yj, theta_init, thr, consts, config,
                               n_steps=smc_steps, max_temp=max_temp,
                               sweeps_per_step=_a.sweeps)
    fetch_sync(states)
    w = time.time() - t0
    walls.append(w)
    print(f"seed {s}: {w:.2f}s  resamples={info['n_resamples']} "
          f"final_wess={info['final_weight_ess']:.1f}", file=sys.stderr)
print(f"median smc wall: {sorted(walls)[len(walls)//2]:.2f}s")
