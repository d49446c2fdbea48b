"""Bisect the dynamic-config TPU worker crash (bench.py --config dynamic).

Runs the dynamic workload at reduced iteration count with each suspect
round-3 feature disabled in turn. Usage:
    python scripts/probe_dynamic_crash.py [variant]
variants: default | threefry | ess_threshold | grid_f | tiny
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from gpirt_tpu.models import GPIRTConfig, make_constants
from gpirt_tpu.parallel.chains import chain_keys, run_chains_chunked
from gpirt_tpu.utils.datasets import simulate_dynamic
from gpirt_tpu.utils.response import encode_categories
from gpirt_tpu.api import default_thresholds
from gpirt_tpu.utils.profiling import fetch_sync

variant = sys.argv[1] if len(sys.argv) > 1 else "default"
n, m, horizon, n_chains = 150, 60, 10, 16
iters, burn = 20, 20
kw = {}
if variant == "threefry":
    kw["prng_impl"] = "threefry2x32"
elif variant == "ess_threshold":
    kw["threshold_method"] = "ess"
elif variant == "grid_f":
    kw["f_method"] = "grid"
elif variant == "cst":
    pass  # theta_ls >= 3H -> CST regime (set below)
elif variant == "rdm":
    pass  # theta_ls <= 0.1 -> RDM regime (set below)
elif variant == "tiny":
    n, m, horizon = 30, 10, 3

truth, raw = simulate_dynamic(0, n=n, m=m, horizon=horizon, missing=0.1)
y, C, _ = encode_categories(raw)
ls = {"cst": 60.0, "rdm": 0.05}.get(variant, 2.0)
config = GPIRTConfig(n=n, m=m, horizon=horizon, C=C, dtype="float32",
                     theta_os=1.0, theta_ls=ls, **kw)
print("theta_regime:", config.theta_regime)
consts = make_constants(config, np.zeros((3, m)), np.full((3, m), 3.0),
                        np.zeros((2, n)), np.zeros((2, n)))
thr = default_thresholds(C, m, horizon)
rng = np.random.default_rng(0)
ti = np.stack([
    np.tile(rng.permutation(np.linspace(-2, 2, n))[None], (horizon, 1))
    for _ in range(n_chains)
])
yj = jnp.asarray(y)

t0 = time.time()
d = run_chains_chunked(
    chain_keys(9, n_chains, impl=config.resolved_prng_impl), yj, ti, thr,
    consts, config, sample_iterations=iters, burn_iterations=burn,
    chunk_iterations=200,
)
fetch_sync(d)
print(f"{variant}: OK in {time.time() - t0:.1f}s "
      f"theta finite={bool(np.all(np.isfinite(np.asarray(d['theta']))))}")
