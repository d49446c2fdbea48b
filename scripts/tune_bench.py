"""Empirical (config, chains) sweep for the bench operating point.

Measures pooled + within-chain theta ESS per wall-second on senate116
across affine-move configurations and chain counts. Compile is warmed
separately and ESS is computed ON DEVICE (a 25 MB draw transfer over the
tunneled runtime costs minutes and would swamp the measurement — the round-1
lesson baked into bench.py).

Usage: python scripts/tune_bench.py [--samples 1000] [--burn 500]
"""

import argparse
import itertools
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
    ap.add_argument("--samples", type=int, default=1000)
    ap.add_argument("--burn", type=int, default=500)
    ap.add_argument("--chains", type=int, nargs="*", default=[64, 256])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from gpirt_tpu.utils.profiling import fetch_sync

    from gpirt_tpu.api import default_thresholds
    from gpirt_tpu.models import GPIRTConfig, make_constants
    from gpirt_tpu.parallel.chains import chain_keys, run_chains_chunked
    from gpirt_tpu.utils.datasets import senate116_response_matrix
    from gpirt_tpu.utils.diagnostics import effective_sample_size_device
    from gpirt_tpu.utils.response import encode_categories

    rm, _, _ = senate116_response_matrix()
    y, C, _ = encode_categories(np.asarray(rm))
    H, n, m = y.shape
    yj = jnp.asarray(y)
    thr = default_thresholds(C, m, H)
    rng = np.random.default_rng(0)

    configs = [
        ("orbit16+dil2", dict(affine_shift_max=16, affine_rounds=2)),
        ("orbit16", dict(affine_shift_max=16, affine_rounds=0)),
        ("orbit8", dict(affine_shift_max=8, affine_rounds=0)),
        ("off", dict(affine_shift_max=0, affine_rounds=0)),
    ]

    @jax.jit
    def within_ess(theta):  # (K, S, n) -> (n,) summed within-chain ESS
        per = jax.vmap(lambda c: effective_sample_size_device(c[None]))(theta)
        return jnp.sum(per, axis=0)

    print(f"{'config':<14}{'K':>5}{'wall s':>8}{'it/s':>8}{'poolESS':>9}"
          f"{'withinESS':>10}{'pool/s':>8}{'within/s':>9}", flush=True)
    for (name, kw), K in itertools.product(configs, args.chains):
        config = GPIRTConfig(n=n, m=m, horizon=H, C=C, dtype="float32",
                             jitter=1e-4, f_method="conjugate", **kw)
        consts = make_constants(config, np.zeros((3, m)), np.full((3, m), 3.0),
                                np.zeros((2, n)), np.zeros((2, n)))
        ti = np.stack([rng.permutation(np.linspace(-2, 2, n))[None]
                       for _ in range(K)])

        def go(seed):
            return run_chains_chunked(
                chain_keys(seed, K), yj, ti, thr, consts, config,
                sample_iterations=args.samples, burn_iterations=args.burn,
                chunk_iterations=250,
            )

        fetch_sync(go(99))  # compile warmup
        t0 = time.time()
        d = go(1)
        fetch_sync(d)
        wall = time.time() - t0
        pool = float(jnp.median(
            jax.jit(effective_sample_size_device)(d["theta"][:, :, 0])
        ))
        win = float(jnp.median(within_ess(d["theta"][:, :, 0])))
        total = args.samples + args.burn
        print(f"{name:<14}{K:>5}{wall:>8.1f}{total / wall:>8.1f}"
              f"{pool:>9.1f}{win:>10.1f}{pool / wall:>8.2f}"
              f"{win / wall:>9.2f}", flush=True)


if __name__ == "__main__":
    main()
