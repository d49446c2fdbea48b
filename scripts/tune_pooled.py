"""Round-4 operating-point sweep: pooled theta-ESS/sec vs (K, draws).

VERDICT r3 item 1: the headline within-chain basis ran 454 ess/s but the
conservative pooled basis — the one charging residual cross-chain
disagreement — sat at 29 ess/s. The levers named by the r3 measurements:
K >= 128 chains (saturates SMC weight-ESS, ~3x pooled ESS per campaign,
ROADMAP "chain-count scaling") and longer sampling windows (the 2.4 s SMC
anneal is 44% of a 500-draw campaign's wall; pooled ESS grows ~linearly in
draws while the prologue amortizes).

Runs bench.py's exact pipeline (SMC annealed init -> chunked sampling) on
a (K, draws) grid, reports within/pooled ESS and both per-second bases,
and prints the grid as JSON lines for RESULTS.md.

Usage: python scripts/tune_pooled.py [--grid "64x500,64x2000,128x2000"]
       [--seeds 2] [--smc-steps 320]
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
    ap.add_argument("--grid", default="64x500,64x2000,128x500,128x2000")
    ap.add_argument("--seeds", type=int, default=2)
    ap.add_argument("--smc-steps", type=int, default=320)
    ap.add_argument("--smc-max-temp", type=float, default=64.0)
    ap.add_argument("--burn", type=int, default=100)
    ap.add_argument("--threshold-method", default="auto")
    args = ap.parse_args()
    cells = [tuple(map(int, c.split("x"))) for c in args.grid.split(",")]

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

    config = GPIRTConfig(n=n, m=m, horizon=H, C=C, dtype="float32",
                         jitter=1e-4, threshold_method=args.threshold_method)
    consts = make_constants(
        config,
        beta_prior_means=np.zeros((3, m)),
        beta_prior_sds=np.full((3, m), 3.0),
        theta_prior_means=np.zeros((2, n)),
        theta_prior_sds=np.zeros((2, n)),
    )

    pooled_j = jax.jit(effective_sample_size_device)

    @jax.jit
    def within(th):  # (K, S, n) -> (n,) summed per-chain ESS
        per = jax.vmap(lambda ch: effective_sample_size_device(ch[None]))(th)
        return jnp.sum(per, axis=0)

    t_start = time.time()

    def log(msg):
        print(f"[tune +{time.time() - t_start:6.1f}s] {msg}",
              file=sys.stderr, flush=True)

    rng = np.random.default_rng(0)

    results = []
    for K, draws in cells:
        theta_init = np.stack([
            rng.permutation(np.linspace(-2, 2, n))[None] for _ in range(K)
        ])

        def go(seed):
            keys = chain_keys(seed, K, impl=config.resolved_prng_impl)
            t0 = time.time()
            states, info = anneal_init(
                keys, yj, theta_init, thr, consts, config,
                n_steps=args.smc_steps, max_temp=args.smc_max_temp,
            )
            fetch_sync(states)
            smc_w = time.time() - t0
            t0 = time.time()
            dr = run_chains_chunked(
                keys, yj, theta_init, thr, consts, config,
                sample_iterations=draws, burn_iterations=args.burn,
                chunk_iterations=250, initial_states=states,
            )
            fetch_sync(dr)
            return dr, info, smc_w, time.time() - t0

        log(f"--- K={K} draws={draws}: warmup/compile")
        t0 = time.time()
        go(99)
        log(f"warmup {time.time() - t0:.1f}s; timed seeds")

        w_l, p_l, wall_l, wess = [], [], [], []
        for s in range(1, args.seeds + 1):
            dr, info, smc_w, samp_w = go(s)
            theta = dr["theta"][:, :, 0]
            w = float(np.median(np.asarray(within(theta))))
            p = float(np.median(np.asarray(pooled_j(theta))))
            w_l.append(w)
            p_l.append(p)
            wall_l.append(smc_w + samp_w)
            wess.append(info["final_weight_ess"])
            log(f"K={K} draws={draws} seed {s}: smc {smc_w:.1f}s + samp "
                f"{samp_w:.1f}s, within {w:.0f}, pooled {p:.0f}, "
                f"weight-ESS {info['final_weight_ess']:.1f}/{K}")
        wall = sum(wall_l)
        row = {
            "K": K, "draws": draws, "seeds": args.seeds,
            "smc_steps": args.smc_steps,
            "within_med": sum(w_l) / len(w_l),
            "pooled_med": sum(p_l) / len(p_l),
            "within_per_sec": sum(w_l) / wall,
            "pooled_per_sec": sum(p_l) / wall,
            "wall_per_seed": wall / args.seeds,
            "weight_ess": sum(wess) / len(wess),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({"grid": results}), flush=True)


if __name__ == "__main__":
    main()
