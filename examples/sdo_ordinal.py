"""Ordinal-response GP-IRT on the SDO survey (the reference's bundled
ordinal test case, data/SDO.rda; exercises the cutpoint sampler).

Run:  python examples/sdo_ordinal.py [--iters 1000]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from gpirt_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()  # remote compiles cost minutes; see utils/cache.py


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--burn", type=int, default=300)
    ap.add_argument("--rows", type=int, default=1500)
    args = ap.parse_args()

    from gpirt_tpu import gpirt_mcmc
    from gpirt_tpu.utils.datasets import load_sdo

    sdo = load_sdo()[: args.rows]
    print(f"SDO: {sdo.shape[0]} respondents x {sdo.shape[1]} items, codes 1..5")

    samples = gpirt_mcmc(
        sdo,
        sample_iterations=args.iters,
        burn_iterations=args.burn,
        vote_codes=None,  # already ordinal-coded
        store_fstar=True,
    )
    d = samples[0]
    thr = d["threshold"][..., 0]  # (S, m, C+1)
    print("posterior-mean cutpoints, item 1:", np.round(thr.mean(0)[0][1:-1], 2))
    fstar = d["fstar"][..., 0]  # (S, N, m)
    irf = fstar.mean(axis=0)
    print("IRF latent g(theta) for item 1 at theta = -2, 0, +2:",
          np.round(irf[[300, 500, 700], 0], 2))


if __name__ == "__main__":
    main()
