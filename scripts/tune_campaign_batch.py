"""Campaign-batch amortization sweep (round 5, VERDICT r4 item 1 closeout).

The batched campaign estimator measured 98 pooled-ESS/sec at R=8 on one
chip (vs 83.3 sequential, round 4). The chip is compute-saturated at
K=64 lanes per campaign, so the only remaining single-chip lever is
amortizing the per-batch fixed cost (dispatch, SMC control flow, the
estimator) over more campaigns per program. This sweep measures R in
{8, 12, 16} at the frontier schedule and records whether the pooled
basis crosses 100/s or where its single-chip ceiling is.

Usage: python scripts/tune_campaign_batch.py [R ...]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from gpirt_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from gpirt_tpu.campaigns import gpirt_campaigns
from gpirt_tpu.utils.datasets import senate116_response_matrix


def main():
    rs = [int(a) for a in sys.argv[1:]] or [8, 12, 16]
    rm, _, _ = senate116_response_matrix()
    data = np.asarray(rm)
    for R in rs:
        kw = dict(n_campaigns=R, vote_codes=None, verbose=False,
                  store_draws=False)
        t0 = time.time()
        gpirt_campaigns(data, SEED=990001, **kw)  # warm/compile
        print(f"R={R}: compile+warm {time.time() - t0:.1f}s", flush=True)
        for s in (1, 2, 3):
            out = gpirt_campaigns(data, SEED=s * 100000, **kw)
            w = out["walls"]["total_sec"]
            pooled = float(np.sum(out["pooled_ess_per_campaign"]))
            print(
                f"R={R} seed {s}: {w:.2f}s ({w / R:.2f}s/campaign), "
                f"pooled sum {pooled:.0f} -> {pooled / w:.1f}/s, "
                f"implied campaign ESS {out['ess_campaign_median']:.2f}, "
                f"theta SE med {float(np.median(out['theta_se'])):.4f}, "
                f"weight-ESS med "
                f"{float(np.median(out['final_weight_ess'])):.1f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
