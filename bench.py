"""Benchmark: effective samples/sec on senate116 (BASELINE.json north star).

Runs the TPU-native sampler on the bundled senate116 roll-call data (binary
GP-IRT, the reference vignette workload) and reports the median effective
sample size of theta per second of sampling wall-clock.

vs_baseline compares against the single-core reference-equivalent sampler:
a faithful single-threaded C++ port of the reference's per-iteration pipeline
(native/baseline_sampler.cpp), measured on this host if buildable. The
reference itself publishes no numbers (BASELINE.md), so the baseline is
measured, not quoted. ESS-per-iteration is taken from the JAX chain for both
(same Markov kernel family), so the ratio reduces to per-iteration wall-clock
x statistical efficiency.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def run_tpu_bench(sample_iterations=2000, burn_iterations=500, n_chains=8):
    """senate116 binary GP-IRT: n_chains vmapped chains on one chip.

    The ESS is pooled across chains (chains are the TPU's free batch axis —
    the reference runs chains sequentially, R/gpirtMCMC.R:112). Theta draws
    are sign-aligned per chain before pooling (reflection invariance).
    """
    import jax
    import jax.numpy as jnp

    from gpirt_tpu.models import GPIRTConfig, make_constants
    from gpirt_tpu.parallel.chains import run_chains, chain_keys
    from gpirt_tpu.utils.datasets import senate116_response_matrix
    from gpirt_tpu.utils.diagnostics import align_theta_signs, effective_sample_size
    from gpirt_tpu.utils.response import encode_categories
    from gpirt_tpu.api import default_thresholds

    rm, _, _ = senate116_response_matrix()
    y, C, _ = encode_categories(np.asarray(rm))
    H, n, m = y.shape

    dtype = "float32"
    config = GPIRTConfig(n=n, m=m, horizon=H, C=C, dtype=dtype, jitter=1e-4)
    consts = make_constants(
        config,
        beta_prior_means=np.zeros((3, m)),
        beta_prior_sds=np.full((3, m), 3.0),
        theta_prior_means=np.zeros((2, n)),
        theta_prior_sds=np.zeros((2, n)),
    )
    thr = default_thresholds(C, m, H)
    rng = np.random.default_rng(0)
    # overdispersed per-chain inits
    theta_init = np.stack(
        [rng.permutation(np.linspace(-2, 2, n))[None] for _ in range(n_chains)]
    )  # (K, H, n)

    yj = jnp.asarray(y)

    def go(seed):
        return run_chains(
            chain_keys(seed, n_chains), yj, theta_init, thr, consts, config,
            sample_iterations=sample_iterations, burn_iterations=burn_iterations,
        )

    t_compile = time.time()
    jax.block_until_ready(go(99))
    t_compile = time.time() - t_compile

    t0 = time.time()
    draws = go(1)
    jax.block_until_ready(draws)
    wall = time.time() - t0

    theta = np.asarray(draws["theta"])[:, :, 0]  # (K, S, n)
    ref = theta[0, 0]
    aligned = np.stack([align_theta_signs(c, reference=ref) for c in theta])
    ess = effective_sample_size(aligned)  # (n,)
    ess_median = float(np.median(ess))
    total_iters = sample_iterations + burn_iterations
    return {
        "ess_median": ess_median,
        "wall": wall,
        "n_chains": n_chains,
        "iters_per_sec": total_iters / wall,  # lockstep vmapped iterations
        "ess_per_sec": ess_median / wall,
        # per-chain per-iteration statistical efficiency (for the baseline
        # extrapolation: same Markov kernel family, one chain, one core)
        "ess_per_iter": ess_median / n_chains / sample_iterations,
        "compile_sec": t_compile,
        "n": n,
        "m": m,
        "platform": jax.devices()[0].platform,
    }


def write_baseline_data(repo_root):
    """Dump the encoded senate116 matrix for the native baseline binary."""
    from gpirt_tpu.utils.datasets import senate116_response_matrix
    from gpirt_tpu.utils.response import encode_categories

    rm, _, _ = senate116_response_matrix()
    y, C, _ = encode_categories(np.asarray(rm))  # (1, n, m)
    path = os.path.join(repo_root, "native", "senate_y.txt")
    with open(path, "w") as fh:
        fh.write(f"{y.shape[1]} {y.shape[2]} {C}\n")
        for row in y[0]:
            fh.write(" ".join(map(str, row.tolist())) + "\n")
    return path


def measure_native_baseline(repo_root, iters=10):
    """Build + time the single-core C++ reference-equivalent sampler.

    Returns seconds per iteration, or None if unavailable.
    """
    src = os.path.join(repo_root, "native", "baseline_sampler.cpp")
    exe = os.path.join(repo_root, "native", "baseline_sampler")
    if not os.path.exists(src):
        return None
    try:
        write_baseline_data(repo_root)
        if (not os.path.exists(exe)) or (
            os.path.getmtime(exe) < os.path.getmtime(src)
        ):
            subprocess.run(
                ["g++", "-O2", "-std=c++17", "-o", exe, src,
                 "-l:liblapack.so.3", "-l:libblas.so.3"],
                check=True, capture_output=True, timeout=300,
            )
        out = subprocess.run(
            [exe, str(iters)], check=True, capture_output=True, timeout=1200,
            cwd=repo_root, text=True,
        )
        info = json.loads(out.stdout.strip().splitlines()[-1])
        return float(info["sec_per_iter"])
    except Exception as e:  # noqa: BLE001 — bench must degrade gracefully
        print(f"baseline unavailable: {e}", file=sys.stderr)
        return None


def main():
    repo_root = os.path.dirname(os.path.abspath(__file__))
    res = run_tpu_bench()
    baseline_sec_per_iter = measure_native_baseline(repo_root)
    if baseline_sec_per_iter:
        baseline_esps = res["ess_per_iter"] / baseline_sec_per_iter
        vs_baseline = res["ess_per_sec"] / baseline_esps
    else:
        vs_baseline = None
    print(
        json.dumps(
            {
                "metric": "effective samples/sec, senate116 GP-IRT (median theta ESS)",
                "value": round(res["ess_per_sec"], 3),
                "unit": "ess/sec",
                "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
                "detail": {
                    "iters_per_sec": round(res["iters_per_sec"], 3),
                    "n_chains": res["n_chains"],
                    "ess_median": round(res["ess_median"], 1),
                    "compile_sec": round(res["compile_sec"], 1),
                    "platform": res["platform"],
                    "baseline_sec_per_iter": baseline_sec_per_iter,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
