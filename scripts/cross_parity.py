"""Cross-implementation posterior parity: JAX/TPU sampler vs the independent
single-core C++ baseline on senate116.

BASELINE.json's correctness bar is "posteriors within MC error". The two
implementations share no code (different languages, linear algebra, RNGs,
and update mechanics: grid-conditional vs ESS-snap theta), so agreement of
their posterior means is strong evidence both target the same distribution.

Both samplers start from the same deterministic init (theta = linspace(-2,2))
and their sign-aligned posterior-mean thetas are correlated. Prints a JSON
summary; exits nonzero if |r| < 0.95.

Run: python scripts/cross_parity.py [--cpp-iters 600] [--jax-iters 3000]
(~5 min: the C++ side is single-core at ~0.4 s/iter.)
"""

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(ROOT, ".jax_cache"))


from gpirt_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()  # env var alone is read too early; see utils/cache.py
import numpy as np


def run_cpp(iters, burn):
    import bench

    bench.write_baseline_data(ROOT)
    exe = os.path.join(ROOT, "native", "baseline_sampler")
    src = os.path.join(ROOT, "native", "baseline_sampler.cpp")
    subprocess.run(
        ["g++", "-O2", "-std=c++17", "-o", exe, src,
         "-l:liblapack.so.3", "-l:libblas.so.3"],
        check=True, capture_output=True, timeout=300,
    )
    out = subprocess.run(
        [exe, str(iters), "native/senate_y.txt", str(burn)],
        check=True, capture_output=True, text=True, cwd=ROOT, timeout=3600,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def run_jax(iters, burn):
    import jax
    import jax.numpy as jnp

    from gpirt_tpu.models import GPIRTConfig, make_constants
    from gpirt_tpu.models.sampler import run_chain
    from gpirt_tpu.utils.datasets import senate116_response_matrix
    from gpirt_tpu.utils.diagnostics import align_theta_signs
    from gpirt_tpu.utils.response import encode_categories
    from gpirt_tpu.api import default_thresholds

    rm, _, _ = senate116_response_matrix()
    y, C, _ = encode_categories(np.asarray(rm))
    H, n, m = y.shape
    config = GPIRTConfig(n=n, m=m, horizon=H, C=C, dtype="float32")
    consts = make_constants(config, np.zeros((3, m)), np.full((3, m), 3.0),
                            np.zeros((2, n)), np.zeros((2, n)))
    thr = default_thresholds(C, m, H)
    ti = np.linspace(-2, 2, n)[None]
    d = run_chain(jax.random.key(7), jnp.asarray(y), ti, thr, consts, config,
                  sample_iterations=iters, burn_iterations=burn)
    theta = np.asarray(d["theta"])[:, 0]  # (S, n)
    aligned = align_theta_signs(theta, reference=np.linspace(-2, 2, n))
    return aligned.mean(axis=0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpp-iters", type=int, default=600)
    ap.add_argument("--cpp-burn", type=int, default=200)
    ap.add_argument("--jax-iters", type=int, default=3000)
    ap.add_argument("--jax-burn", type=int, default=800)
    args = ap.parse_args()

    t0 = time.time()
    jax_mean = run_jax(args.jax_iters, args.jax_burn)
    t_jax = time.time() - t0
    t0 = time.time()
    cpp = run_cpp(args.cpp_iters, args.cpp_burn)
    t_cpp = time.time() - t0

    cpp_mean = np.asarray(cpp["theta_mean"])
    # both sign-aligned to the same init direction
    ref = np.linspace(-2, 2, len(cpp_mean))
    if np.dot(cpp_mean, ref) < 0:
        cpp_mean = -cpp_mean
    r = float(np.corrcoef(jax_mean, cpp_mean)[0, 1])
    rmse = float(np.sqrt(np.mean((jax_mean - cpp_mean) ** 2)))
    print(json.dumps({
        "metric": "cross-implementation posterior-mean theta correlation (senate116)",
        "r": round(r, 4),
        "rmse": round(rmse, 4),
        "jax": {"iters": args.jax_iters, "wall_sec": round(t_jax, 1)},
        "cpp": {"iters": args.cpp_iters, "wall_sec": round(t_cpp, 1),
                "sec_per_iter": cpp["sec_per_iter"]},
    }))
    if abs(r) < 0.95:
        sys.exit(1)


if __name__ == "__main__":
    main()
