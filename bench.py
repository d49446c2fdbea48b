"""Benchmarks for the BASELINE.json configs. Default: the north-star metric,
effective samples/sec on senate116.

Other configs (python bench.py --config X):
  senate116  binary roll-call GP-IRT, 64 vmapped chains + SMC init (default)
  sdo        SDO ordinal-response GP-IRT (cutpoint path)
  synthetic  5k respondents x 1k items (low-rank solves at large n)
  chains64   64 chains sharded over the local device mesh, pooled R-hat/ESS
  fstar10k   dense fstar recovery on a 10k-point theta grid
  dynamic    150x60 over 10 sessions, GP time-prior regime

The default runs the TPU-native sampler on the bundled senate116 roll-call
data (binary GP-IRT, the reference vignette workload) and reports median
theta ESS per second of sampling wall-clock.

vs_baseline compares against the single-core reference-equivalent sampler:
a faithful single-threaded C++ port of the reference's per-iteration
pipeline (native/baseline_sampler.cpp), measured on this host if buildable
(the reference itself publishes no numbers, BASELINE.md). BOTH sides'
statistical efficiency is measured on matched 500-draw windows: the
baseline emits its own theta trace (ESS cached in native/baseline_ess.json)
and the TPU side uses the same per-chain estimator, so the ratio is
(measured ESS/draw ratio) x (measured wall-clock ratio) with no assumed
quantities.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
# Amortize TPU compiles across invocations. MUST go through jax.config (not
# the env var): the runtime imports jax at interpreter startup, so env vars
# set here are read too late and the cache silently stays disabled — the
# round-3 bench paid its full ~750-1000 s compile prologue on every run
# because of exactly this (see gpirt_tpu/utils/cache.py).
from gpirt_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np

_T0 = time.time()


def _log(msg):
    print(f"[bench +{time.time() - _T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


def run_tpu_bench(sample_iterations=500, burn_iterations=100, n_chains=64,
                  f_method="auto", smc_steps=320, smc_max_temp=64.0,
                  threshold_method="auto", threshold_ess_every=4):
    """senate116 binary GP-IRT: n_chains vmapped chains on one chip.

    Default pipeline: SMC annealed initialization (parallel/smc.py — the
    chain ensemble anneals T=64 -> 1 with reweighting + resampling, so
    chains land in posterior basins with correct weights; measured it
    cuts between-chain disagreement 15x and 3.7x's pooled ESS on the same
    draw budget), then a short burn and the sampling run.

    Two ESS bases, both reported:
      * within-chain, summed over chains — the SAME basis as the measured
        baseline (one chain, same draws-per-chain window), so vs_baseline
        compares like with like;
      * pooled with cross-chain variance folded in — the conservative
        number that also charges any residual cross-chain disagreement.
    Theta draws are sign-aligned per chain (reflection invariance).
    """
    import jax
    import jax.numpy as jnp
    from gpirt_tpu.utils.profiling import fetch_sync

    from gpirt_tpu.models import GPIRTConfig, make_constants
    from gpirt_tpu.parallel.chains import run_chains_chunked, chain_keys
    from gpirt_tpu.utils.datasets import senate116_response_matrix
    from gpirt_tpu.utils.diagnostics import align_theta_signs, effective_sample_size
    from gpirt_tpu.utils.response import encode_categories
    from gpirt_tpu.api import default_thresholds

    rm, _, _ = senate116_response_matrix()
    y, C, _ = encode_categories(np.asarray(rm))
    H, n, m = y.shape

    dtype = "float32"
    config = GPIRTConfig(n=n, m=m, horizon=H, C=C, dtype=dtype, jitter=1e-4,
                         f_method=f_method, threshold_method=threshold_method,
                         threshold_ess_every=threshold_ess_every)
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
        # chunked: the tunneled TPU runtime faults on device calls > ~45 s.
        # SMC init and the sampling phase are timed separately (VERDICT r2:
        # a single wall made `iters_per_sec` not a sweep rate).
        keys = chain_keys(seed, n_chains, impl=config.resolved_prng_impl)
        init_states = None
        t0 = time.time()
        if smc_steps > 0:
            from gpirt_tpu.parallel.smc import anneal_init

            init_states, info = anneal_init(
                keys, yj, theta_init, thr, consts, config,
                n_steps=smc_steps, max_temp=smc_max_temp,
            )
            fetch_sync(init_states)
            _log(f"smc init (seed {seed}): {info['n_resamples']} resamples, "
                 f"final weight-ESS {info['final_weight_ess']:.1f}")
        smc_wall = time.time() - t0
        t0 = time.time()
        draws = run_chains_chunked(
            keys, yj, theta_init, thr, consts, config,
            sample_iterations=sample_iterations, burn_iterations=burn_iterations,
            chunk_iterations=250, initial_states=init_states,
        )
        fetch_sync(draws)
        return draws, smc_wall, time.time() - t0

    _log("warmup/compile start")
    t_compile = time.time()
    go(99)
    t_compile = time.time() - t_compile
    _log(f"warmup done ({t_compile:.1f}s); timed runs start")

    # ESS computed ON DEVICE: shipping the multi-MB draw array through the
    # tunneled device->host path can take minutes; only (n,) scalars return.
    from gpirt_tpu.utils.diagnostics import effective_sample_size_device

    pooled_j = jax.jit(effective_sample_size_device)

    @jax.jit
    def _within(th):  # per-chain ESS summed over chains, (n,)
        per = jax.vmap(lambda c: effective_sample_size_device(c[None]))(th)
        return jnp.sum(per, axis=0)

    # the per-seed median-within ESS of a 64-chain campaign varies ~2-3x
    # across seeds (the SMC placement and the soft-mode basin draw are a
    # lottery; measured seeds 1-3: within 2045/2570/6737); five timed
    # seeds (~5.5 s each) make the recorded rate a campaign average
    # instead of one ticket
    seeds, within_m, pooled_m = (1, 2, 3, 4, 5), [], []
    smc_wall = samp_wall = 0.0
    for s in seeds:
        draws, smc_w, samp_w = go(s)
        smc_wall += smc_w
        samp_wall += samp_w
        theta = draws["theta"][:, :, 0]  # (K, S, n)
        within_m.append(float(np.median(np.asarray(_within(theta)))))
        pooled_m.append(float(np.median(np.asarray(pooled_j(theta)))))
        _log(f"timed seed {s}: smc {smc_w:.1f}s + sampling {samp_w:.1f}s, "
             f"within {within_m[-1]:.0f}, pooled {pooled_m[-1]:.0f}")
    wall = smc_wall + samp_wall
    total_iters = (sample_iterations + burn_iterations) * len(seeds)
    within_sum, pooled_sum = sum(within_m), sum(pooled_m)
    return {
        "ess_within_median": within_sum / len(seeds),
        "ess_pooled_median": pooled_sum / len(seeds),
        "ess_within_per_seed": within_m,
        "ess_pooled_per_seed": pooled_m,
        "n_seeds": len(seeds),
        "wall": wall,
        "smc_sec": smc_wall,
        "sampling_sec": samp_wall,
        "n_chains": n_chains,
        "n_draws": sample_iterations,
        # lockstep vmapped sweep rate, SAMPLING phase only (the SMC init is
        # a fixed prologue, reported separately as smc_sec)
        "iters_per_sec": total_iters / samp_wall,
        # the headline ess/sec still charges the FULL wall incl. SMC — the
        # annealing is part of the cost of the draws
        "ess_per_sec": within_sum / wall,
        "ess_pooled_per_sec": pooled_sum / wall,
        # per-chain per-draw statistical efficiency on this window length —
        # directly comparable to the baseline's measured ess_per_iter when
        # the windows match (both 500 draws by default)
        "ess_per_iter": within_sum / len(seeds) / n_chains / sample_iterations,
        "compile_sec": t_compile,
        "n": n,
        "m": m,
        "platform": jax.devices()[0].platform,
    }


def run_pooled_opt_phase(n_campaigns=5, n_chains=64, draws=100, burn=25,
                         smc_steps=160, threshold_method="newton"):
    """Pooled-basis-optimal schedule: short independent campaigns.

    The round-4 response surface (RESULTS.md "pooled-basis study",
    scripts/tune_pooled.py) measured pooled theta-ESS per campaign to be
    FLAT in the draw budget (~2.3/chain — the rank-normalized estimator
    saturates on between-chain basin disagreement), so pooled ESS/sec is
    maximized by the cheapest independent campaign: a short SMC anneal, a
    token burn, ~100 draws, and the Newton-MH cutpoint kernel (+28% sweep
    rate, same y-marginal conditional; within-chain autocorrelation is not
    scored on this basis). Measured 84 pooled ESS/sec vs 29 at the r3
    schedule.
    """
    import jax
    import jax.numpy as jnp
    from gpirt_tpu.utils.profiling import fetch_sync

    from gpirt_tpu.models import GPIRTConfig, make_constants
    from gpirt_tpu.parallel.chains import run_chains_chunked, chain_keys
    from gpirt_tpu.parallel.smc import anneal_init
    from gpirt_tpu.utils.datasets import senate116_response_matrix
    from gpirt_tpu.utils.diagnostics import effective_sample_size_device
    from gpirt_tpu.utils.response import encode_categories
    from gpirt_tpu.api import default_thresholds

    rm, _, _ = senate116_response_matrix()
    y, C, _ = encode_categories(np.asarray(rm))
    H, n, m = y.shape
    config = GPIRTConfig(n=n, m=m, horizon=H, C=C, dtype="float32",
                         jitter=1e-4, threshold_method=threshold_method)
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
        [rng.permutation(np.linspace(-2, 2, n))[None]
         for _ in range(n_chains)]
    )
    yj = jnp.asarray(y)
    pooled_j = jax.jit(effective_sample_size_device)

    def campaign(seed):
        keys = chain_keys(seed, n_chains, impl=config.resolved_prng_impl)
        t0 = time.time()
        states, info = anneal_init(keys, yj, theta_init, thr, consts, config,
                                   n_steps=smc_steps)
        fetch_sync(states)
        dr = run_chains_chunked(
            keys, yj, theta_init, thr, consts, config,
            sample_iterations=draws, burn_iterations=burn,
            chunk_iterations=250, initial_states=states,
        )
        pooled = float(np.median(np.asarray(pooled_j(dr["theta"][:, :, 0]))))
        return pooled, time.time() - t0, info["final_weight_ess"]

    campaign(99)  # warm/compile
    pooled_l, wall_l, wess_l = [], [], []
    for s in range(1, n_campaigns + 1):
        p, w, we = campaign(s)
        pooled_l.append(p)
        wall_l.append(w)
        wess_l.append(we)
        _log(f"pooled-opt campaign {s}: {w:.2f}s, pooled {p:.0f}, "
             f"weight-ESS {we:.1f}/{n_chains}")
    return {
        "ess_pooled_per_sec_opt": sum(pooled_l) / sum(wall_l),
        "pooled_med_opt": sum(pooled_l) / len(pooled_l),
        "campaign_wall_opt": sum(wall_l) / len(wall_l),
        "schedule_opt": {
            "n_chains": n_chains, "draws": draws, "burn": burn,
            "smc_steps": smc_steps, "threshold_method": threshold_method,
            "n_campaigns": n_campaigns,
        },
    }


def run_campaign_phase(n_campaigns=12, n_seeds=3):
    """The productized campaign estimator (gpirt_tpu.campaigns) at the
    measured frontier schedule, ALL campaigns batched into one device
    program per stage (anneal_init_batched + one lane-stacked sampling
    run).

    Reports three rates:
      * ess_pooled_per_sec_opt — the pooled rank-normalized basis realized
        by the batch (comparable to round 4's 83.3/s sequential-campaign
        measurement; the batching A/B);
      * ess_campaign_per_sec — the campaign-replicated implied ESS per
        second, the honest basis (the calibration gate's estimator: ESS
        defined by var(grand mean) = posterior_var / ESS, paid by
        across-campaign variance);
      * campaign_wall — wall per batch of n_campaigns.
    """
    from gpirt_tpu.campaigns import gpirt_campaigns
    from gpirt_tpu.utils.datasets import senate116_response_matrix

    rm, _, _ = senate116_response_matrix()
    data = np.asarray(rm)
    kw = dict(n_campaigns=n_campaigns, vote_codes=None, verbose=False,
              store_draws=False)

    gpirt_campaigns(data, SEED=990001, **kw)  # warm/compile
    pooled_rate, camp_ess, camp_se, walls = [], [], [], []
    for s in range(1, n_seeds + 1):
        out = gpirt_campaigns(data, SEED=s * 100000, **kw)
        w = out["walls"]["total_sec"]
        pooled = float(np.sum(out["pooled_ess_per_campaign"]))
        pooled_rate.append(pooled / w)
        camp_ess.append(out["ess_campaign_median"])
        camp_se.append(float(np.median(out["theta_se"])))
        walls.append(w)
        _log(f"campaign batch seed {s}: {n_campaigns} campaigns in {w:.2f}s"
             f" ({w / n_campaigns:.2f}s/campaign), pooled sum {pooled:.0f}"
             f" ({pooled / w:.1f}/s), implied campaign ESS "
             f"{out['ess_campaign_median']:.1f}, theta SE med "
             f"{np.median(out['theta_se']):.4f}")
    wall = sum(walls) / len(walls)
    return {
        "ess_pooled_per_sec_opt": sum(pooled_rate) / len(pooled_rate),
        "ess_campaign_per_sec": sum(camp_ess) / sum(walls),
        "ess_campaign_median": sum(camp_ess) / len(camp_ess),
        "theta_se_median": sum(camp_se) / len(camp_se),
        "campaign_wall": wall / n_campaigns,
        "batch_wall": wall,
        "n_campaigns": n_campaigns,
        "schedule_opt": {"api": "gpirt_campaigns", "batched": True,
                         "n_campaigns": n_campaigns},
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
        # best of 3: host-load noise only ever ADDS time to the single-core
        # run (measured spread 0.65-1.08 s/iter across bench invocations),
        # and an inflated baseline flatters vs_baseline
        best = None
        for _ in range(3):
            out = subprocess.run(
                [exe, str(iters)], check=True, capture_output=True,
                timeout=1200, cwd=repo_root, text=True,
            )
            info = json.loads(out.stdout.strip().splitlines()[-1])
            sec = float(info["sec_per_iter"])
            best = sec if best is None else min(best, sec)
        return best
    except Exception as e:  # noqa: BLE001 — bench must degrade gracefully
        print(f"baseline unavailable: {e}", file=sys.stderr)
        return None


def measure_baseline_ess(repo_root, iters=600, burn=100):
    """The baseline's OWN theta ESS per iteration (cached after first run).

    Round 1 assumed the baseline's per-iteration statistical efficiency
    equals the JAX chain's (VERDICT r1 weak item 8); here it is measured:
    the single-core sampler writes its post-burn theta trace and the
    standard ESS estimator runs on it. ~minutes once; cached in
    native/baseline_ess.json.
    """
    cache = os.path.join(repo_root, "native", "baseline_ess.json")
    if os.path.exists(cache):
        with open(cache) as fh:
            return json.load(fh)
    src = os.path.join(repo_root, "native", "baseline_sampler.cpp")
    exe = os.path.join(repo_root, "native", "baseline_sampler")
    data = os.path.join(repo_root, "native", "senate_y.txt")
    trace = os.path.join(repo_root, "native", "baseline_theta_trace.txt")
    if not os.path.exists(exe) or os.path.getmtime(exe) < os.path.getmtime(src):
        return None  # measure_native_baseline builds it first
    try:
        subprocess.run(
            [exe, str(iters), data, str(burn), trace],
            check=True, capture_output=True, timeout=3000, cwd=repo_root,
        )
        from gpirt_tpu.utils.diagnostics import effective_sample_size

        draws = np.loadtxt(trace)  # (S, n)
        S = draws.shape[0]
        ess = effective_sample_size(draws[None])
        info = {
            "ess_median": float(np.median(ess)),
            "draws": int(S),
            "iters": iters,
            "burn": burn,
            "ess_per_iter": float(np.median(ess)) / S,
        }
        with open(cache, "w") as fh:
            json.dump(info, fh)
        os.unlink(trace)
        return info
    except Exception as e:  # noqa: BLE001
        print(f"baseline ESS unavailable: {e}", file=sys.stderr)
        return None


def _ess_summary(theta):
    """(within, pooled) median theta-ESS from device-resident draws.

    theta: (K, S, ...) lane-stacked draws. Same bases as the senate
    headline: within = per-chain ESS summed over chains (median over
    params); pooled = Stan-style rank-normalized pooled ESS (median) —
    both computed on device so the draw cube never crosses the tunnel.
    """
    import jax
    import jax.numpy as jnp
    from gpirt_tpu.utils.diagnostics import effective_sample_size_device

    K, S = theta.shape[:2]
    th = theta.reshape(K, S, -1)
    per = jax.jit(jax.vmap(
        lambda x: effective_sample_size_device(x[None])))(th)  # (K, P)
    within = float(jnp.median(jnp.sum(per, axis=0)))
    pooled = float(jnp.median(jax.jit(effective_sample_size_device)(th)))
    return within, pooled


def bench_sdo(sample_iterations=500, burn_iterations=200, n_chains=64):
    """SDO ordinal config: effective samples/sec on the full 1500x16,
    C=5 survey (64 batched chains — lane-batching is nearly free at this
    small m, measured 4941 chain-iters/sec at K=64 vs 432 at K=8 on the
    v5e chip; ESS methodology matching senate116)."""
    import jax
    import jax.numpy as jnp
    from gpirt_tpu.utils.profiling import fetch_sync

    from gpirt_tpu.models import GPIRTConfig, make_constants
    from gpirt_tpu.parallel.chains import chain_keys, run_chains_chunked
    from gpirt_tpu.utils.datasets import load_sdo
    from gpirt_tpu.utils.response import encode_categories
    from gpirt_tpu.api import default_thresholds

    y, C, _ = encode_categories(load_sdo())
    H, n, m = y.shape
    config = GPIRTConfig(n=n, m=m, horizon=H, C=C, dtype="float32")
    consts = make_constants(config, np.zeros((3, m)), np.full((3, m), 3.0),
                            np.zeros((2, n)), np.zeros((2, n)))
    thr = default_thresholds(C, m, H)
    rng = np.random.default_rng(0)
    ti = np.stack([
        rng.permutation(np.linspace(-2, 2, n))[None] for _ in range(n_chains)
    ])  # (K, 1, n)
    yj = jnp.asarray(y)

    def go(seed):
        return run_chains_chunked(
            chain_keys(seed, n_chains, impl=config.resolved_prng_impl),
            yj, ti, thr, consts, config,
            sample_iterations=sample_iterations,
            burn_iterations=burn_iterations, chunk_iterations=250,
        )

    fetch_sync(go(9))
    t0 = time.time()
    d = go(1)
    fetch_sync(d)
    wall = time.time() - t0  # sampling wall only (senate methodology);
    within, pooled = _ess_summary(d["theta"])  # diagnostics off the clock
    total = (sample_iterations + burn_iterations) * n_chains
    return {"metric": "effective samples/sec, SDO ordinal GP-IRT "
                      "(1500x16, C=5, median theta ESS)",
            "value": round(within / wall, 2), "unit": "ess/sec",
            "vs_baseline": None,
            "detail": {"iters_per_sec": round(total / wall, 2),
                       "n_chains": n_chains,
                       "ess_within_median": round(within, 1),
                       "ess_pooled_median": round(pooled, 1),
                       "ess_pooled_per_sec": round(pooled / wall, 2),
                       "ll_final": float(np.asarray(d["ll"])[0, -1]),
                       "platform": jax.devices()[0].platform}}


def bench_synthetic(n=5000, m=1000, sample_iterations=150, burn_iterations=30,
                    n_chains=4):
    """5k x 1k synthetic: large gathered Gram + Cholesky, batched ESS;
    effective samples/sec over 4 batched chains (HBM bounds the lane
    count at this shape — f + fstar are ~25 MB/lane)."""
    import jax
    import jax.numpy as jnp
    from gpirt_tpu.utils.profiling import fetch_sync

    from gpirt_tpu.models import GPIRTConfig, make_constants
    from gpirt_tpu.parallel.chains import chain_keys, run_chains_chunked
    from gpirt_tpu.utils.datasets import simulate_2pl
    from gpirt_tpu.utils.response import encode_categories
    from gpirt_tpu.api import default_thresholds

    _, raw = simulate_2pl(0, n=n, m=m, missing=0.1)
    y, C, _ = encode_categories(raw)
    config = GPIRTConfig(n=n, m=m, horizon=1, C=C, dtype="float32")
    consts = make_constants(config, np.zeros((3, m)), np.full((3, m), 3.0),
                            np.zeros((2, n)), np.zeros((2, n)))
    thr = default_thresholds(C, m, 1)
    rng = np.random.default_rng(0)
    ti = np.stack([
        rng.permutation(np.linspace(-3, 3, n))[None] for _ in range(n_chains)
    ])
    yj = jnp.asarray(y)

    def go(seed):
        return run_chains_chunked(
            chain_keys(seed, n_chains, impl=config.resolved_prng_impl),
            yj, ti, thr, consts, config,
            sample_iterations=sample_iterations,
            burn_iterations=burn_iterations, chunk_iterations=250,
        )

    fetch_sync(go(9))
    t0 = time.time()
    d = go(1)
    fetch_sync(d)
    wall = time.time() - t0  # sampling wall only (senate methodology);
    within, pooled = _ess_summary(d["theta"])  # diagnostics off the clock
    total = (sample_iterations + burn_iterations) * n_chains
    return {"metric": f"effective samples/sec, synthetic {n}x{m} GP-IRT "
                      "(median theta ESS)",
            "value": round(within / wall, 2), "unit": "ess/sec",
            "vs_baseline": None,
            "detail": {"iters_per_sec": round(total / wall, 2),
                       "n_chains": n_chains,
                       "ess_within_median": round(within, 1),
                       "ess_pooled_median": round(pooled, 1),
                       "ess_pooled_per_sec": round(pooled / wall, 2),
                       "ll_final": float(np.asarray(d["ll"])[0, -1]),
                       "platform": jax.devices()[0].platform}}


def bench_dynamic(n=150, m=60, horizon=10, sample_iterations=300,
                  burn_iterations=100, n_chains=64):
    """Dynamic theta over 10 sessions (GP time-prior regime), 64 chains
    (measured K=64 vs 16: 1536 vs 508 chain-iters/sec and 363 vs 110
    ess/sec on the v5e chip - lane-batching amortizes; truth-corr 0.934
    vs 0.834 from the larger aligned ensemble).

    Exercises the reference's hardest configuration — the theta GP over
    sessions (src/draw-theta.cpp:206-236) with per-horizon latent blocks —
    at a scale (n*H = 1500 trait values) the single-core reference takes
    seconds per iteration on.
    """
    import jax
    import jax.numpy as jnp
    from gpirt_tpu.utils.profiling import fetch_sync

    from gpirt_tpu.models import GPIRTConfig, make_constants
    from gpirt_tpu.parallel.chains import chain_keys, run_chains_chunked
    from gpirt_tpu.utils.datasets import simulate_dynamic
    from gpirt_tpu.utils.response import encode_categories
    from gpirt_tpu.api import default_thresholds

    truth, raw = simulate_dynamic(0, n=n, m=m, horizon=horizon, missing=0.1)
    y, C, _ = encode_categories(raw)
    config = GPIRTConfig(n=n, m=m, horizon=horizon, C=C, dtype="float32",
                         theta_os=1.0, theta_ls=2.0)  # GP regime
    assert config.theta_regime == "GP"
    consts = make_constants(config, np.zeros((3, m)), np.full((3, m), 3.0),
                            np.zeros((2, n)), np.zeros((2, n)))
    thr = default_thresholds(C, m, horizon)
    rng = np.random.default_rng(0)
    ti = np.stack([
        np.tile(rng.permutation(np.linspace(-2, 2, n))[None], (horizon, 1))
        for _ in range(n_chains)
    ])
    yj = jnp.asarray(y)

    def go(seed):
        return run_chains_chunked(
            chain_keys(seed, n_chains, impl=config.resolved_prng_impl), yj, ti, thr, consts, config,
            sample_iterations=sample_iterations,
            burn_iterations=burn_iterations, chunk_iterations=200,
        )

    fetch_sync(go(9))
    t0 = time.time()
    d = go(1)
    fetch_sync(d)
    wall = time.time() - t0  # sampling wall only (senate methodology);
    within, pooled = _ess_summary(d["theta"])  # diagnostics off the clock
    total = (sample_iterations + burn_iterations) * n_chains
    # posterior-mean drift recovery vs truth (chains sign-aligned first —
    # the reflection mode makes an unaligned pooled mean cancel)
    ch_means = np.asarray(jnp.mean(d["theta"], axis=1))  # (K, H, n)
    tt = np.ascontiguousarray(truth.T)  # (H, n)
    sign = np.sign(np.sum(ch_means * tt[None], axis=(1, 2), keepdims=True))
    sign[sign == 0] = 1
    th = (ch_means * sign).mean(axis=0)  # (H, n)
    r = abs(np.corrcoef(th.ravel(), tt.ravel())[0, 1])
    return {"metric": f"effective samples/sec, dynamic GP-theta "
                      f"{n}x{m}xH{horizon} (median theta ESS)",
            "value": round(within / wall, 2), "unit": "ess/sec",
            "vs_baseline": None,
            "detail": {"iters_per_sec": round(total / wall, 2),
                       "n_chains": n_chains, "truth_corr": round(float(r), 3),
                       "ess_within_median": round(within, 1),
                       "ess_pooled_median": round(pooled, 1),
                       "ess_pooled_per_sec": round(pooled / wall, 2),
                       "ll_final": float(np.asarray(d["ll"])[0, -1]),
                       "platform": jax.devices()[0].platform}}


def bench_chains64(sample_iterations=300, burn_iterations=100):
    """64 chains over the local device mesh with pooled R-hat/ESS."""
    import jax
    import jax.numpy as jnp
    from gpirt_tpu.utils.profiling import fetch_sync

    from gpirt_tpu.models import GPIRTConfig, make_constants
    from gpirt_tpu.parallel import run_chains, make_chain_mesh, chain_keys
    from gpirt_tpu.utils.datasets import senate116_response_matrix
    from gpirt_tpu.utils.diagnostics import align_theta_signs, effective_sample_size, split_rhat
    from gpirt_tpu.utils.response import encode_categories
    from gpirt_tpu.api import default_thresholds

    rm, _, _ = senate116_response_matrix()
    y, C, _ = encode_categories(np.asarray(rm))
    H, n, m = y.shape
    config = GPIRTConfig(n=n, m=m, horizon=H, C=C, dtype="float32")
    consts = make_constants(config, np.zeros((3, m)), np.full((3, m), 3.0),
                            np.zeros((2, n)), np.zeros((2, n)))
    thr = default_thresholds(C, m, H)
    rng = np.random.default_rng(0)
    K = 64
    ti = np.stack([rng.permutation(np.linspace(-2, 2, n))[None] for _ in range(K)])
    mesh = make_chain_mesh() if jax.device_count() > 1 else None
    yj = jnp.asarray(y)

    t0 = time.time()
    d = run_chains(chain_keys(1, K, impl=config.resolved_prng_impl), yj, ti, thr, consts, config,
                   sample_iterations=sample_iterations,
                   burn_iterations=burn_iterations, mesh=mesh)
    fetch_sync(d)
    wall = time.time() - t0  # includes compile; chains64 is a scale demo
    theta = np.asarray(d["theta"])[:, :, 0]
    ref = theta[0, 0]
    aligned = np.stack([align_theta_signs(c, reference=ref) for c in theta])
    ess = effective_sample_size(aligned)
    rh = split_rhat(aligned)
    return {"metric": "pooled theta ESS/sec, 64 chains on local mesh",
            "value": round(float(np.median(ess)) / wall, 3),
            "unit": "ess/sec", "vs_baseline": None,
            "detail": {"devices": jax.device_count(),
                       "rhat_max": round(float(np.nanmax(rh)), 3),
                       "wall_incl_compile": round(wall, 1),
                       "platform": jax.devices()[0].platform}}


def bench_fstar10k(grid_size=10001):
    """Dense fstar recovery on a 10k-point grid (batched conditional GP)."""
    import jax

    from gpirt_tpu.api import gpirt_mcmc, recover_fstar
    from gpirt_tpu.utils.datasets import simulate_2pl
    from gpirt_tpu.utils.response import as_response_matrix

    _, raw = simulate_2pl(0, n=100, m=50)
    codes = {"yea": 1, "nay": 0, "missing": None}
    out = gpirt_mcmc(raw, 2, 0, vote_codes=codes, store_f=True, verbose=False)
    d = out[0]
    rm = np.asarray(as_response_matrix(raw, codes, verbose=False))
    # warm-up at the target grid
    recover_fstar(1, d["f"][-1], rm, d["theta"][-1], d["beta"][-1],
                  d["threshold"][-1], grid_size=grid_size)
    t0 = time.time()
    rec = recover_fstar(2, d["f"][-1], rm, d["theta"][-1], d["beta"][-1],
                        d["threshold"][-1], grid_size=grid_size)
    wall = time.time() - t0
    assert np.isfinite(rec["fstar"]).all()
    return {"metric": f"dense fstar recovery, {grid_size}-point grid (n=100, m=50)",
            "value": round(wall, 3), "unit": "sec", "vs_baseline": None,
            "detail": {"platform": jax.devices()[0].platform}}


def bench_campaigns8(n_campaigns=8):
    """Campaign scaling over whatever devices exist (VERDICT r4 item 8).

    Shards n_campaigns over a campaign mesh when multiple devices are
    available (embarrassingly parallel — near-linear pooled scaling);
    single-chip it measures the batched-campaign program."""
    import jax

    mesh, use = None, 1
    n_dev = len(jax.devices())
    if n_dev > 1:
        from jax.sharding import Mesh

        use = n_dev
        while n_campaigns % use:
            use -= 1
        mesh = Mesh(np.array(jax.devices()[:use]), ("campaigns",))
        _log(f"campaign mesh: {use} devices x "
             f"{n_campaigns // use} campaigns each")

    from gpirt_tpu.campaigns import gpirt_campaigns
    from gpirt_tpu.utils.datasets import senate116_response_matrix

    rm, _, _ = senate116_response_matrix()
    data = np.asarray(rm)
    kw = dict(n_campaigns=n_campaigns, vote_codes=None, verbose=False,
              store_draws=False, mesh=mesh)
    gpirt_campaigns(data, SEED=990001, **kw)  # warm/compile
    out = gpirt_campaigns(data, SEED=100000, **kw)
    w = out["walls"]["total_sec"]
    pooled = float(np.sum(out["pooled_ess_per_campaign"]))
    return {
        "metric": f"pooled ess/sec, {n_campaigns} campaigns over "
                  f"{use} device(s)",
        "value": round(pooled / w, 3), "unit": "ess/sec",
        "vs_baseline": None,
        "detail": {
            "n_campaigns": n_campaigns,
            "n_devices": use,
            "batch_wall": round(w, 3),
            "ess_campaign_median": round(out["ess_campaign_median"], 2),
            "ess_campaign_per_sec": round(out["ess_campaign_median"] / w, 3),
            "theta_se_median": round(float(np.median(out["theta_se"])), 5),
            "platform": jax.devices()[0].platform,
        },
    }


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="senate116",
                    choices=["senate116", "sdo", "synthetic", "chains64",
                             "fstar10k", "dynamic", "campaigns8"])
    ap.add_argument("--f-method", default="auto",
                    choices=["auto", "conjugate", "grid", "two_stage"])
    ap.add_argument("--smc-steps", type=int, default=320,
                    help="SMC annealed-init steps (0 disables)")
    ap.add_argument("--threshold-method", default="auto",
                    choices=["auto", "ess", "collapsed", "interleave",
                             "newton"],
                    help="cutpoint update (A/B: collapsed z-box draw vs "
                         "y-marginal delta ESS vs their interleave vs "
                         "Newton independence MH)")
    ap.add_argument("--threshold-ess-every", type=int, default=4,
                    help="interleave period k (marginal ESS on i %% k == 0)")
    args = ap.parse_args()
    repo_root = os.path.dirname(os.path.abspath(__file__))

    if args.config != "senate116":
        fn = {"sdo": bench_sdo, "synthetic": bench_synthetic,
              "chains64": bench_chains64, "fstar10k": bench_fstar10k,
              "dynamic": bench_dynamic,
              "campaigns8": bench_campaigns8}[args.config]
        print(json.dumps(fn()))
        return

    res = run_tpu_bench(f_method=args.f_method, smc_steps=args.smc_steps,
                        threshold_method=args.threshold_method,
                        threshold_ess_every=args.threshold_ess_every)
    _log("matched-basis phase done; campaign-estimator phase")
    try:
        pooled_opt = run_campaign_phase()
    except Exception as e:  # noqa: BLE001 — bench must degrade gracefully
        print(f"campaign phase failed ({e}); pooled-opt fallback",
              file=sys.stderr)
        try:
            pooled_opt = run_pooled_opt_phase()
        except Exception as e2:  # noqa: BLE001
            print(f"pooled-opt phase unavailable: {e2}", file=sys.stderr)
            pooled_opt = {}
    _log("tpu bench done; measuring native baseline")
    baseline_sec_per_iter = measure_native_baseline(repo_root)
    baseline_ess = measure_baseline_ess(repo_root)
    _log("baseline done")
    if baseline_sec_per_iter:
        # vs_baseline on a MATCHED basis: within-chain ESS per wall-second,
        # both sides measured on the same per-chain window length (500
        # post-burn draws); the baseline's own statistical efficiency is
        # measured from its emitted theta trace (VERDICT r1 item 8), not
        # assumed.
        base_eff = (baseline_ess or {}).get("ess_per_iter", res["ess_per_iter"])
        baseline_esps = base_eff / baseline_sec_per_iter
        vs_baseline = res["ess_per_sec"] / baseline_esps
        # the baseline is ONE chain, so its pooled basis IS its within
        # basis — the same ess/sec denominator serves both comparisons
        vs_baseline_pooled = (
            pooled_opt["ess_pooled_per_sec_opt"] / baseline_esps
            if pooled_opt else None
        )
    else:
        vs_baseline = None
        vs_baseline_pooled = None
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
                    "n_draws_per_chain": res["n_draws"],
                    "ess_within_median": round(res["ess_within_median"], 1),
                    "ess_pooled_median": round(res["ess_pooled_median"], 1),
                    "ess_pooled_per_sec": round(res["ess_pooled_per_sec"], 3),
                    # pooled-basis-optimal schedule (RESULTS.md pooled
                    # study): short independent campaigns; the honest
                    # conservative basis at its measured best
                    "ess_pooled_per_sec_opt": round(
                        pooled_opt["ess_pooled_per_sec_opt"], 3)
                    if pooled_opt else None,
                    # campaign-replicated basis: the calibration gate's
                    # honest estimator, now a user API (gpirt_campaigns)
                    "ess_campaign_per_sec": round(
                        pooled_opt["ess_campaign_per_sec"], 3)
                    if pooled_opt.get("ess_campaign_per_sec") else None,
                    "vs_baseline_pooled": round(vs_baseline_pooled, 2)
                    if vs_baseline_pooled else None,
                    "pooled_opt": pooled_opt or None,
                    "compile_sec": round(res["compile_sec"], 1),
                    "platform": res["platform"],
                    "baseline_sec_per_iter": baseline_sec_per_iter,
                    "baseline_ess_per_iter": (baseline_ess or {}).get("ess_per_iter"),
                    "tpu_ess_per_iter": round(res["ess_per_iter"], 6),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
