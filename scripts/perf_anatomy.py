"""Per-block perf anatomy: device timings + analytic flops model + MFU.

VERDICT r1 item 7: decompose the sweep cost at the bench shapes so kernel
work is data-driven. Times each conjugate-path Gibbs block ON DEVICE
(vmapped over chains, scanned inside one jit — one dispatch per block) and
compares against an analytic flop count per block, giving achieved FLOP/s
and MFU vs the chip's f32 peak.

Usage:
  python scripts/perf_anatomy.py                  # senate116 x 64 chains
  python scripts/perf_anatomy.py --shape sdo      # SDO (n=1500 rows kept)
  python scripts/perf_anatomy.py --shape large    # synthetic 5000 x 1000
"""

import argparse
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

# v5e: 197 TFLOP/s bf16 MXU peak per chip; XLA runs f32 matmuls on the MXU
# via bf16x3 passes, so the honest f32 ceiling is ~1/3 of that. Report both.
PEAK_BF16 = 197e12
PEAK_F32 = PEAK_BF16 / 3
# v5e HBM: 819 GB/s per chip.
PEAK_HBM = 819e9


def bytes_model(n, m, H, N, C, mix_subsweeps, n_chains):
    """COMPULSORY HBM traffic per lockstep sweep (all chains), by block.

    Counts only unique block inputs read once + outputs written once at
    f32 (4 B) — the information-theoretic floor assuming perfect fusion
    (intermediates live in VMEM/registers). achieved_GB/s = floor_bytes /
    measured_time is therefore a LOWER bound on real traffic; a block near
    PEAK_HBM on this basis is provably memory-bound, while a block far
    below it is compute/latency-bound (its time is not explained by
    compulsory traffic). Shared (chain-invariant) arrays — y one-hots,
    masks, the grid eigenbasis — are charged once per sweep, not per
    chain: XLA re-reads them per chain in practice, so this too
    understates traffic.
    """
    B = 4.0
    per_chain = {
        # fstar table + mu_star read for the category-logprob table; z and
        # the one-hot response operand for the grid contraction; theta_idx
        # written. (The (N, m, C) table itself is an MXU operand fusion —
        # not charged.)
        "draw_theta": mix_subsweeps * B * (2 * N * m + n * m + n),
        # g = f + mu read, z written, uniforms generated in-register.
        "draw_z": mix_subsweeps * B * (3 * H * n * m),
        # z - mu read; f and fstar written; eigenbasis coefficient solves
        # are rank-35 (VMEM-resident).
        "draw_fstar": mix_subsweeps * B * (2 * H * n * m + H * N * m),
        # theta + residual read once, 3x3 systems in-register, beta written.
        "draw_beta": B * (H * n * m + 2 * H * n + 3 * H * m),
        # ~7 effective post-compaction rounds re-stream g per round (the
        # XLA path's real traffic pattern; sgn/obs shared).
        "draw_threshold": B * (7 * H * n * m + 2 * H * m * (C + 1)),
        "ll_trace": B * (2 * H * n * m),
    }
    shared = {
        "draw_theta": mix_subsweeps * B * (n * m * C),
        "draw_z": mix_subsweeps * B * (n * m * C),
        "draw_threshold": B * (7 * 2 * H * n * m),
        "ll_trace": B * (n * m * C),
    }
    out = {k: v * n_chains for k, v in per_chain.items()}
    for k, v in shared.items():
        out[k] = out.get(k, 0.0) + v
    return out


def flops_model(n, m, H, N, C, affine_rounds, mix_subsweeps, n_chains,
                shift_window=0):
    """Analytic flop count per lockstep sweep (all chains), by block.

    Counts multiply-adds as 2 flops; transcendentals (erf, ndtri, log, exp)
    as 10 (the VPU cost scale, not MXU). Derived from the conjugate-path
    code in gpirt_tpu/models/gibbs.py (see each block's docstring).
    """
    mm = lambda *dims: 2 * np.prod([float(d) for d in dims])  # matmul flops
    tr = lambda cnt: 10.0 * float(cnt)  # transcendental-heavy elementwise

    blocks = {}
    # draw_theta (grid conditional): logprob table N*m*(C+1) erf, then the
    # MXU contraction (N, m*C) x (m*C, n) per horizon, + N*n gumbel/argmax.
    blocks["draw_theta"] = mix_subsweeps * H * (
        tr(N * m * (C + 1)) + mm(N, m * C, n) + tr(N * n)
    )
    # draw_z_truncnorm: 1 erf (binary fast path) or 2 erf, + 1 ndtri/cell.
    blocks["draw_z"] = mix_subsweeps * tr(
        (2 if C == 2 else 3) * H * n * m
    )
    # affine moves = shift orbit-Gibbs (one (n,n) chol + one fused A-solve of
    # m + 3J rhs + J rank-3 contractions, J = 4W + 1) + dilation MH rounds
    # (each a full _z_marginal_parts eval: chol + A-solves of m + 3 rhs).
    J = 4 * shift_window + 1 if shift_window else 0
    orbit = H * (mm(n, n, n) / 6 + 5 * mm(n, n, m + 3 * J)
                 + J * mm(n, 3, m)) if shift_window else 0.0
    per_eval = H * (mm(n, n, n) / 6 + 5 * mm(n, n, 3) + 5 * mm(n, n, m))
    blocks["affine_moves"] = orbit + (
        (affine_rounds + 1) * per_eval if affine_rounds else 0.0
    )
    # draw_fstar_conjugate after the round-5 push-through smoother: ONE
    # (N, q+3) x (q+3, m) grid matmul, ~4 rank-(q+3) site contractions
    # (u_theta, g_k, capacitance build, refinement apply), tiny (k, k)
    # factor. The r3-r4 model also charged a kstar contraction mm(n, N, m)
    # — stale since the shared-basis fusion deleted it; with it the block
    # read 3x its real flops and its MFU was overstated (r4 "26% MFU" at
    # 5k x 1k is ~7% on the honest count).
    q3 = 35
    blocks["draw_fstar"] = mix_subsweeps * H * (
        mm(N, q3, m) + 4 * mm(n, q3, m) + tr(2 * n * m)
    )
    # draw_beta_conjugate: Gram + rhs + 3x3 solves per (H, m).
    blocks["draw_beta"] = H * (mm(n, 3, 3) + mm(n, 3, m) + 50 * 27 * m)
    # draw_threshold: ESS; ~6 bracket rounds typ., each a full ll pass
    # (2 erf per boundary per cell) in delta space, C-1 dims per item.
    blocks["draw_threshold"] = 6 * tr(2 * H * n * m * (C + 1))
    blocks["ll_trace"] = tr(2 * H * n * m)
    return {k: v * n_chains for k, v in blocks.items()}


def build(shape, n_chains, dtype):
    import jax.numpy as jnp
    from gpirt_tpu.api import default_thresholds
    from gpirt_tpu.models import GPIRTConfig, make_constants
    from gpirt_tpu.utils.response import encode_categories

    rng = np.random.default_rng(0)
    if shape == "senate":
        from gpirt_tpu.utils.datasets import senate116_response_matrix
        rm, _, _ = senate116_response_matrix()
        y, C, _ = encode_categories(np.asarray(rm))
    elif shape == "sdo":
        from gpirt_tpu.utils.datasets import load_sdo
        sdo = load_sdo()
        y, C, _ = encode_categories(np.asarray(sdo, dtype=float))
    else:  # large: 5000 x 1000 binary
        n_, m_ = 5000, 1000
        theta = rng.standard_normal(n_)
        disc = rng.standard_normal(m_)
        p = 1 / (1 + np.exp(-np.outer(theta, disc)))
        y = (1 + (rng.random((n_, m_)) < p)).astype(float)[None]
        y[0, rng.random((n_, m_)) < 0.1] = np.nan
        C = 2
        y = np.nan_to_num(y, nan=0.0).astype(np.int32)
    if y.dtype.kind == "f":
        y = np.nan_to_num(y, nan=0.0).astype(np.int32)
    H, n, m = y.shape
    config = GPIRTConfig(n=n, m=m, horizon=H, C=C, dtype=dtype, jitter=1e-4)
    consts = make_constants(config, np.zeros((3, m)), np.full((3, m), 3.0),
                            np.zeros((2, n)), np.zeros((2, n)))
    thr = default_thresholds(C, m, H)
    ti = np.stack([rng.permutation(np.linspace(-2, 2, n))[None]
                   for _ in range(n_chains)])
    return jnp.asarray(y), thr, ti, consts, config


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="senate", choices=["senate", "sdo", "large"])
    ap.add_argument("--chains", type=int, default=64)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from gpirt_tpu.models import gibbs as G
    from gpirt_tpu.models.gibbs import gibbs_sweep, init_state
    from gpirt_tpu.utils.profiling import device_time

    y, thr, ti, consts, config = build(args.shape, args.chains, args.dtype)
    K = args.chains
    H, n, m = y.shape
    N, C = config.grid_size, config.C
    print(f"shape={args.shape}: n={n} m={m} H={H} C={C} grid={N} "
          f"chains={K} dtype={args.dtype} f_method={config.resolved_f_method} "
          f"affine_rounds={config.affine_rounds} on {jax.devices()[0].platform}")
    assert config.resolved_f_method == "conjugate", "anatomy targets the default path"

    impl = config.resolved_prng_impl  # rbg on TPU: the bit stream the real
    # sweep uses (chain_keys threads it); threefry here would overstate the
    # RNG-heavy blocks ~2.4x
    keys = jax.vmap(lambda s: jax.random.key(s, impl=impl))(jnp.arange(K))
    state = jax.jit(jax.vmap(
        lambda k, t: init_state(k, t, jnp.asarray(thr, config.jdtype), y,
                                consts, config)
    ))(keys, jnp.asarray(ti, config.jdtype))
    jax.block_until_ready(state)

    # warm the state into equilibrium-ish territory so ESS loop counts and
    # branch behavior are representative
    @jax.jit
    def warm(s):
        def body(c, i):
            c, _ = jax.vmap(
                lambda cs, k: gibbs_sweep(cs, k, y, consts, config)
            )(c, jax.vmap(lambda kk: jax.random.fold_in(kk, i))(keys))
            return c, ()
        s, _ = jax.lax.scan(body, s, jnp.arange(20))
        return s
    t0 = time.time()
    state = jax.block_until_ready(warm(state))
    print(f"[{time.time()-t0:.1f}s] warmup done")

    # derived quantities each block consumes
    key = jax.random.key(7, impl=impl)
    theta = jax.vmap(lambda i: G.theta_from_indices(i, consts))(state.theta_idx)
    mu = jax.vmap(G.compute_mu)(theta, state.beta)
    mu_star = jax.vmap(lambda b: G.compute_mu_star(consts, b))(state.beta)
    z = jax.jit(jax.vmap(
        lambda g, t: G.draw_z_truncnorm(key, g, y, t)
    ))(state.f + mu, state.thresholds)
    jax.block_until_ready((theta, mu, mu_star, z))

    # Every isolated block must DEPEND ON ITS SCAN CARRY through all of its
    # expensive inputs, or XLA hoists the loop-invariant work out of the
    # timing scan entirely (measured: draw_theta "0.03 ms" with its table +
    # contraction hoisted). `eps(c)` is a data-dependent zero added to a
    # SMALL upstream input so the whole block recomputes each step while
    # the poison itself costs nothing.
    def eps(c):
        return jnp.ravel(c)[0].astype(config.jdtype) * 0

    # All large device arrays are threaded through device_time's `captures`
    # jit argument — closing over them would inline multi-hundred-MB HLO
    # literals at the 5k x 1k shape and 413 the tunneled compile service.
    cap = dict(state=state, y=y, consts=consts, mu=mu, mu_star=mu_star,
               z=z, theta=theta, keys=keys)

    times = {}
    times["full_sweep"] = device_time(
        lambda s, i, cp: jax.vmap(
            lambda cs, k: gibbs_sweep(cs, k, cp["y"], cp["consts"], config)[0]
        )(s, jax.vmap(lambda kk: jax.random.fold_in(kk, i))(cp["keys"])),
        state, args.reps, captures=cap)
    times["draw_theta"] = device_time(
        lambda ti_, i, cp: jax.vmap(
            lambda s, ms: G.draw_theta(jax.random.fold_in(key, i), s, ms,
                                       cp["y"], cp["consts"], config)
        )(cp["state"]._replace(
            theta_idx=ti_,
            thresholds=cp["state"].thresholds + eps(ti_)),
          cp["mu_star"] + eps(ti_)),
        state.theta_idx, args.reps, captures=cap)
    times["draw_z"] = device_time(
        lambda z_, i, cp: jax.vmap(
            lambda g, t: G.draw_z_truncnorm(jax.random.fold_in(key, i), g,
                                            cp["y"], t)
        )(cp["state"].f + cp["mu"] + z_ * 0,
          cp["state"].thresholds + eps(z_)),
        z, args.reps, captures=cap)
    if config.affine_rounds > 0 or config.affine_shift_max > 0:
        times["affine_moves"] = device_time(
            lambda ti_, i, cp: jax.vmap(
                lambda t_, z_, b: G.affine_theta_moves(
                    jax.random.fold_in(key, i), t_, z_, b, cp["consts"],
                    config)[0]
            )(ti_, cp["z"], cp["state"].beta),
            state.theta_idx, args.reps, captures=cap)
    times["draw_fstar"] = device_time(
        lambda f_, i, cp: jax.vmap(
            lambda s, zr: G.draw_fstar_conjugate(
                jax.random.fold_in(key, i), s, zr, config, cp["consts"])[1]
        )(cp["state"]._replace(
            f=f_,
            # integer poison: keeps the theta-site basis gathers in the
            # timed loop (they re-run every sweep in reality)
            theta_idx=cp["state"].theta_idx
            + jnp.ravel(f_)[0].astype(jnp.int32) * 0,
        ), cp["z"] - cp["mu"] + eps(f_)),
        state.f, args.reps, captures=cap)
    times["draw_beta"] = device_time(
        lambda b_, i, cp: jax.vmap(
            lambda th, zmf: G.draw_beta_conjugate(
                jax.random.fold_in(key, i), th, zmf, cp["consts"], config)
        )(cp["theta"] + eps(b_),
          cp["z"] - cp["state"].f + b_[:, :1, :1, ...] * 0),
        state.beta, args.reps, captures=cap)
    times["draw_threshold"] = device_time(
        lambda t_, i, cp: jax.vmap(
            lambda tt, f_, m_: G.draw_threshold(
                jax.random.fold_in(key, i), tt, f_, m_, cp["y"], config)
        )(t_, cp["state"].f + eps(t_), cp["mu"]),
        state.thresholds, args.reps, captures=cap)

    fl = flops_model(n, m, H, N, C, config.affine_rounds, config.mix_subsweeps,
                     K, shift_window=config.affine_shift_max)
    fl_sweep = sum(fl.values())
    by = bytes_model(n, m, H, N, C, config.mix_subsweeps, K)
    by_sweep = sum(by.values())

    sum_blocks = sum(v for k, v in times.items() if k != "full_sweep")
    print(f"\n{'block':<16}{'ms':>8}{'% sweep':>9}{'GFLOP':>8}{'TFLOP/s':>9}"
          f"{'MFU f32':>9}{'MB':>7}{'GB/s':>7}{'% HBM':>7}")
    order = ["draw_theta", "draw_z", "affine_moves", "draw_fstar",
             "draw_beta", "draw_threshold"]

    def roof_cols(f, b, t):
        return (f"{f/1e9:>8.2f}{f/t/1e12:>9.2f}{100*f/t/PEAK_F32:>8.1f}%"
                f"{b/2**20:>7.1f}{b/t/1e9:>7.0f}{100*b/t/PEAK_HBM:>6.0f}%")

    for k in order:
        if k not in times:
            continue
        t = times[k]
        print(f"{k:<16}{t*1e3:>8.2f}{100*t/times['full_sweep']:>8.1f}%"
              + roof_cols(fl.get(k, 0.0), by.get(k, 0.0), t))
    t = times["full_sweep"]
    print(f"{'-- full sweep':<16}{t*1e3:>8.2f}{'100.0%':>9}"
          + roof_cols(fl_sweep, by_sweep, t))
    print(f"(sum of blocks {sum_blocks*1e3:.2f} ms vs fused sweep "
          f"{t*1e3:.2f} ms -> fusion/overlap gain "
          f"{100*(sum_blocks-t)/max(sum_blocks,1e-12):.0f}%)")
    print(f"sweeps/sec (all {K} chains lockstep): {1/t:.1f}; "
          f"chain-sweeps/sec: {K/t:.0f}")
    print(f"note: MFU vs f32 ceiling {PEAK_F32/1e12:.0f} TF (bf16 peak "
          f"{PEAK_BF16/1e12:.0f} TF / 3 for bf16x3 f32 matmuls); "
          f"transcendental-heavy blocks run on the VPU where MXU MFU "
          f"understates utilization. MB/GB/s columns are the COMPULSORY-"
          f"traffic floor (unique inputs+outputs once, perfect fusion) — "
          f"% HBM vs the {PEAK_HBM/1e9:.0f} GB/s v5e roof is a LOWER bound "
          f"on bandwidth utilization; near-roof blocks are provably "
          f"memory-bound, far-below blocks are compute/latency-bound.")


if __name__ == "__main__":
    main()
