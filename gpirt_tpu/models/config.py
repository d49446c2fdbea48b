"""Static configuration and precomputed constants for the GP-IRT sampler."""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gpirt_tpu.ops.kernels import icc_gram_np, time_gram_np
from gpirt_tpu.ops.linalg import host_cholesky_f64

__all__ = ["GPIRTConfig", "GPIRTConstants", "make_constants", "THETA_LO", "THETA_HI"]

THETA_LO = -5.0
THETA_HI = 5.0


@dataclasses.dataclass(frozen=True)
class GPIRTConfig:
    """Hashable static configuration (safe as a jit static argument).

    Mirrors the reference sampler's arguments (src/gpirtMCMC.cpp:24-38) plus
    TPU-specific knobs. Shapes here are *static*: changing any field triggers
    one recompile.
    """

    n: int  # respondents
    m: int  # items
    horizon: int = 1  # time periods / sessions
    C: int = 2  # ordinal categories
    grid_size: int = 1001  # theta* grid resolution (reference: 1001 on [-5,5])
    theta_os: float = 1.0
    theta_ls: float = 10.0
    kernel: str = "Matern"  # time kernel: "Matern" | "RBF"
    constant_IRF: bool = False
    n_inducing: int = 100  # inducing points for constant-IRF fstar path
    jitter: float = 1e-6  # model nugget (reference: 1e-6 everywhere)
    dtype: str = "float32"  # compute dtype on device
    ess_max_rounds: int = 64
    fstar_method: str = "matheron"  # "matheron" (fast, grid-pathwise) | "chol"
    theta_method: str = "grid"  # "grid" (exact conditional, documented in the
    # reference vignette) | "ess" (the reference code's ESS + snap)
    mean_degree: int = 2  # quadratic parametric mean (recover_fstar uses 1)
    mix_subsweeps: int = 1  # extra (fstar -> theta -> snap) passes per sweep
    threshold_method: str = "auto"  # cutpoint update: "ess" (y-marginal delta
    # ESS, the reference's update, src/draw_threshold.cpp) | "collapsed"
    # (exact draw given the Albert-Chib latents z — box constraints from the
    # z order statistics, no erf table; conjugate path only; faster per
    # sweep but measured to slow theta mixing via the t<->f soft mode) |
    # "interleave" (collapsed most sweeps, y-marginal ESS every
    # threshold_ess_every-th; measured on-chip at k=2/k=4: the periodic
    # marginal move does NOT recover theta mixing — one collapsed draw
    # re-anchors the cutpoints to the z box, so both arms lose to pure
    # "ess" on ess/sec; RESULTS.md threshold A/B) |
    # "newton" (Newton-proposal independence MH — binary: scalar t_1
    # kernel; ordinal C > 2: joint delta-space kernel with the exact
    # tridiagonal cutpoint Hessian — targets the SAME y-marginal
    # conditional as "ess" so no z-anchoring, at threshold_mh_tries + 1
    # fused (H,n,m[,C-1]) passes instead of ~10 bracket-shrink rounds;
    # both Geweke-gated) |
    # "auto" (the measured winner — see resolved_threshold_method)
    threshold_ess_every: int = 4  # interleave period k: the y-marginal ESS
    # cutpoint update runs on iterations with i % k == 0, the collapsed
    # exact draw otherwise (used only by threshold_method="interleave")
    threshold_mh_tries: int = 2  # MH tries per sweep for "newton" (each an
    # independence-MH step with proposal/reverse Newton stats; acceptance
    # is near 1, so 2 tries give near-iid conditional draws)
    threshold_ess_twophase: bool = True  # binary ESS cutpoint update:
    # continue rounds past 6 on an L/4-compacted straggler subset (same
    # Markov kernel — a true continuation of one update, NOT a fresh
    # re-update of bailed lanes, which would be biased). The lockstep
    # while_loop otherwise costs the max accept round over all lanes
    # (~12-17) while the mean lane needs ~3. Measured +7% sweep rate at 64
    # senate chains with the identical kernel; default ON (False gives the
    # plain full-batch loop).
    threshold_backend: str = "auto"  # backend for the binary y-marginal ESS
    # cutpoint update: "xla" (fused erf->log->masked-sum passes per shrink
    # round, + the two-phase compaction) | "pallas"
    # (ops/pallas_threshold.py: the ENTIRE shrink loop in one VMEM-resident
    # kernel — g/sgn/obs stream from HBM once instead of once per round,
    # and each 128-lane tile exits at its own max round) | "auto" (the
    # measured on-chip winner; see resolved_threshold_backend). Applies
    # only to the binary (C == 2), unsharded, untempered,
    # non-constant-IRF "ess" path; every other path uses XLA.
    threshold_shift: bool = False  # extra exact Gibbs draw along the
    # (all cutpoints of item j, beta0_j) likelihood-null shift direction
    # each sweep (gibbs.draw_threshold_shift): the ordinal likelihood is
    # exactly invariant, so the conditional is a closed-form 1-D Gaussian
    # from the priors — de-anchors the O(1/sqrt(n))-narrow cutpoint
    # conditional that three measurements showed rate-limits theta mixing.
    # Skipped under constant_IRF. Default per measured A/B (RESULTS.md).
    # Collective affine MH moves on (theta, beta) with f* collapsed
    # (conjugate path only — they need the Albert-Chib z-marginal). These
    # traverse the global location/scale soft modes that dominate theta
    # autocorrelation (measured tau ~ 2000+ sweeps on senate116; see
    # gibbs.affine_theta_moves and scripts/diag_mixing.py). OFF by default:
    # the orbit draw raises within-chain theta ESS ~1.5x on senate116 but
    # costs ~1.7x wall (scripts/tune_bench.py) — net ESS/sec negative
    # there; enable for posteriors whose location/scale modes matter more
    # than throughput (small m, strongly soft modes).
    affine_rounds: int = 0  # dilation MH rounds per sweep; 0 disables dilation
    affine_shift_max: int = 0  # half-window W of the shift orbit-Gibbs
    # draw; 0 disables the orbit move
    affine_dilate_sd: float = 0.02  # sd of log dilation factor
    prng_impl: str = "auto"  # PRNG key implementation: "auto" ("rbg" on TPU,
    # "threefry2x32" elsewhere) | "threefry2x32" (JAX's default: bit-exact
    # across backends/versions) | "rbg" (XLA's native RngBitGenerator for
    # the bit stream, threefry-quality key derivation for split/fold_in —
    # measured 2.4x faster at the sweep's dominant draw, the (N, m) grid
    # prior nugget: 0.91 -> 0.38 ms at 64 senate116 chains on v5e; ~40M
    # random words/sweep overall. Deterministic for a fixed seed on a fixed
    # backend+compiler, but the stream is NOT guaranteed stable across XLA
    # versions the way threefry is — use "threefry2x32" for cross-version
    # golden traces.)
    f_method: str = "auto"  # "auto" (conjugate where supported, else grid) |
    # "grid" (direct f* ESS, no per-iter Cholesky) |
    # "two_stage" (the reference's draw_f + draw_fstar pipeline) |
    # "conjugate" (Albert-Chib truncated-normal augmentation: exact Gaussian
    # f*/beta draws; one well-conditioned (n,n) Cholesky per sweep — measured
    # 1.75x the grid method's ESS/sec on senate116)

    def __post_init__(self):
        if min(self.n, self.m, self.horizon) < 1:
            raise ValueError(
                f"n, m, horizon must be >= 1 (got {self.n}, {self.m}, {self.horizon})"
            )
        if self.C < 2:
            raise ValueError(f"need at least 2 ordinal categories, got C={self.C}")
        if self.grid_size < 2:
            raise ValueError(f"grid_size must be >= 2, got {self.grid_size}")
        if self.mix_subsweeps < 1:
            raise ValueError(
                f"mix_subsweeps must be >= 1, got {self.mix_subsweeps} "
                "(each sweep needs at least one latent/trait pass)"
            )
        if self.ess_max_rounds < 1:
            raise ValueError(f"ess_max_rounds must be >= 1, got {self.ess_max_rounds}")
        if self.affine_rounds < 0:
            raise ValueError(f"affine_rounds must be >= 0, got {self.affine_rounds}")
        if self.affine_shift_max < 0:
            raise ValueError(
                f"affine_shift_max must be >= 0, got {self.affine_shift_max}"
            )
        if self.affine_rounds > 0 and self.affine_dilate_sd <= 0:
            raise ValueError(
                "dilation rounds need affine_dilate_sd > 0"
            )
        if self.theta_method not in ("grid", "ess"):
            raise ValueError(
                f"theta_method must be 'grid' or 'ess', got {self.theta_method!r}"
            )
        if self.f_method not in ("auto", "grid", "two_stage", "conjugate"):
            raise ValueError(
                "f_method must be 'auto', 'grid', 'two_stage' or 'conjugate', "
                f"got {self.f_method!r}"
            )
        if self.threshold_method not in ("auto", "ess", "collapsed",
                                         "interleave", "newton"):
            raise ValueError(
                "threshold_method must be 'auto', 'ess', 'collapsed', "
                f"'interleave' or 'newton', got {self.threshold_method!r}"
            )
        if (self.threshold_method in ("collapsed", "interleave")
                and self.resolved_f_method != "conjugate"):
            raise ValueError(
                f"threshold_method={self.threshold_method!r} needs the "
                "Albert-Chib latents (f_method='conjugate')"
            )
        if self.threshold_backend not in ("auto", "xla", "pallas"):
            raise ValueError(
                "threshold_backend must be 'auto', 'xla' or 'pallas', "
                f"got {self.threshold_backend!r}"
            )
        if self.threshold_ess_every < 1:
            raise ValueError(
                "threshold_ess_every must be >= 1, "
                f"got {self.threshold_ess_every}"
            )
        if self.threshold_mh_tries < 1:
            raise ValueError(
                "threshold_mh_tries must be >= 1, "
                f"got {self.threshold_mh_tries}"
            )
        if self.fstar_method not in ("matheron", "chol"):
            raise ValueError(
                f"fstar_method must be 'matheron' or 'chol', got {self.fstar_method!r}"
            )
        if self.dtype == "float64" and not jax.config.jax_enable_x64:
            raise ValueError(
                "dtype='float64' requires jax_enable_x64; set "
                "jax.config.update('jax_enable_x64', True) before sampling, "
                "or use dtype='float32' (the TPU default)."
            )
        if self.dtype not in ("float32", "float64"):
            raise ValueError(f"unsupported dtype {self.dtype!r}")
        if self.prng_impl not in ("auto", "threefry2x32", "rbg"):
            raise ValueError(
                "prng_impl must be 'auto', 'threefry2x32' or 'rbg', "
                f"got {self.prng_impl!r}"
            )

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)

    @property
    def resolved_prng_impl(self) -> str:
        """"auto" -> the fast native bit generator on TPU ("rbg"; the key
        derivation — split/fold_in — stays threefry-based, only the bit
        stream changes), threefry elsewhere so CPU test goldens and
        float64 parity traces stay bit-stable across JAX upgrades."""
        if self.prng_impl != "auto":
            return self.prng_impl
        return "rbg" if jax.default_backend() == "tpu" else "threefry2x32"

    @property
    def resolved_f_method(self) -> str:
        """"auto" picks the fastest latent sampler: Albert-Chib conjugate
        (no ESS loops, exact Gaussian f*/beta draws) wherever implemented.

        The conjugate solves run through the Woodbury rank-3 kernel split
        (gibbs.WoodburyB): every factorization is of K_SE + I, whose
        condition is <= n + 1 at any theta configuration, so float32 is
        accurate at any data scale (round 1 had to fall back to the
        grid-native sampler past n ~ 500 because the direct K + I solve
        carries the polynomial kernel terms' ~theta^4 diagonal).
        constant_IRF still uses the grid-native sampler.
        """
        if self.f_method != "auto":
            return self.f_method
        if self.constant_IRF:
            return "grid"
        return "conjugate"

    @property
    def resolved_threshold_method(self) -> str:
        """"auto" resolves to the measured theta-ESS/sec winner: "ess".

        The collapsed draw is exact and 1.5x faster per sweep (5.3 vs 7.9 ms
        at 64 senate116 chains — it deletes the 26%-of-sweep erf table), but
        conditioning on z anchors the cutpoints to the O(1/n) order-statistic
        box, and through the t<->f soft mode that drags THETA mixing down
        3.2x (within-chain ESS/draw 0.101 -> 0.032; RESULTS.md threshold
        A/B). Net ess/sec: 490 (ess) vs 222 (collapsed), so auto stays on
        the y-marginal ESS; "collapsed" remains available where raw sweep
        throughput is what matters. Non-conjugate paths have no z and fall
        back to the y-marginal ESS ("newton" also targets the y-marginal
        conditional, so it is valid on every f_method)."""
        if self.threshold_method == "newton":
            return "newton"
        if self.resolved_f_method != "conjugate":
            return "ess"
        if self.threshold_method == "auto":
            return "ess"
        return self.threshold_method

    @property
    def resolved_threshold_backend(self) -> str:
        """"auto" -> "xla": the measured on-chip verdict (VERDICT r3 item 3).

        The Pallas kernel is numerically exact (compiled == interpret,
        bitwise) and statistically equivalent (posterior z = -0.06), but
        the 64-chain senate sweep measured 5.36 ms under it vs 5.12 ms
        under the XLA two-phase path: the block is transcendental-bound,
        so XLA's active-lane compaction beats the kernel's one-pass HBM
        saving (scripts/ab_pallas_threshold.py; RESULTS.md "pallas
        threshold A/B"). "pallas" stays selectable for re-measurement on
        future hardware.
        """
        if self.threshold_backend != "auto":
            return self.threshold_backend
        return "xla"

    @property
    def chol_normalized(self) -> bool:
        """Correlation-form on-device Cholesky (float32 stability mode)."""
        return self.dtype == "float32"

    @property
    def device_jitter(self) -> float:
        """Nugget for on-device theta-Gram factorizations.

        float64: the model nugget as-is (reference: absolute 1e-6).
        float32: a correlation-scale nugget with an n-aware floor —
        the normalized Cholesky's rounding error grows ~ n * eps32, so the
        floor 4*eps32*n keeps the factorization finite for any theta
        configuration (duplicated grid-snapped thetas included).
        """
        if self.dtype != "float32":
            return self.jitter
        return max(self.jitter, 1e-4, 4 * 1.19e-7 * self.n)

    @property
    def theta_regime(self) -> str:
        """The reference's three length-scale regimes (src/draw-theta.cpp:112-236).

        "CST": ls >= 3*horizon  -> one constant theta shared by all sessions
        "RDM": ls <= 0.1        -> independent theta per session
        "GP":  otherwise        -> GP prior over time
        For horizon == 1 all three coincide; we canonicalize to CST.
        """
        if self.horizon == 1:
            return "CST"
        if self.theta_ls >= 3 * self.horizon:
            return "CST"
        if self.theta_ls <= 0.1:
            return "RDM"
        return "GP"

    @property
    def grid_step(self) -> float:
        return (THETA_HI - THETA_LO) / (self.grid_size - 1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GPIRTConstants:
    """Per-run device constants, precomputed once at setup time.

    The central TPU-first trick: theta values are snapped to the fixed grid
    after every draw (reference src/draw-theta.cpp:165-168), so *every* Gram
    the sampler needs — K(theta, theta), K(theta, theta*), K(theta*, theta*) —
    is a gather from this one master ``grid_gram``. No kernel evaluations on
    the hot path, and the grid Cholesky (used by Matheron-rule fstar draws)
    is factorized exactly once, in float64 on the host.
    """

    grid: jnp.ndarray  # (N,) theta* grid
    grid_gram: jnp.ndarray  # (N, N) master ICC Gram over the grid (no jitter)
    grid_gram_se: jnp.ndarray  # (N, N) squared-exponential part alone
    Psi_grid: jnp.ndarray  # (N, 3) [sd0, sd1*t, sd2*t^2]: K = K_SE + Psi Psi^T
    U_se: jnp.ndarray  # (N, q) eigenbasis factor: K_SE ~= U_se U_se^T to
    # ~1e-10 relative (the smooth SE kernel's numerical rank on the grid is
    # ~26; q = 32). Turns every K + T I solve into a rank-(q+3) capacitance
    # system — no (n, n) factorization anywhere on the conjugate hot path.
    L_grid: jnp.ndarray  # (N, N) chol(grid_gram + jitter I), f64-computed
    Xstar: jnp.ndarray  # (N, 3) [1, theta*, theta*^2]
    beta_prior_means: jnp.ndarray  # (3, m)
    beta_prior_sds: jnp.ndarray  # (3, m)
    theta_prior_means: jnp.ndarray  # (2, n)
    theta_prior_sds: jnp.ndarray  # (2, n)
    L_time: Optional[jnp.ndarray]  # (H, H) time-GP chol, or None outside GP regime
    Lambda_time: Optional[jnp.ndarray]  # (H, H) time-GP precision (grid Gibbs)


def make_constants(
    config: GPIRTConfig,
    beta_prior_means: np.ndarray,
    beta_prior_sds: np.ndarray,
    theta_prior_means: np.ndarray,
    theta_prior_sds: np.ndarray,
) -> GPIRTConstants:
    dt = config.jdtype
    N = config.grid_size
    grid64 = np.linspace(THETA_LO, THETA_HI, N)
    sds_col0 = np.asarray(beta_prior_sds, np.float64)[:, 0]
    gram64 = icc_gram_np(grid64, grid64, sds_col0)
    L_grid = host_cholesky_f64(gram64, config.jitter, dtype=dt)

    Xstar = np.stack([np.ones(N), grid64, grid64**2], axis=1)
    # Exact rank-3 split of the ICC kernel (src/covariance-function.cpp:3-18):
    # K = K_SE + Psi Psi^T with Psi = [sd0, sd1*t, sd2*t^2]. The conjugate
    # path solves against K_SE + I (condition <= n + 1 at ANY theta
    # configuration) plus a 3x3 capacitance — float32-safe where a direct
    # K + I factorization is not (the polynomial terms put ~theta^4 on the
    # diagonal).
    d = grid64[:, None] - grid64[None, :]
    gram_se64 = np.exp(-0.5 * d * d)
    Psi = Xstar * sds_col0[None, :]
    # one-time host eigendecomposition of the SE grid Gram: numerical rank
    # ~26 (smooth kernel); q = 32 keeps the truncation ~1e-10 relative,
    # far below float32 resolution of the Gram entries themselves
    q = min(32, N)
    ew, ev = np.linalg.eigh(gram_se64)
    ew, ev = ew[::-1][:q], ev[:, ::-1][:, :q]
    U_se64 = ev * np.sqrt(np.maximum(ew, 0.0))[None, :]

    L_time = None
    Lambda_time = None
    if config.theta_regime == "GP":
        # Reference quirk (deliberately reproduced): the cholesky cache builds
        # L_time with *zeroed* prior sds (src/cholesky-cache.cpp:31), making
        # the factor identical for every respondent — so it is one (H, H)
        # matrix computed once, not n of them per iteration.
        ts = np.arange(config.horizon, dtype=np.float64)
        Vt = time_gram_np(
            ts, ts, config.theta_os, config.theta_ls, np.zeros(2), config.kernel
        )
        L_time = jnp.asarray(host_cholesky_f64(Vt, config.jitter, dtype=dt))
        Lambda_time = jnp.asarray(
            np.linalg.inv(Vt + config.jitter * np.eye(config.horizon)).astype(dt)
        )

    return GPIRTConstants(
        grid=jnp.asarray(grid64, dt),
        grid_gram=jnp.asarray(gram64, dt),
        grid_gram_se=jnp.asarray(gram_se64, dt),
        Psi_grid=jnp.asarray(Psi, dt),
        U_se=jnp.asarray(U_se64, dt),
        L_grid=jnp.asarray(L_grid),
        Xstar=jnp.asarray(Xstar, dt),
        beta_prior_means=jnp.asarray(beta_prior_means, dt),
        beta_prior_sds=jnp.asarray(beta_prior_sds, dt),
        theta_prior_means=jnp.asarray(theta_prior_means, dt),
        theta_prior_sds=jnp.asarray(theta_prior_sds, dt),
        L_time=L_time,
        Lambda_time=Lambda_time,
    )
