"""Convergence diagnostics: split R-hat and effective sample size.

The reference returns only a log-likelihood trace (src/gpirtMCMC.cpp:324-331)
and leaves R-hat/ESS to the user; the north-star metric ("effective
samples/sec", BASELINE.json) requires ESS, so this module implements the
standard split-R-hat and autocorrelation-based ESS (Gelman et al., BDA3
sec. 11.4-11.5; Geyer initial monotone sequence), vectorized over parameters.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "split_rhat",
    "rank_normalized_rhat",
    "effective_sample_size",
    "tail_ess",
    "basin_clusters",
    "summarize",
    "align_theta_signs",
]


def align_theta_signs(theta_draws: np.ndarray, reference: np.ndarray = None) -> np.ndarray:
    """Resolve the theta -> -theta reflection invariance of the GP-IRT
    posterior by sign-aligning each draw to a reference vector.

    The likelihood is invariant under (theta, f*) -> (-theta, reversed f*),
    so a well-mixing chain hops between the two modes and the naive posterior
    mean washes out. (The reference sampler has the same invariance but mixes
    too slowly to expose it.) Each draw s is multiplied by
    sign(<draw_s, reference>).

    Args:
      theta_draws: (S, n) or (S, n, H).
      reference: (n,) or (n, H); defaults to the first draw.
    """
    t = np.asarray(theta_draws, np.float64)
    flat = t.reshape(t.shape[0], -1)
    if reference is None:
        reference = flat[0]
    ref = np.asarray(reference, np.float64).reshape(-1)
    ref = ref - ref.mean()
    proj = (flat - flat.mean(axis=1, keepdims=True)) @ ref
    sign = np.where(proj < 0, -1.0, 1.0)
    return t * sign.reshape((-1,) + (1,) * (t.ndim - 1))


def _to_chain_array(draws: np.ndarray) -> np.ndarray:
    """(S,) or (S, ...) single chain, or (K, S, ...) multi-chain -> (K, S, P)."""
    a = np.asarray(draws, np.float64)
    if a.ndim == 1:
        a = a[None, :, None]
    elif a.ndim == 2:
        # ambiguous; treat as single chain (S, P)
        a = a[None]
    else:
        a = a.reshape(a.shape[0], a.shape[1], -1)
    return a


def split_rhat(draws: np.ndarray) -> np.ndarray:
    """Split-R-hat per parameter. draws: (K, S, ...) chains-first."""
    a = _to_chain_array(draws)
    K, S, P = a.shape
    half = S // 2
    a = a[:, : 2 * half].reshape(K * 2, half, P)
    chain_means = a.mean(axis=1)  # (2K, P)
    chain_vars = a.var(axis=1, ddof=1)  # (2K, P)
    W = chain_vars.mean(axis=0)
    B = half * chain_means.var(axis=0, ddof=1)
    var_plus = (half - 1) / half * W + B / half
    with np.errstate(divide="ignore", invalid="ignore"):
        rhat = np.sqrt(var_plus / W)
    return rhat


def _autocov(x: np.ndarray) -> np.ndarray:
    """Autocovariance via FFT for each column of (S, P)."""
    S, P = x.shape
    xc = x - x.mean(axis=0)
    n_fft = 1 << int(np.ceil(np.log2(2 * S)))
    f = np.fft.rfft(xc, n=n_fft, axis=0)
    acov = np.fft.irfft(f * np.conj(f), n=n_fft, axis=0)[:S].real
    return acov / S


def effective_sample_size(draws: np.ndarray) -> np.ndarray:
    """ESS per parameter via the initial-monotone-positive-sequence estimator.

    draws: (K, S, ...) or (S, ...) — chains are pooled the standard way
    (cross-chain variance folded in via the R-hat-style var_plus).
    """
    a = _to_chain_array(draws)
    K, S, P = a.shape
    if S < 4:
        return np.full(P, float(K * S))
    chain_acov = np.stack([_autocov(a[k]) for k in range(K)])  # (K, S, P)
    chain_var = chain_acov[:, 0] * S / (S - 1.0)  # (K, P)
    W = chain_var.mean(axis=0)
    mean_acov = chain_acov.mean(axis=0)  # (S, P)
    if K > 1:
        B_over_n = a.mean(axis=1).var(axis=0, ddof=1)
        var_plus = W * (S - 1.0) / S + B_over_n
    else:
        var_plus = W * (S - 1.0) / S + 1e-300
    rho = 1.0 - (W - mean_acov) / var_plus  # (S, P)
    rho[0] = 1.0

    # Geyer: sum pairs rho[2t] + rho[2t+1] while positive, enforce monotone.
    T = (S - 1) // 2
    pair = rho[1 : 2 * T + 1].reshape(T, 2, P).sum(axis=1)  # (T, P)
    pair_min = np.minimum.accumulate(pair, axis=0)
    positive = pair_min > 0
    # cumulative sum of pairs up to the first non-positive one
    contrib = np.where(positive, pair_min, 0.0)
    # stop at first negative: zero out everything after
    first_bad = np.argmax(~positive, axis=0)
    has_bad = ~positive.any(axis=0) == False  # noqa: E712  (any bad pair?)
    idx = np.arange(T)[:, None]
    cutoff = np.where((~positive).any(axis=0), first_bad, T)
    contrib = np.where(idx < cutoff[None, :], contrib, 0.0)
    tau = -1.0 + 2.0 * contrib.sum(axis=0)
    tau = np.maximum(tau, 1.0 / np.log10(max(S, 10)))
    ess = K * S / tau
    return np.minimum(ess, K * S * np.log10(max(S, 10)))


def effective_sample_size_device(draws, align_signs: bool = True):
    """On-device (jit-able) pooled ESS per parameter.

    Mirrors ``effective_sample_size`` in jnp so multi-megabyte draw arrays
    never cross the host boundary (device->host over a tunneled TPU can be
    slower than the sampling itself); only the (P,) ESS vector comes back.

    Args:
      draws: (K, S, P) jnp array, chains first.
      align_signs: resolve the theta reflection per chain against chain 0's
        first draw before pooling.
    """
    import jax
    import jax.numpy as jnp

    x = draws.astype(jnp.float32)
    K, S, P = x.shape
    if S < 4:
        # too few draws for any autocorrelation pair: no basis to estimate
        # tau, so charge none (ess = K*S) — same guard as the numpy twin
        return jnp.full((P,), float(K * S), jnp.float32)
    if align_signs:
        ref = x[0, 0] - jnp.mean(x[0, 0])
        cent = x - jnp.mean(x, axis=2, keepdims=True)
        proj = jnp.einsum("ksp,p->ks", cent, ref)
        sign = jnp.where(proj < 0, -1.0, 1.0)
        x = x * sign[..., None]

    nfft = 1 << int(np.ceil(np.log2(2 * S)))
    xc = x - jnp.mean(x, axis=1, keepdims=True)
    f = jnp.fft.rfft(xc, n=nfft, axis=1)
    acov = jnp.fft.irfft(f * jnp.conj(f), n=nfft, axis=1)[:, :S].real / S  # (K,S,P)

    chain_var = acov[:, 0] * S / (S - 1.0)  # (K, P)
    W = jnp.mean(chain_var, axis=0)
    mean_acov = jnp.mean(acov, axis=0)  # (S, P)
    if K > 1:
        B_over_n = jnp.var(jnp.mean(x, axis=1), axis=0, ddof=1)
        var_plus = W * (S - 1.0) / S + B_over_n
    else:
        var_plus = W * (S - 1.0) / S + 1e-30
    rho = 1.0 - (W - mean_acov) / var_plus
    rho = rho.at[0].set(1.0)

    T = (S - 1) // 2
    pair = rho[1 : 2 * T + 1].reshape(T, 2, P).sum(axis=1)  # (T, P)
    pair_min = jax.lax.associative_scan(jnp.minimum, pair, axis=0)
    positive = pair_min > 0
    contrib = jnp.where(positive, pair_min, 0.0)
    first_bad = jnp.argmax(jnp.logical_not(positive), axis=0)
    cutoff = jnp.where(jnp.any(jnp.logical_not(positive), axis=0), first_bad, T)
    idx = jnp.arange(T)[:, None]
    contrib = jnp.where(idx < cutoff[None, :], contrib, 0.0)
    tau = jnp.maximum(-1.0 + 2.0 * contrib.sum(axis=0),
                      1.0 / np.log10(max(S, 10)))
    ess = K * S / tau
    return jnp.minimum(ess, K * S * np.log10(max(S, 10)))


def _rank_normalize(a: np.ndarray) -> np.ndarray:
    """Pooled-rank normal scores per parameter: (K, S, P) -> (K, S, P).

    Vehtari et al. (2021) fractional ranks z = Phi^-1((r - 3/8)/(KS + 1/4)):
    makes R-hat/ESS robust to heavy tails and nonlinear scale."""
    from scipy.special import ndtri

    K, S, P = a.shape
    flat = a.reshape(K * S, P)
    order = np.argsort(flat, axis=0, kind="stable")
    ranks = np.empty_like(order)
    np.put_along_axis(ranks, order, np.arange(K * S)[:, None], axis=0)
    z = ndtri((ranks + 1 - 0.375) / (K * S + 0.25))
    return z.reshape(K, S, P)


def rank_normalized_rhat(draws: np.ndarray) -> np.ndarray:
    """Rank-normalized split-R-hat (Vehtari et al. 2021): the max of the
    bulk statistic (rank-normal scores) and the folded statistic
    (|x - median|, tail-sensitive). The plain split_rhat can miss chains
    that agree in location but not scale/tails; this is the modern default.
    """
    a = _to_chain_array(draws)
    bulk = split_rhat(_rank_normalize(a))
    folded = np.abs(a - np.median(a.reshape(-1, a.shape[-1]), axis=0))
    tail = split_rhat(_rank_normalize(folded))
    return np.maximum(bulk, tail)


def tail_ess(draws: np.ndarray, prob: float = 0.05) -> np.ndarray:
    """Tail ESS: the smaller of the ESS of the lower/upper `prob`-quantile
    exceedance indicators (Vehtari et al. 2021). Central ESS can look fine
    while the tails — what credible intervals are made of — mix far slower.
    """
    a = _to_chain_array(draws)
    flat = a.reshape(-1, a.shape[-1])
    q_lo = np.quantile(flat, prob, axis=0)
    q_hi = np.quantile(flat, 1.0 - prob, axis=0)
    lo = effective_sample_size((a <= q_lo).astype(np.float64))
    hi = effective_sample_size((a >= q_hi).astype(np.float64))
    return np.minimum(lo, hi)


def basin_clusters(
    theta_draws: np.ndarray, corr_threshold: float = 0.9
) -> dict:
    """Group chains into posterior basins by their sign-aligned theta means.

    The senate-scale GP-IRT posterior has genuine multi-basin structure
    (soft monotone-warp modes; RESULTS.md mixing study) that a single
    scare-number R-hat cannot communicate. This clusters chains whose
    sign-aligned posterior-mean theta vectors correlate above
    ``corr_threshold`` (greedy leader pass over correlation distance) and
    reports the structure instead.

    Args:
      theta_draws: (K, S, n) per-chain theta draws (or (K, n) chain means).
    Returns:
      dict with "labels" (K,), "n_clusters", "sizes", "within_corr_min"
      (worst member-to-leader correlation), "between_corr_max" (highest
      leader-to-leader correlation — near 1 means the split is borderline).
    """
    t = np.asarray(theta_draws, np.float64)
    if t.ndim == 3:
        t = align_theta_signs(t.reshape(-1, t.shape[-1])).reshape(t.shape)
        means = t.mean(axis=1)  # (K, n)
    else:
        means = t
    # sign-align chain means to chain 0
    ref = means[0] - means[0].mean()
    cent = means - means.mean(axis=1, keepdims=True)
    sign = np.where(cent @ ref < 0, -1.0, 1.0)
    cent = cent * sign[:, None]
    norms = np.linalg.norm(cent, axis=1) + 1e-300
    unit = cent / norms[:, None]

    K = unit.shape[0]
    labels = np.full(K, -1, int)
    leaders = []
    within = []
    for k in range(K):
        best, best_c = -1, -np.inf
        for ci, lead in enumerate(leaders):
            c = abs(float(unit[k] @ unit[lead]))
            if c > best_c:
                best, best_c = ci, c
        if best >= 0 and best_c >= corr_threshold:
            labels[k] = best
            within.append(best_c)
        else:
            labels[k] = len(leaders)
            leaders.append(k)
    between = [
        abs(float(unit[a] @ unit[b]))
        for i, a in enumerate(leaders)
        for b in leaders[i + 1:]
    ]
    sizes = np.bincount(labels, minlength=len(leaders))
    return {
        "labels": labels,
        "n_clusters": int(len(leaders)),
        "sizes": sizes.tolist(),
        "within_corr_min": float(min(within)) if within else 1.0,
        "between_corr_max": float(max(between)) if between else 0.0,
    }


def summarize(draws: np.ndarray) -> dict:
    """Convenience: min/median ESS, tail ESS, and max (plain + rank) R-hat."""
    ess = effective_sample_size(draws)
    rh = split_rhat(draws)
    rrh = rank_normalized_rhat(draws)
    te = tail_ess(draws)
    return {
        "ess_min": float(np.nanmin(ess)),
        "ess_median": float(np.nanmedian(ess)),
        "ess_tail_min": float(np.nanmin(te)),
        "rhat_max": float(np.nanmax(rh)),
        "rhat_rank_max": float(np.nanmax(rrh)),
    }
