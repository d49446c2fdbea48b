"""Convergence diagnostics: split R-hat and effective sample size.

The reference returns only a log-likelihood trace (src/gpirtMCMC.cpp:324-331)
and leaves R-hat/ESS to the user; the north-star metric ("effective
samples/sec", BASELINE.json) requires ESS, so this module implements the
standard split-R-hat and autocorrelation-based ESS (Gelman et al., BDA3
sec. 11.4-11.5; Geyer initial monotone sequence), vectorized over parameters.
"""

from __future__ import annotations

import numpy as np

__all__ = ["split_rhat", "effective_sample_size", "summarize", "align_theta_signs"]


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


def summarize(draws: np.ndarray) -> dict:
    """Convenience: min/median ESS and max R-hat over parameters."""
    ess = effective_sample_size(draws)
    rh = split_rhat(draws)
    return {
        "ess_min": float(np.nanmin(ess)),
        "ess_median": float(np.nanmedian(ess)),
        "rhat_max": float(np.nanmax(rh)),
    }
