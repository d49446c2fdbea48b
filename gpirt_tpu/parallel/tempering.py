"""Parallel tempering across the chip's chain axis.

The GP-IRT posterior under the reference's wide folded-mean kernel priors is
multi-basin: chains equilibrate into distinct soft-mode configurations
(location/scale/warp of theta with f compensating) and single-temperature
kernels cannot cross between basins at useful rates (measured: collective
affine moves with f* collapsed saturate at a few accepted grid steps per
sweep — scripts/diag_mixing.py, scripts/probe_*.py). Pooled multi-chain ESS
is then bounded by between-chain disagreement no matter how fast each chain
runs.

Tempering family: observation noise sd sqrt(T) —
    P_T(y = c | g) = Phi((t_c - g)/sqrt(T)) - Phi((t_{c-1} - g)/sqrt(T)),
which interpolates the target (T = 1) toward the prior (T -> inf) while
keeping every conjugate-path update exactly Gaussian (B = K + T I; the
Woodbury split's A = K_SE + T I only gets better conditioned). Priors are
temperature-independent, so the swap acceptance between lanes a, b reduces
to observed-data likelihoods:
    log alpha = l_Ta(S_b) + l_Tb(S_a) - l_Ta(S_a) - l_Tb(S_b).

TPU mapping: lanes = (cold chains G) x (temperatures L) run in lockstep as
one vmap batch — a tempered sweep costs the same as an untempered one, and
the even/odd adjacent swap phase is a pure on-device gather along the lane
axis. Lane l of each group holds temperature temps[l] forever (states swap,
temperatures don't), so the stored cold draws are simply lane 0 of each
group.

No analog exists in the reference (single sequential chains,
R/gpirtMCMC.R:112); cites kept to the sampler blocks being tempered.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gpirt_tpu.models.config import GPIRTConfig, GPIRTConstants
from gpirt_tpu.models.gibbs import (
    compute_mu,
    compute_mu_star,
    gibbs_sweep,
    init_state,
    theta_from_indices,
)
from gpirt_tpu.models.sampler import sample_schedule
from gpirt_tpu.ops.likelihood import ordinal_ll_terms

__all__ = ["temperature_ladder", "run_tempered_chains", "TemperedPrograms"]


def temperature_ladder(n_temps: int, max_temp: float) -> np.ndarray:
    """Geometric ladder 1 = T_0 < ... < T_{L-1} = max_temp."""
    if n_temps < 2:
        return np.ones(max(n_temps, 1))
    return max_temp ** (np.arange(n_temps) / (n_temps - 1))


class TemperedPrograms:
    """Compiled building blocks for chunked tempered-ensemble execution.

    Mirrors parallel.chains.ChunkedPrograms: init / advance(count) /
    records(count) with a per-count compile cache. Lane layout: group-major
    (G, L) flattened to K = G*L; lane l runs temperature temps[l].
    """

    def __init__(self, keys, y, thresholds_init, consts, config, *,
                 n_temps, max_temp, sample_iterations, burn_iterations,
                 thin, store_f=False, store_fstar=False, swap_every=1):
        if config.resolved_f_method != "conjugate":
            raise NotImplementedError(
                "parallel tempering needs f_method='conjugate'"
            )
        self.y = y
        self.consts = consts
        self.config = config
        self.thin = thin
        self.store_f = store_f
        self.store_fstar = store_fstar
        self.swap_every = swap_every
        self.G = int(keys.shape[0])
        self.L = int(n_temps)
        self.thresholds_init = jnp.asarray(thresholds_init, config.jdtype)
        self.sched = sample_schedule(sample_iterations, burn_iterations, thin)
        self.total = sample_iterations + burn_iterations
        temps = temperature_ladder(n_temps, max_temp)
        self.temps = jnp.asarray(np.tile(temps, self.G), config.jdtype)  # (K,)
        # per-lane keys: each group key spawns L init keys, L run keys, and
        # (group 0 only) one swap stream for the whole ensemble
        lanes = jax.vmap(lambda k: jax.random.split(k, n_temps + 2))(keys)
        self.k_init = lanes[:, :n_temps].reshape(self.G * self.L)
        self.k_run = jax.vmap(lambda k: jax.random.split(k, n_temps))(
            lanes[:, n_temps]
        ).reshape(self.G * self.L)
        self.k_swap = lanes[0, n_temps + 1]
        self._compiled: Dict[tuple, Any] = {}

    # -- pieces -----------------------------------------------------------

    def init(self, theta_init):
        theta_init = jnp.asarray(theta_init, self.config.jdtype)
        if theta_init.ndim == 3:  # (G, H, n) per-group inits -> tile lanes
            theta_init = jnp.repeat(theta_init, self.L, axis=0)
            init_axis = 0
        else:
            init_axis = None

        def one(key, ti):
            return init_state(key, ti, self.thresholds_init, self.y,
                              self.consts, self.config)

        return jax.jit(jax.vmap(one, in_axes=(0, init_axis)))(
            self.k_init, theta_init
        )

    def _lane_ll(self, states, temps_eval):
        """l_{temps_eval[k]}(S_k) for every lane: (K,) tempered data ll."""
        def one(s, t):
            theta = theta_from_indices(s.theta_idx, self.consts)
            g = s.f + compute_mu(theta, s.beta)
            inv_s = 1.0 / jnp.sqrt(t)
            return jnp.sum(ordinal_ll_terms(g, self.y, s.thresholds, inv_s))

        return jax.vmap(one)(states, temps_eval)

    def _swap(self, states, i):
        """One even/odd adjacent-pair swap phase (parity = i % 2)."""
        G, L = self.G, self.L
        K = G * L
        lane = jnp.arange(K)
        l = lane % L
        parity = jnp.asarray(i % 2, jnp.int32)
        partner_l = l + 1 - 2 * ((l - parity) % 2)
        valid = (partner_l >= 0) & (partner_l < L)
        partner = jnp.where(valid, lane + (partner_l - l), lane)  # (K,)

        ll_own = self._lane_ll(states, self.temps)
        ll_cross = self._lane_ll(states, self.temps[partner])
        delta = (ll_cross + ll_cross[partner]) - (ll_own + ll_own[partner])

        pair_lo = jnp.minimum(lane, partner)
        u = jax.random.uniform(
            jax.random.fold_in(self.k_swap, i), (K,), self.temps.dtype
        )
        accept = valid & (jnp.log(u[pair_lo]) < delta)

        src = jnp.where(accept, partner, lane)
        swapped = jax.tree_util.tree_map(lambda a: a[src], states)
        # report each accepted pair once, at its pair-low lane (rung index)
        return swapped, accept & (partner > lane)

    def _sweep(self, states, i):
        """One lockstep tempered sweep + (periodic) swap phase."""
        keys = jax.vmap(lambda k: jax.random.fold_in(k, i))(self.k_run)
        states, ll = jax.vmap(
            lambda s, k, t: gibbs_sweep(s, k, self.y, self.consts,
                                        self.config, t)
        )(states, keys, self.temps)
        if self.swap_every > 0:
            do_swap = (i % self.swap_every) == 0
            swapped, acc = self._swap(states, i // self.swap_every)
            states = jax.tree_util.tree_map(
                lambda a, b: jnp.where(do_swap, b, a), states, swapped
            )
            acc = jnp.where(do_swap, acc, False)
        else:
            acc = jnp.zeros((self.G * self.L,), bool)
        return states, ll, acc

    def _record(self, s, ll):
        """Cold-lane (l = 0) thinned record in internal layout."""
        cold = jax.tree_util.tree_map(
            lambda a: a.reshape((self.G, self.L) + a.shape[1:])[:, 0], s
        )
        out = {
            "theta": jax.vmap(
                lambda i: theta_from_indices(i, self.consts)
            )(cold.theta_idx),
            "beta": cold.beta,
            "threshold": cold.thresholds,
            "ll": ll.reshape(self.G, self.L)[:, 0],
        }
        if self.store_f:
            out["f"] = cold.f
        if self.store_fstar:
            ms = jax.vmap(
                lambda b: compute_mu_star(self.consts, b)
            )(cold.beta)
            out["fstar"] = cold.fstar + ms
        return out

    # -- compiled drivers -------------------------------------------------

    def advance(self, states, start, count):
        fn = self._compiled.get(("advance", count))
        if fn is None:
            def run(states, st):
                def body(carry, j):
                    s, acc = carry
                    s, _, a = self._sweep(s, st + j)
                    return (s, acc + a.astype(jnp.int32)), None

                init = (states, jnp.zeros((self.G * self.L,), jnp.int32))
                (s, acc), _ = jax.lax.scan(body, init, jnp.arange(count))
                return s, acc

            fn = jax.jit(run)
            self._compiled[("advance", count)] = fn
        return fn(states, start)

    def records(self, states, start_rec, count):
        fn = self._compiled.get(("records", count))
        if fn is None:
            thin, pre = self.thin, self.sched.pre_iterations

            def run(states, r0):
                def step(carry, r):
                    s, acc = carry
                    start = pre + (r0 + r) * thin
                    s, ll, a = self._sweep(s, start)
                    acc = acc + a.astype(jnp.int32)
                    out = self._record(s, ll)

                    def body(c, j):
                        s2, acc2 = c
                        s2, _, a2 = self._sweep(s2, start + 1 + j)
                        return (s2, acc2 + a2.astype(jnp.int32)), None

                    (s, acc), _ = jax.lax.scan(
                        body, (s, acc), jnp.arange(max(thin - 1, 0))
                    )
                    return (s, acc), out

                init = (states, jnp.zeros((self.G * self.L,), jnp.int32))
                (s, acc), outs = jax.lax.scan(step, init, jnp.arange(count))
                # (count, G, ...) -> (G, count, ...) to match run_chains
                outs = jax.tree_util.tree_map(
                    lambda a: jnp.swapaxes(a, 0, 1), outs
                )
                return s, acc, outs

            fn = jax.jit(run)
            self._compiled[("records", count)] = fn
        return fn(states, start_rec)


def run_tempered_chains(
    keys: jax.Array,
    y: jnp.ndarray,
    theta_init: jnp.ndarray,
    thresholds_init: jnp.ndarray,
    consts: GPIRTConstants,
    config: GPIRTConfig,
    *,
    sample_iterations: int,
    burn_iterations: int,
    thin: int = 1,
    n_temps: int = 4,
    max_temp: float = 32.0,
    swap_every: int = 1,
    store_f: bool = False,
    store_fstar: bool = False,
    chunk_iterations: int = 250,
    on_progress=None,
) -> Dict[str, jnp.ndarray]:
    """Tempered ensemble run; returns COLD-chain draws (G, S, ...) plus
    ensemble swap diagnostics.

    ``len(keys)`` cold chains, each backed by ``n_temps - 1`` hot lanes on a
    geometric ladder up to ``max_temp``; all G*L lanes advance in lockstep
    on the current device. Output layout matches run_chains_chunked with a
    leading (G,) chains axis, plus:
      * "swap_rate": (L-1,) mean acceptance of adjacent swaps by rung.
    """
    progs = TemperedPrograms(
        keys, y, thresholds_init, consts, config,
        n_temps=n_temps, max_temp=max_temp, swap_every=swap_every,
        sample_iterations=sample_iterations, burn_iterations=burn_iterations,
        thin=thin, store_f=store_f, store_fstar=store_fstar,
    )
    states = progs.init(theta_init)
    total = progs.total
    acc_tot = np.zeros(progs.G * progs.L, np.int64)
    swaps = 0

    done = 0
    while done < progs.sched.pre_iterations:
        c = min(chunk_iterations, progs.sched.pre_iterations - done)
        states, acc = progs.advance(states, done, c)
        acc_tot += np.asarray(acc)
        swaps += c
        done += c
        if on_progress is not None:
            on_progress(done, total)

    recs_per_chunk = max(chunk_iterations // thin, 1)
    acc_draws: Dict[str, list] = {}
    rec = 0
    while rec < progs.sched.n_samples:
        c = min(recs_per_chunk, progs.sched.n_samples - rec)
        states, acc, outs = progs.records(states, rec, c)
        acc_tot += np.asarray(acc)
        swaps += c * thin
        for name, arr in outs.items():
            acc_draws.setdefault(name, []).append(arr)
        rec += c
        if on_progress is not None:
            on_progress(min(progs.sched.pre_iterations + rec * thin, total),
                        total)

    out = {name: jnp.concatenate(v, axis=1) for name, v in acc_draws.items()}
    # per-rung acceptance: accepted (l, l+1) swaps are counted once at lane l
    # (pair-low); rung l is attempted on every phase of parity l % 2, i.e.
    # half the phases
    per_lane = acc_tot.reshape(progs.G, progs.L).mean(axis=0)
    n_phases = max(swaps // max(swap_every, 1), 1)
    rung = per_lane[: max(progs.L - 1, 1)] / max(n_phases / 2.0, 1.0)
    out["swap_rate"] = jnp.asarray(np.clip(rung, 0.0, 1.0))
    return out
