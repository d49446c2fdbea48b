"""The MCMC driver: burn-in, thinning, storage — all under ``lax.scan``.

The reference's sequential hot loop (src/gpirtMCMC.cpp:261-356) becomes one
compiled program: a burn-in scan with no outputs followed by a sampling scan
that emits exactly the thinned draws (no host round-trips per iteration, no
post-hoc slicing of an over-stored array).

Storage semantics match the reference: a draw is recorded at absolute
iteration ``iter`` iff ``iter >= burn`` and ``iter % THIN == 0``
(src/gpirtMCMC.cpp:334); theta/beta/threshold/ll always, f and fstar only when
requested (store_f / store_fstar memory control, with the same memory-estimate
model src/gpirtMCMC.cpp:47-82).
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from gpirt_tpu.models.config import GPIRTConfig, GPIRTConstants
from gpirt_tpu.models.gibbs import (
    compute_mu_star,
    gibbs_sweep,
    init_state,
    theta_from_indices,
)

__all__ = ["run_chain", "sample_schedule", "memory_estimate_mb"]


class SampleSchedule(NamedTuple):
    pre_iterations: int  # unrecorded sweeps before the first stored draw
    n_samples: int  # stored draws
    thin: int


def sample_schedule(sample_iterations: int, burn_iterations: int, thin: int) -> SampleSchedule:
    """Translate (sample, burn, THIN) into scan lengths.

    Stored absolute iterations are {iter : iter >= burn, iter % THIN == 0}.
    The first stored iteration is ``burn + r`` with ``r = (-burn) % THIN``;
    subsequent ones are THIN apart.
    """
    total = sample_iterations + burn_iterations
    r = (-burn_iterations) % thin
    first = burn_iterations + r
    if first >= total:
        return SampleSchedule(pre_iterations=total, n_samples=0, thin=thin)
    n_samples = (total - 1 - first) // thin + 1
    return SampleSchedule(pre_iterations=first, n_samples=n_samples, thin=thin)


def memory_estimate_mb(
    n: int, m: int, horizon: int, C: int, n_samples: int, grid_size: int,
    store_f: bool, store_fstar: bool, bytes_per_el: int = 8,
) -> Dict[str, float]:
    """Reference memory-estimate model (src/gpirtMCMC.cpp:47-58)."""
    mb = 1024.0 * 1024.0
    est = {
        "theta": n_samples * n * horizon * bytes_per_el / mb,
        "beta": n_samples * 3 * m * horizon * bytes_per_el / mb,
        "f": n_samples * n * m * horizon * bytes_per_el / mb,
        "fstar": n_samples * grid_size * m * horizon * bytes_per_el / mb,
        "threshold": n_samples * m * (C + 1) * horizon * bytes_per_el / mb,
    }
    total = est["theta"] + est["beta"] + est["threshold"]
    if store_f:
        total += est["f"]
    if store_fstar:
        total += est["fstar"]
    est["total"] = total
    return est


def run_chain(
    key: jax.Array,
    y: jnp.ndarray,
    theta_init: jnp.ndarray,
    thresholds_init: jnp.ndarray,
    consts: GPIRTConstants,
    config: GPIRTConfig,
    sample_iterations: int,
    burn_iterations: int,
    thin: int = 1,
    store_f: bool = False,
    store_fstar: bool = False,
    initial_state=None,
    item_axis=None,
    respondent_axis=None,
) -> Dict[str, jnp.ndarray]:
    """Run one MCMC chain; returns a dict of stacked draws.

    Fully traceable: can be jit-ed, vmap-ed over chains, or shard_map-ed over
    a device mesh. Keys are folded per-iteration (counter-based), the JAX
    analog of the reference's deterministic per-iteration reseeding
    (src/gpirtMCMC.cpp:267).

    ``initial_state`` (a GPIRTState) skips the prior init — e.g. resuming
    from an SMC-annealed ensemble member. The key schedule is unchanged
    (k_init is split but unused) so a given (key, iteration) always maps to
    the same sweep randomness with or without a supplied state.

    ``item_axis``: mesh axis name when the ITEM dimension is sharded across
    devices (run under shard_map via parallel/items.py). y, thresholds and
    the per-item state/draws are this device's item shard; see
    gibbs_sweep's item_axis notes for the key/collective discipline.

    ``respondent_axis``: mesh axis name when the RESPONDENT dimension is
    sharded (parallel/respondents.py). y, theta_init and the per-respondent
    state/draws are this device's respondent shard; beta/thresholds/fstar
    stay replicated (their draws complete via psums of small sufficient
    statistics — see gibbs_sweep). Composes with ``item_axis``.

    Returns:
      dict with "theta" (S, H, n), "beta" (S, H, 3, m),
      "threshold" (S, H, m, C+1), "ll" (S,), and optionally "f" (S, H, n, m)
      and "fstar" (S, H, N, m).
    """
    sched = sample_schedule(sample_iterations, burn_iterations, thin)
    k_init, k_run = jax.random.split(key)
    if initial_state is None:
        state = init_state(k_init, theta_init, thresholds_init, y, consts,
                           config, item_axis)
        # under respondent sharding init_state is already correct as-is:
        # beta/fstar are drawn from the (replicated or item-folded) key —
        # identical on every respondent shard — and f/theta_idx are local
        # gathers of the replicated fstar at this shard's theta rows
    else:
        state = initial_state

    def sweep(state, it):
        return gibbs_sweep(state, jax.random.fold_in(k_run, it), y, consts,
                           config, iteration=it, item_axis=item_axis,
                           respondent_axis=respondent_axis)

    def advance(state, start, count):
        if count <= 0:
            return state, jnp.zeros((), config.jdtype)
        def body(s, it):
            s, ll = sweep(s, it)
            return s, ll
        state, lls = jax.lax.scan(body, state, start + jnp.arange(count))
        return state, lls[-1]

    # burn-in + alignment sweeps (no outputs kept)
    state, ll = advance(state, 0, sched.pre_iterations)

    def record(state, ll):
        out = {
            "theta": theta_from_indices(state.theta_idx, consts),
            "beta": state.beta,
            "threshold": state.thresholds,
            "ll": ll,
        }
        if store_f:
            out["f"] = state.f
        if store_fstar:
            # stored fstar includes the parametric mean, matching the
            # reference's returned IRF latent (src/draw-fstar.cpp:52);
            # internally fstar is the zero-mean GP part. constant_IRF shares
            # the slice-0 mean across horizons (src/draw-fstar.cpp:115-124).
            ms = compute_mu_star(consts, state.beta)
            if config.constant_IRF:
                ms = jnp.broadcast_to(ms[:1], ms.shape)
            out["fstar"] = state.fstar + ms
        return out

    if sched.n_samples == 0:
        empty = jax.tree_util.tree_map(
            lambda v: jnp.zeros((0,) + v.shape, v.dtype), record(state, ll)
        )
        return empty

    # The sampling scan: each step records the current state's draw, then
    # advances `thin` sweeps. Step s covers absolute iterations
    # [pre + s*thin, pre + (s+1)*thin); the recorded draw is the state after
    # absolute iteration pre + s*thin - 1... i.e. we advance one sweep first.
    def sample_step(carry, s):
        state = carry
        start = sched.pre_iterations + s * thin
        state, ll = advance(state, start, 1)  # the recorded sweep
        out = record(state, ll)
        # thinning sweeps between records
        state, _ = advance(state, start + 1, thin - 1)
        return state, out

    # Number the recorded sweep s as absolute iteration pre + s*thin. The
    # reference records the state *after* iteration `iter` completes when
    # iter % THIN == 0; here `advance(start, 1)` runs exactly that iteration.
    state, draws = jax.lax.scan(
        sample_step, state, jnp.arange(sched.n_samples)
    )
    return draws
