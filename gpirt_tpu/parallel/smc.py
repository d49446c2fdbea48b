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
    GPIRTState,
    compute_mu,
    gibbs_sweep,
    init_state,
    theta_from_indices,
)
from gpirt_tpu.ops.likelihood import ordinal_ll_terms

__all__ = ["anneal_init", "anneal_init_batched", "annealing_schedule"]


def annealing_schedule(n_steps: int, max_temp: float) -> np.ndarray:
    """Geometric T_max -> 1 over n_steps (first entry T_max, last 1.0)."""
    if n_steps < 2:
        return np.ones(max(n_steps, 1))
    return max_temp ** (1.0 - np.arange(n_steps) / (n_steps - 1))


_WARM_STEPS = 8


@functools.lru_cache(maxsize=32)
def _programs(config: GPIRTConfig, K: int, n_steps: int, max_temp: float,
              sweeps_per_step: int, ess_threshold: float,
              per_chain_init: bool, mesh=None, axis: str = "chains",
              item_axis=None, respondent_axis=None):
    """Compiled (init, run, final_resample), keyed on statics only; the
    dataset, constants and keys are jit arguments.

    The T_max warm phase rides INSIDE run's annealing scan as
    ``_WARM_STEPS`` prologue entries with t_prev == t_new == T_max: the
    likelihood-ratio reweight is exactly zero (XLA CSEs the two identical
    _lane_ll calls into one), uniform weights keep ESS == K so no resample
    triggers, and the mutation sweeps at temps[0] are precisely the old
    warm loop. This halves the number of gibbs_sweep-bearing programs —
    in this image every fresh process pays minutes of remote compile per
    such program, and warm's compile bought nothing run's couldn't.

    ``mesh`` shards the chain axis over devices. Mutation and reweight are
    per-lane (embarrassingly parallel); only resampling is global. All
    weight math (logsumexp, ESS, cumsum, searchsorted) runs on the
    all-gathered FULL (K,) weight vector identically on every device — K
    scalars, so the gather is free and, unlike psum-of-partials, keeps the
    reduction order identical to the single-device program. The residual
    sharded-vs-unsharded difference is machine epsilon carried in from the
    lane states (the mutation sweeps compile at local batch K/n_dev, so
    XLA fuses them differently; measured ~2e-14 relative), which the
    identical-order weight math then preserves rather than amplifies.
    State exchange is one tiled all_gather of the lane
    pytree per step (~K x state bytes over ICI; a resample-gated variant
    could skip it on no-resample steps, but collectives under lax.cond
    constrain layouts and the measured cost at bench scale is ~ms).

    ``item_axis`` additionally shards the ITEM dimension over that mesh
    axis (2-D chains x items mesh; parallel/items.py): mutation sweeps run
    item-sharded (gibbs_sweep's item_axis), the reweight's per-lane ll
    gains an item psum, and resampling's lane gathers ride the chain axis
    only (per-item leaves stay sharded). Weights/ESS/indices are identical
    on every item shard by the psum'd-ll construction. ``respondent_axis``
    is the dual (parallel/respondents.py): per-respondent state shards,
    the reweight ll gains a respondent psum, and the lane gathers again
    ride the chain axis only — composing to the full 3-D mesh. A mesh
    WITHOUT a chain axis (e.g. make_respondent_mesh(8)) replicates the
    lanes on every model shard (ax = None: weight math and resampling run
    identically everywhere with zero lane collectives)."""
    temps = jnp.asarray(annealing_schedule(n_steps, max_temp), config.jdtype)
    ax = axis if (mesh is not None and axis in mesh.shape) else None
    n_dev = 1 if ax is None else mesh.shape[axis]
    K_loc = K // n_dev
    iax = item_axis
    rax = respondent_axis

    def _gather_vec(x):  # (K_loc,) -> (K,) in device order
        if ax is None:
            return x
        return jax.lax.all_gather(x, ax, tiled=True)

    def _local_slice(full):  # (K,) -> (K_loc,) this device's block
        if ax is None:
            return full
        i0 = jax.lax.axis_index(ax) * K_loc
        return jax.lax.dynamic_slice_in_dim(full, i0, K_loc)

    def _take_global(states, src_full):
        """states[src] where src indexes GLOBAL lanes: gather the full lane
        pytree, then keep this device's block of targets."""
        src = _local_slice(src_full)
        if ax is None:
            return jax.tree_util.tree_map(lambda a: a[src], states)
        full = jax.tree_util.tree_map(
            lambda a: jax.lax.all_gather(a, ax, tiled=True), states
        )
        return jax.tree_util.tree_map(lambda a: a[src], full)

    def _lane_ll(states, t, y, consts):
        def one(s):
            theta = theta_from_indices(s.theta_idx, consts)
            g = s.f + compute_mu(theta, s.beta)
            return jnp.sum(ordinal_ll_terms(g, y, s.thresholds,
                                            1.0 / jnp.sqrt(t)))
        ll = jax.vmap(one)(states)
        model_axes = tuple(a for a in (iax, rax) if a is not None)
        if model_axes:
            ll = jax.lax.psum(ll, model_axes)
        return ll

    def _systematic_src(w_full, u):
        pos = (jnp.arange(K, dtype=w_full.dtype) + u) / K
        return jnp.clip(jnp.searchsorted(jnp.cumsum(w_full), pos), 0, K - 1)

    init_axis = 0 if per_chain_init else None

    def init(k_init, theta_init, thresholds_init, y, consts):
        return jax.vmap(
            lambda k, t: init_state(k, t, thresholds_init, y, consts, config,
                                    iax),
            in_axes=(0, init_axis),
        )(k_init, theta_init)

    def run(states, k_run, k_res, y, consts):
        def step(carry, xs):
            s, logw = carry
            i, t_prev, t_new = xs
            # 1) reweight by the tempered-likelihood ratio at the CURRENT
            #    particles (SMC sampler with MCMC moves)
            logw = logw + _lane_ll(s, t_new, y, consts) \
                - _lane_ll(s, t_prev, y, consts)
            # 2) resample (systematic) when weight ESS < threshold*K
            logw_full = _gather_vec(logw)
            lw = logw_full - jax.scipy.special.logsumexp(logw_full)
            w = jnp.exp(lw)
            ess_w = 1.0 / jnp.sum(w * w)
            u = jax.random.uniform(jax.random.fold_in(k_res, i), ())
            idx = _systematic_src(w, u)
            do = ess_w < ess_threshold * K
            if ax is None:
                # gate the full-state lane gather: ~2/3 of steps skip the
                # resample. Measured at bench scale (senate116, 64 chains,
                # 320 steps) the win is only ~1% — the unconditional lane
                # gather was already cheap — but the gate is exact
                # (identical resample decisions, scripts/probe_smc_wall.py)
                # and its saving grows with lane-state bytes. Single-device
                # only: under a mesh the gather is an all_gather
                # collective, which cannot sit under lax.cond.
                s = jax.lax.cond(
                    do,
                    lambda ss: jax.tree_util.tree_map(lambda a: a[idx], ss),
                    lambda ss: ss,
                    s,
                )
            else:
                src = jnp.where(do, idx, jnp.arange(K))
                s = _take_global(s, src)
            logw = jnp.where(do, jnp.zeros_like(logw), logw)
            # 3) mutate: tempered sweeps at t_new
            for r in range(sweeps_per_step):
                kk = jax.vmap(
                    lambda k: jax.random.fold_in(jax.random.fold_in(k, i), r)
                )(k_run)
                s, _ = jax.vmap(
                    lambda cs, k: gibbs_sweep(cs, k, y, consts, config, t_new,
                                              iteration=i, item_axis=iax,
                                              respondent_axis=rax)
                )(s, kk)
            return (s, logw), (ess_w, do)

        # warm prologue: step ids n_steps+1.. at constant T_max (disjoint
        # from the annealing ids 1..n_steps-1; warm's k_res fold at
        # n_steps+1 collides with final_resample's, harmlessly — warm
        # weights are uniform so its resample-u is drawn and discarded)
        warm_i = n_steps + 1 + jnp.arange(_WARM_STEPS, dtype=jnp.int32)
        tmax = jnp.full((_WARM_STEPS,), temps[0], temps.dtype)
        xs = (
            jnp.concatenate([warm_i,
                             jnp.arange(1, n_steps, dtype=jnp.int32)]),
            jnp.concatenate([tmax, temps[:-1]]),
            jnp.concatenate([tmax, temps[1:]]),
        )
        (s, logw), (ess_trace, resampled) = jax.lax.scan(
            step, (states, jnp.zeros(K_loc, config.jdtype)), xs
        )
        return s, logw, ess_trace[_WARM_STEPS:], resampled[_WARM_STEPS:]

    def final_resample(states, logw, k_res):
        logw_full = _gather_vec(logw)
        lw = logw_full - jax.scipy.special.logsumexp(logw_full)
        w = jnp.exp(lw)
        u = jax.random.uniform(jax.random.fold_in(k_res, n_steps + 1), ())
        idx = _systematic_src(w, u)
        return _take_global(states, idx), w

    if mesh is None:
        return jax.jit(init), jax.jit(run), jax.jit(final_resample)

    from jax.sharding import PartitionSpec as P
    try:
        shard_map = jax.shard_map
    except AttributeError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    from gpirt_tpu.parallel.respondents import consts_mesh_specs

    # lane-stacked GPIRTState specs: chains on `ax` (None when the mesh
    # carries no chain axis — lanes replicated per model shard); per-item
    # leaves on `item_axis`, per-respondent leaves on `respondent_axis`
    if iax is None and rax is None:
        state_specs = GPIRTState(theta_idx=P(ax), f=P(ax), beta=P(ax),
                                 thresholds=P(ax), fstar=P(ax))
    else:
        state_specs = GPIRTState(
            theta_idx=P(ax, None, rax),
            f=P(ax, None, rax, iax),
            beta=P(ax, None, None, iax),
            thresholds=P(ax, None, iax, None),
            fstar=P(ax, None, None, iax),
        )
    y_spec = P(None, rax, iax) if (iax or rax) else P()
    thr_spec = P(None, iax, None) if iax is not None else P()
    ti_spec = P(ax, None, rax) if per_chain_init else P(None, rax)

    def sharded_init(k_init, theta_init, thresholds_init, y, consts):
        fn = shard_map(
            init, mesh=mesh,
            in_specs=(P(ax), ti_spec, thr_spec,
                      y_spec, consts_mesh_specs(consts, iax, rax)),
            out_specs=state_specs, check_vma=False,
        )
        return jax.jit(fn)(k_init, theta_init, thresholds_init, y, consts)

    def sharded_run(states, k_run, k_res, y, consts):
        fn = shard_map(
            run, mesh=mesh,
            in_specs=(state_specs, P(ax), P(),
                      y_spec, consts_mesh_specs(consts, iax, rax)),
            # ess/resample traces are computed identically on every device
            out_specs=(state_specs, P(ax), P(), P()), check_vma=False,
        )
        return jax.jit(fn)(states, k_run, k_res, y, consts)

    def sharded_final(states, logw, k_res):
        fn = shard_map(
            final_resample, mesh=mesh,
            in_specs=(state_specs, P(ax), P()),
            out_specs=(state_specs, P()), check_vma=False,
        )
        return jax.jit(fn)(states, logw, k_res)

    return sharded_init, sharded_run, sharded_final


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
    mesh=None,
    axis: str = "chains",
    item_axis=None,
    respondent_axis=None,
):
    """Anneal K chains from T=max_temp to T=1. Returns (states, info).

    ``states`` is the lane-stacked GPIRTState pytree at T = 1 (feed it to
    run_chains_chunked(initial_states=...), or run_chains(mesh=...) when
    annealed over a mesh). ``info`` carries the weight-ESS trace and
    resample count. Requires the conjugate path (the tempered family).

    ``mesh`` shards the chain axis over devices: mutation/reweight are
    lane-local, resampling all-gathers the K-scalar weight vector (and,
    on resample steps, the lane states) so every device computes the same
    global systematic-resampling indices — the sharded run matches the
    unsharded run to reduction-order rounding (see _programs). K must
    divide by mesh.shape[axis]. ``item_axis`` names a second mesh axis to
    shard the item dimension (2-D chains x items; the returned states are
    item-sharded and feed run_chains_itemsharded(initial_states=...));
    ``respondent_axis`` the dual (states feed
    run_chains_respondentsharded(initial_states=...)), composing to the
    full 3-D mesh. A mesh without a chain axis (model-only sharding)
    replicates the lanes per model shard.
    """
    if config.resolved_f_method != "conjugate":
        raise NotImplementedError("anneal_init needs f_method='conjugate'")
    from gpirt_tpu.parallel.chains import canonical_mesh

    mesh = canonical_mesh(mesh)  # ADVICE r3: stable lru_cache keys
    K = int(keys.shape[0])
    for name, ax_name in (("item_axis", item_axis),
                          ("respondent_axis", respondent_axis)):
        if ax_name is not None and (mesh is None or ax_name not in mesh.shape):
            raise ValueError(
                f"{name}={ax_name!r} needs a mesh carrying that axis"
            )
    if mesh is not None:
        if axis in mesh.shape:
            if K % mesh.shape[axis] != 0:
                raise ValueError(
                    f"{K} chains do not divide over {mesh.shape[axis]} "
                    "chain-axis devices"
                )
        elif item_axis is None and respondent_axis is None:
            raise ValueError(f"mesh has no chain axis named {axis!r}")
        if item_axis is not None and int(y.shape[-1]) % mesh.shape[item_axis]:
            raise ValueError(
                f"m={int(y.shape[-1])} does not divide over "
                f"{mesh.shape[item_axis]} item shards"
            )
        if respondent_axis is not None and \
                int(y.shape[-2]) % mesh.shape[respondent_axis]:
            raise ValueError(
                f"n={int(y.shape[-2])} does not divide over "
                f"{mesh.shape[respondent_axis]} respondent shards"
            )
    theta_init = jnp.asarray(theta_init, config.jdtype)
    init, run, final_resample = _programs(
        config, K, n_steps, float(max_temp), sweeps_per_step,
        float(ess_threshold), theta_init.ndim == 3, mesh, axis, item_axis,
        respondent_axis,
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


@functools.lru_cache(maxsize=16)
def _batched_program(config: GPIRTConfig, K: int, n_steps: int,
                     max_temp: float, sweeps_per_step: int,
                     ess_threshold: float, per_chain_init: bool,
                     mesh=None, campaign_axis: str = "campaigns"):
    """ONE compiled program annealing B independent K-chain campaigns.

    Per-campaign semantics are exactly ``anneal_init``'s: the single-campaign
    init/run/final_resample closures are vmapped over a leading campaign
    axis, so every cross-lane operation (weight logsumexp, ESS, systematic
    resampling) stays campaign-local by construction — campaign b of the
    batch equals a solo ``anneal_init`` run with the same keys, to
    compile-level float associativity (the extra batch dim changes XLA's
    fusions; measured ~2e-14 relative in float64,
    tests/test_campaigns.py). Batching exists
    because (a) each compiled gibbs-bearing program costs minutes of remote
    compile in this image and the batch needs ONE for all three stages of
    all B campaigns, and (b) a single device execution amortizes per-call
    dispatch across campaigns.

    ``mesh`` shard_maps the campaign axis over ``campaign_axis`` devices:
    campaigns are embarrassingly parallel (no collectives inside), so the
    sharded program is literally the local-batch program per device.
    """
    init, run, final_resample = _programs(
        config, K, n_steps, max_temp, sweeps_per_step, ess_threshold,
        per_chain_init)

    def one_campaign(camp_keys, theta_init, thresholds_init, y, consts):
        # same key derivation as anneal_init: per-campaign keys -> lanes
        lane = jax.vmap(lambda k: jax.random.split(k, 3))(camp_keys)
        k_init, k_run, k_res = lane[:, 0], lane[:, 1], lane[0, 2]
        s = init(k_init, theta_init, thresholds_init, y, consts)
        s, logw, ess_trace, resampled = run(s, k_run, k_res, y, consts)
        s, w = final_resample(s, logw, k_res)
        return s, w, ess_trace, resampled

    batched = jax.vmap(one_campaign, in_axes=(0, None, None, None, None))
    if mesh is None:
        return jax.jit(batched)

    from jax.sharding import PartitionSpec as P
    try:
        shard_map = jax.shard_map
    except AttributeError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    cax = campaign_axis
    state_specs = GPIRTState(*([P(cax)] * 5))
    # P() as a pytree prefix replicates the whole consts dataclass
    fn = shard_map(
        batched, mesh=mesh,
        in_specs=(P(cax), P(), P(), P(), P()),
        out_specs=(state_specs, P(cax), P(cax), P(cax)), check_vma=False,
    )
    return jax.jit(fn)


def anneal_init_batched(
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
    mesh=None,
    campaign_axis: str = "campaigns",
):
    """Anneal B independent K-chain campaigns in one device program.

    ``keys`` is a (B, K) key array — row b seeds campaign b's chains, and
    campaign b's results equal a solo ``anneal_init(keys[b], ...)`` run
    (weight math and resampling are campaign-local; see _batched_program).
    ``theta_init`` is shared across campaigns ((H, n), or (K, H, n) for
    per-chain overdispersed inits). Returns ``(states, info)`` where every
    ``states`` leaf carries a leading (B, K) and ``info`` arrays carry a
    leading campaign axis: ``weight_ess`` (B, n_steps-1), ``n_resamples``
    (B,), ``final_weight_ess`` (B,).

    ``mesh`` shards campaigns over the ``campaign_axis`` axis (B must
    divide by its size); data, inits and constants are replicated. The
    reference has no analog — one sequential chain per run
    (/root/reference/R/gpirtMCMC.R:112).
    """
    if config.resolved_f_method != "conjugate":
        raise NotImplementedError("anneal_init needs f_method='conjugate'")
    from gpirt_tpu.parallel.chains import canonical_mesh

    mesh = canonical_mesh(mesh)
    B, K = int(keys.shape[0]), int(keys.shape[1])
    if mesh is not None:
        if campaign_axis not in mesh.shape:
            raise ValueError(f"mesh has no axis named {campaign_axis!r}")
        if B % mesh.shape[campaign_axis] != 0:
            raise ValueError(
                f"{B} campaigns do not divide over "
                f"{mesh.shape[campaign_axis]} campaign-axis devices")
    theta_init = jnp.asarray(theta_init, config.jdtype)
    prog = _batched_program(
        config, K, n_steps, float(max_temp), sweeps_per_step,
        float(ess_threshold), theta_init.ndim == 3, mesh, campaign_axis)
    states, w, ess_trace, resampled = prog(
        keys, theta_init, jnp.asarray(thresholds_init, config.jdtype),
        y, consts)
    w = np.asarray(w)  # (B, K)
    info = {
        "weight_ess": np.asarray(ess_trace),
        "n_resamples": np.asarray(resampled).sum(axis=1).astype(int) + 1,
        "final_weight_ess": 1.0 / np.sum(w * w, axis=1),
    }
    return states, info
