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

Compiled programs are built by module-level factories cached on the
hashable statics; the dataset / constants / keys / temperatures are jit
ARGUMENTS, so repeat runs re-trace nothing and stale-closure bugs cannot
exist (same redesign as parallel.chains, VERDICT r2 item 1).

No analog exists in the reference (single sequential chains,
R/gpirtMCMC.R:112); cites kept to the sampler blocks being tempered.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

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

try:  # jax>=0.4.35 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

__all__ = ["temperature_ladder", "run_tempered_chains", "TemperedPrograms"]


def temperature_ladder(n_temps: int, max_temp: float) -> np.ndarray:
    """Geometric ladder 1 = T_0 < ... < T_{L-1} = max_temp."""
    if n_temps < 2:
        return np.ones(max(n_temps, 1))
    return max_temp ** (np.arange(n_temps) / (n_temps - 1))


def _lane_ll(states, temps_eval, y, consts, item_axis=None,
             respondent_axis=None):
    """l_{temps_eval[k]}(S_k) for every lane: (K,) tempered data ll.

    Under item/respondent sharding the local sum covers this device's model
    shard only; one psum over the model axes completes it, so every model
    shard sees the identical swap deltas (and takes identical accept
    decisions from the replicated swap-uniform stream)."""

    def one(s, t):
        theta = theta_from_indices(s.theta_idx, consts)
        g = s.f + compute_mu(theta, s.beta)
        inv_s = 1.0 / jnp.sqrt(t)
        return jnp.sum(ordinal_ll_terms(g, y, s.thresholds, inv_s))

    ll = jax.vmap(one)(states, temps_eval)
    model_axes = tuple(a for a in (item_axis, respondent_axis)
                       if a is not None)
    if model_axes:
        ll = jax.lax.psum(ll, model_axes)
    return ll


def _swap(states, ll_own, temps, k_swap, i, G, L, y, consts, axis=None,
          item_axis=None, respondent_axis=None):
    """One even/odd adjacent-pair swap phase (parity = i % 2).

    ``ll_own`` is each lane's own-temperature data ll of the CURRENT state
    (reused from the sweep — one full likelihood pass saved per phase).
    Returns (swapped_states, post_swap_ll, accepted_pair_low): the returned
    ll corresponds to the post-swap states, so recorded (draw, ll) pairs
    stay consistent on swap-accepting sweeps (ADVICE r2).

    ``axis`` non-None means this runs INSIDE shard_map over whole groups
    (G here is the per-device group count): swaps are group-local, so the
    only cross-device coupling is the shared swap-uniform stream — every
    device draws the full ensemble's uniforms from the replicated k_swap and
    slices its block, which keeps sharded == unsharded bit-for-bit without
    any collective. ``item_axis`` / ``respondent_axis`` non-None
    additionally shard the ITEM / RESPONDENT dimensions: the
    cross-temperature lls complete via one psum per phase (see _lane_ll)
    and the uniform slice indexes by the CHAIN-axis coordinate only, so
    all model shards of a group take identical swaps.
    """
    K = G * L
    lane = jnp.arange(K)
    l = lane % L
    parity = jnp.asarray(i % 2, jnp.int32)
    partner_l = l + 1 - 2 * ((l - parity) % 2)
    valid = (partner_l >= 0) & (partner_l < L)
    partner = jnp.where(valid, lane + (partner_l - l), lane)  # (K,)

    ll_cross = _lane_ll(states, temps[partner], y, consts, item_axis,
                        respondent_axis)
    delta = (ll_cross + ll_cross[partner]) - (ll_own + ll_own[partner])

    pair_lo = jnp.minimum(lane, partner)
    ku = jax.random.fold_in(k_swap, i)
    if axis is None:
        u = jax.random.uniform(ku, (K,), temps.dtype)
    else:
        n_dev = jax.lax.psum(1, axis)
        u_full = jax.random.uniform(ku, (K * n_dev,), temps.dtype)
        u = jax.lax.dynamic_slice(
            u_full, (jax.lax.axis_index(axis) * K,), (K,)
        )
    accept = valid & (jnp.log(u[pair_lo]) < delta)

    src = jnp.where(accept, partner, lane)
    swapped = jax.tree_util.tree_map(lambda a: a[src], states)
    # after the swap lane k holds S_{partner(k)}; its own-temperature ll is
    # l_{T_k}(S_{partner(k)}) = ll_cross[partner(k)]
    ll_post = jnp.where(accept, ll_cross[partner], ll_own)
    # report each accepted pair once, at its pair-low lane (rung index)
    return swapped, ll_post, accept & (partner > lane)


def _tempered_sweep(states, i, k_run, temps, k_swap, swap_every, G, L,
                    y, consts, config, axis=None, item_axis=None,
                    respondent_axis=None):
    """One lockstep tempered sweep + (periodic) swap phase."""
    keys = jax.vmap(lambda k: jax.random.fold_in(k, i))(k_run)
    states, ll = jax.vmap(
        lambda s, k, t: gibbs_sweep(s, k, y, consts, config, t, iteration=i,
                                    item_axis=item_axis,
                                    respondent_axis=respondent_axis)
    )(states, keys, temps)
    if swap_every > 0:
        do_swap = (i % swap_every) == 0
        swapped, ll_post, acc = _swap(
            states, ll, temps, k_swap, i // swap_every, G, L, y, consts,
            axis, item_axis, respondent_axis,
        )
        states = jax.tree_util.tree_map(
            lambda a, b: jnp.where(do_swap, b, a), states, swapped
        )
        ll = jnp.where(do_swap, ll_post, ll)
        acc = jnp.where(do_swap, acc, False)
    else:
        acc = jnp.zeros((G * L,), bool)
    return states, ll, acc


def _cold_record(s, ll, G, L, consts, config, store_f, store_fstar):
    """Cold-lane (l = 0) thinned record in internal layout."""
    cold = jax.tree_util.tree_map(
        lambda a: a.reshape((G, L) + a.shape[1:])[:, 0], s
    )
    out = {
        "theta": jax.vmap(lambda i: theta_from_indices(i, consts))(
            cold.theta_idx
        ),
        "beta": cold.beta,
        "threshold": cold.thresholds,
        "ll": ll.reshape(G, L)[:, 0],
    }
    if store_f:
        out["f"] = cold.f
    if store_fstar:
        ms = jax.vmap(lambda b: compute_mu_star(consts, b))(cold.beta)
        if config.constant_IRF:
            ms = jnp.broadcast_to(ms[:, :1], ms.shape)
        out["fstar"] = cold.fstar + ms
    return out



def _lane_state_specs(axis, item_axis, respondent_axis=None):
    """PartitionSpecs for a lane-stacked (K, ...) GPIRTState: lanes shard
    over the chain axis; per-item dims over ``item_axis`` and per-respondent
    dims over ``respondent_axis`` when given."""
    from gpirt_tpu.models.gibbs import GPIRTState

    iax, rax = item_axis, respondent_axis
    if iax is None and rax is None:
        return GPIRTState(*([P(axis)] * 5))
    return GPIRTState(
        theta_idx=P(axis, None, rax),
        f=P(axis, None, rax, iax),
        beta=P(axis, None, None, iax),
        thresholds=P(axis, None, iax, None),
        fstar=P(axis, None, None, iax),
    )


def _shard_lanewise(fn, mesh, axis, out_specs, item_axis=None,
                    respondent_axis=None):
    """Wrap a (states, k_run, temps, k_swap, scalar, y, consts) -> outs
    program in shard_map over whole groups: lane-carrying inputs/outputs
    shard on axis 0 (the chain axis), per-item / per-respondent dims over
    ``item_axis`` / ``respondent_axis`` when the mesh also shards the model,
    everything else replicates. ``out_specs`` is an explicit PartitionSpec
    pytree matching fn's outputs."""
    from gpirt_tpu.parallel.respondents import consts_mesh_specs

    iax, rax = item_axis, respondent_axis

    def wrapped(states, k_run, temps, k_swap, scalar, y, consts):
        in_specs = (
            _lane_state_specs(axis, iax, rax), P(axis), P(axis), P(), P(),
            P(None, rax, iax) if (iax or rax) else P(),
            consts_mesh_specs(consts, iax, rax),
        )
        return jax.jit(shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        ))(states, k_run, temps, k_swap, scalar, y, consts)

    return wrapped


@functools.lru_cache(maxsize=32)
def _t_init_program(config: GPIRTConfig, per_group_init: bool, L: int):
    def one(key, ti, thr, y, consts):
        return init_state(key, ti, thr, y, consts, config)

    init_axis = 0 if per_group_init else None
    return jax.jit(jax.vmap(one, in_axes=(0, init_axis, None, None, None)))


@functools.lru_cache(maxsize=32)
def _t_advance_program(config: GPIRTConfig, count: int, swap_every: int,
                       G: int, L: int, mesh: Optional[Mesh] = None,
                       axis: str = "chains", item_axis: Optional[str] = None,
                       respondent_axis: Optional[str] = None):
    ax = axis if (mesh is not None and axis in mesh.shape) else None
    iax = item_axis if mesh is not None else None
    rax = respondent_axis if mesh is not None else None
    G_loc = G if ax is None else G // mesh.shape[axis]

    def run(states, k_run, temps, k_swap, start, y, consts):
        def body(carry, j):
            s, acc = carry
            s, _, a = _tempered_sweep(
                s, start + j, k_run, temps, k_swap, swap_every, G_loc, L,
                y, consts, config, ax, iax, rax,
            )
            return (s, acc + a.astype(jnp.int32)), None

        init = (states, jnp.zeros((G_loc * L,), jnp.int32))
        (s, acc), _ = jax.lax.scan(body, init, jnp.arange(count))
        return s, acc

    if mesh is None:
        return jax.jit(run)
    return _shard_lanewise(run, mesh, ax,
                           (_lane_state_specs(ax, iax, rax), P(ax)),
                           iax, rax)


@functools.lru_cache(maxsize=32)
def _t_records_program(config: GPIRTConfig, count: int, thin: int,
                       swap_every: int, G: int, L: int,
                       store_f: bool, store_fstar: bool, final: bool,
                       mesh: Optional[Mesh] = None, axis: str = "chains",
                       item_axis: Optional[str] = None,
                       respondent_axis: Optional[str] = None):
    ax = axis if (mesh is not None and axis in mesh.shape) else None
    iax = item_axis if mesh is not None else None
    rax = respondent_axis if mesh is not None else None
    G_loc = G if ax is None else G // mesh.shape[axis]

    def run(states, k_run, temps, k_swap, start0, y, consts):
        def rec_sweep(carry, start):
            s, acc = carry
            s, ll, a = _tempered_sweep(
                s, start, k_run, temps, k_swap, swap_every, G_loc, L,
                y, consts, config, ax, iax, rax,
            )
            acc = acc + a.astype(jnp.int32)
            out = _cold_record(s, ll, G_loc, L, consts, config,
                               store_f, store_fstar)
            return (s, acc), out

        def trail(carry, start):
            # static no-op at thin=1: a zero-length scan would still trace
            # (and compile) a second full tempered-sweep body into the HLO
            if thin == 1:
                return carry

            def body(c, j):
                s2, acc2 = c
                s2, _, a2 = _tempered_sweep(
                    s2, start + j, k_run, temps, k_swap, swap_every, G_loc,
                    L, y, consts, config, ax, iax, rax,
                )
                return (s2, acc2 + a2.astype(jnp.int32)), None

            carry, _ = jax.lax.scan(body, carry, jnp.arange(thin - 1))
            return carry

        def step(carry, r):
            start = start0 + r * thin
            carry, out = rec_sweep(carry, start)
            carry = trail(carry, start + 1)
            return carry, out

        init = (states, jnp.zeros((G_loc * L,), jnp.int32))
        n_full = count - 1 if final else count
        if n_full > 0:
            carry, outs = jax.lax.scan(step, init, jnp.arange(n_full))
        else:
            carry, outs = init, None
        if final:
            carry, last = rec_sweep(carry, start0 + (count - 1) * thin)
            if outs is None:
                outs = jax.tree_util.tree_map(lambda a: a[None], last)
            else:
                outs = jax.tree_util.tree_map(
                    lambda a, b: jnp.concatenate([a, b[None]], axis=0),
                    outs, last,
                )
        s, acc = carry
        # (count, G, ...) -> (G, count, ...) to match run_chains
        outs = jax.tree_util.tree_map(lambda a: jnp.swapaxes(a, 0, 1), outs)
        return s, acc, outs

    if mesh is None:
        return jax.jit(run)
    # outs carry the group axis first -> sharded like the lanes; per-item /
    # per-respondent record dims reassemble over their model axes when the
    # mesh shards the model
    rec_specs = {
        "theta": P(ax, None, None, rax),
        "beta": P(ax, None, None, None, iax),
        "threshold": P(ax, None, None, iax, None),
        "ll": P(ax),
    }
    if store_f:
        rec_specs["f"] = P(ax, None, None, rax, iax)
    if store_fstar:
        rec_specs["fstar"] = P(ax, None, None, None, iax)
    return _shard_lanewise(
        run, mesh, ax,
        (_lane_state_specs(ax, iax, rax), P(ax), rec_specs), iax, rax,
    )


class TemperedPrograms:
    """Compiled building blocks for chunked tempered-ensemble execution.

    Mirrors parallel.chains.ChunkedPrograms: init / advance(count) /
    records(count) dispatching to module-level cached programs. Lane layout:
    group-major (G, L) flattened to K = G*L; lane l runs temperature temps[l].
    """

    def __init__(self, keys, y, thresholds_init, consts, config, *,
                 n_temps, max_temp, sample_iterations, burn_iterations,
                 thin, store_f=False, store_fstar=False, swap_every=1,
                 mesh=None, axis="chains", item_axis=None,
                 respondent_axis=None):
        from gpirt_tpu.parallel.chains import canonical_mesh

        mesh = canonical_mesh(mesh)  # ADVICE r3: stable lru_cache keys
        if config.resolved_f_method != "conjugate":
            raise NotImplementedError(
                "parallel tempering needs f_method='conjugate'"
            )
        if item_axis is not None and (mesh is None
                                      or item_axis not in mesh.shape):
            raise ValueError(
                f"item_axis={item_axis!r} needs a mesh with that axis name"
            )
        if respondent_axis is not None and (
                mesh is None or respondent_axis not in mesh.shape):
            raise ValueError(
                f"respondent_axis={respondent_axis!r} needs a mesh with "
                "that axis name"
            )
        if mesh is not None:
            n_chain_dev = mesh.shape.get(axis, 1)
            if int(keys.shape[0]) % n_chain_dev != 0:
                raise ValueError(
                    f"{int(keys.shape[0])} tempered groups do not divide "
                    f"over {n_chain_dev} chain shards (swaps are group-"
                    "local, so the lane axis shards by whole groups)"
                )
            if item_axis is not None:
                m = int(y.shape[-1])
                if m % mesh.shape[item_axis] != 0:
                    raise ValueError(
                        f"m={m} does not divide over "
                        f"{mesh.shape[item_axis]} item shards"
                    )
            if respondent_axis is not None:
                n = int(y.shape[-2])
                if n % mesh.shape[respondent_axis] != 0:
                    raise ValueError(
                        f"n={n} does not divide over "
                        f"{mesh.shape[respondent_axis]} respondent shards"
                    )
        self.mesh = mesh
        self.axis = axis
        self.item_axis = item_axis
        self.respondent_axis = respondent_axis
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

    def init(self, theta_init):
        theta_init = jnp.asarray(theta_init, self.config.jdtype)
        per_group = theta_init.ndim == 3
        if per_group:  # (G, H, n) per-group inits -> tile lanes
            theta_init = jnp.repeat(theta_init, self.L, axis=0)
        fn = _t_init_program(self.config, per_group, self.L)
        return fn(self.k_init, theta_init, self.thresholds_init, self.y,
                  self.consts)

    def advance(self, states, start, count):
        fn = _t_advance_program(self.config, count, self.swap_every,
                                self.G, self.L, self.mesh, self.axis,
                                self.item_axis, self.respondent_axis)
        return fn(states, self.k_run, self.temps, self.k_swap, start,
                  self.y, self.consts)

    def records(self, states, start_rec, count, final=False):
        fn = _t_records_program(
            self.config, count, self.thin, self.swap_every, self.G, self.L,
            self.store_f, self.store_fstar, bool(final) and self.thin > 1,
            self.mesh, self.axis, self.item_axis, self.respondent_axis,
        )
        start0 = self.sched.pre_iterations + start_rec * self.thin
        return fn(states, self.k_run, self.temps, self.k_swap, start0,
                  self.y, self.consts)


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
    mesh: Optional[Mesh] = None,
    axis: str = "chains",
    item_axis: Optional[str] = None,
    respondent_axis: Optional[str] = None,
) -> Dict[str, jnp.ndarray]:
    """Tempered ensemble run; returns COLD-chain draws (G, S, ...) plus
    ensemble swap diagnostics.

    ``len(keys)`` cold chains, each backed by ``n_temps - 1`` hot lanes on a
    geometric ladder up to ``max_temp``; all G*L lanes advance in lockstep.
    ``mesh`` shards the lane axis by WHOLE groups over ``mesh[axis]`` (swaps
    are group-local, so sampling needs zero collectives — the only
    cross-device coupling is the replicated swap-uniform stream, and sharded
    equals unsharded bit-for-bit). Requires G %% mesh.shape[axis] == 0.
    ``item_axis`` additionally shards the ITEM dimension over
    ``mesh[item_axis]`` (a 2-D groups x items mesh, parallel/items.py
    semantics: per-item state/blocks device-local, one theta-table psum per
    sweep; the swap phase adds one (K,)-sized ll psum per phase, and all
    item shards of a group take identical swap decisions from the
    replicated uniform stream). Requires m %% mesh.shape[item_axis] == 0;
    the item-sharded run is NOT bitwise the unsharded one (per-item key
    streams fold the shard index — a different, equally valid sampler).
    ``respondent_axis`` is the dual (parallel/respondents.py semantics:
    per-respondent state/blocks device-local, per-item conditionals
    completed by sufficient-statistic psums; requires
    n %% mesh.shape[respondent_axis] == 0) and composes with both other
    axes up to a 3-D chains x items x respondents tempered mesh.
    Output layout matches run_chains_chunked with a leading (G,) chains
    axis, plus:
      * "swap_rate": (L-1,) mean acceptance of adjacent swaps by rung.
    """
    progs = TemperedPrograms(
        keys, y, thresholds_init, consts, config,
        n_temps=n_temps, max_temp=max_temp, swap_every=swap_every,
        sample_iterations=sample_iterations, burn_iterations=burn_iterations,
        thin=thin, store_f=store_f, store_fstar=store_fstar,
        mesh=mesh, axis=axis, item_axis=item_axis,
        respondent_axis=respondent_axis,
    )
    states = progs.init(theta_init)
    total = progs.total
    acc_tot = np.zeros(progs.G * progs.L, np.int64)
    swaps = 0
    pre = progs.sched.pre_iterations

    # aligned mode (parallel.chains.aligned_records_chunk): the burn phase
    # rides the records program — identical sweep/swap schedule, outputs
    # discarded — so the whole tempered run shares one compiled
    # sweep-bearing program.
    from gpirt_tpu.parallel.chains import aligned_records_chunk

    rc = aligned_records_chunk(pre, progs.sched.n_samples, thin,
                               chunk_iterations)
    done = 0
    if rc is not None:
        while done < pre:
            states, acc, _ = progs.records(states, (done - pre) // thin, rc)
            acc_tot += np.asarray(acc)
            swaps += rc * thin
            done += rc * thin
            if on_progress is not None:
                on_progress(done, total)
        recs_per_chunk = rc
    else:
        while done < pre:
            c = min(chunk_iterations, pre - done)
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
        final = rec + c == progs.sched.n_samples
        states, acc, outs = progs.records(states, rec, c, final=final)
        acc_tot += np.asarray(acc)
        swaps += c * thin - (thin - 1 if final and thin > 1 else 0)
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
