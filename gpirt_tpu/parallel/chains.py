"""Multi-chain parallelism over a TPU device mesh.

The reference runs chains sequentially in R (R/gpirtMCMC.R:112). Here chains
are a batch axis: ``vmap`` inside one chip, ``shard_map`` across a
``jax.sharding.Mesh`` so each device runs its shard of chains with zero
cross-device traffic during sampling (MCMC chains are embarrassingly
parallel; the only cross-chain computation is pooled diagnostics afterwards).

shard_map (rather than plain jit-with-sharded-inputs) is deliberate: each
device's chains run their ESS while-loops independently — no global
lock-step synchronization of rejection rounds across devices.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from gpirt_tpu.models.config import GPIRTConfig, GPIRTConstants
from gpirt_tpu.models.gibbs import gibbs_sweep, init_state, theta_from_indices
from gpirt_tpu.models.sampler import run_chain

try:  # jax>=0.4.35 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

__all__ = ["run_chains", "run_chains_chunked", "make_chain_mesh", "chain_keys",
           "ChunkedPrograms"]


def make_chain_mesh(n_devices: Optional[int] = None, axis: str = "chains") -> Mesh:
    """A 1-D mesh over the first ``n_devices`` devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def chain_keys(seed: int, n_chains: int) -> jax.Array:
    """Per-chain keys seeded SEED, SEED+1, ... (R/gpirtMCMC.R:114 semantics)."""
    return jax.vmap(lambda s: jax.random.key(s))(seed + jnp.arange(n_chains))


def run_chains(
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
    store_f: bool = False,
    store_fstar: bool = False,
    mesh: Optional[Mesh] = None,
    axis: str = "chains",
) -> Dict[str, jnp.ndarray]:
    """Run ``len(keys)`` chains; returns draws with a leading chains axis.

    Data, inits and GP constants are replicated; the chains axis is sharded
    over ``mesh`` when given (len(keys) must divide by mesh size). Chain k's
    stochasticity comes entirely from ``keys[k]`` (initial values are drawn
    from the priors per chain, like the reference's per-chain set.seed).
    """
    n_chains = keys.shape[0]
    theta_init = jnp.asarray(theta_init, config.jdtype)
    thresholds_init = jnp.asarray(thresholds_init, config.jdtype)
    # theta_init may carry a per-chain leading axis (overdispersed inits)
    per_chain_init = theta_init.ndim == 3
    init_axis = 0 if per_chain_init else None
    init_spec = P(axis) if per_chain_init else P()

    def one_chain(key, y, theta_init, thresholds_init, consts):
        return run_chain(
            key, y, theta_init, thresholds_init, consts, config,
            sample_iterations=sample_iterations,
            burn_iterations=burn_iterations,
            thin=thin, store_f=store_f, store_fstar=store_fstar,
        )

    vmapped = jax.vmap(one_chain, in_axes=(0, None, init_axis, None, None))

    if mesh is None:
        return jax.jit(vmapped)(keys, y, theta_init, thresholds_init, consts)

    if n_chains % mesh.devices.size != 0:
        raise ValueError(
            f"{n_chains} chains do not divide evenly over {mesh.devices.size} devices"
        )

    sharded = shard_map(
        vmapped,
        mesh=mesh,
        in_specs=(P(axis), P(), init_spec, P(), P()),
        out_specs=P(axis),
        check_vma=False,
    )
    return jax.jit(sharded)(keys, y, theta_init, thresholds_init, consts)


def run_chains_chunked(
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
    store_f: bool = False,
    store_fstar: bool = False,
    chunk_iterations: int = 250,
    on_progress=None,
    initial_states=None,
) -> Dict[str, jnp.ndarray]:
    """``run_chains`` split into bounded device executions.

    One monolithic XLA execution of a long scan can exceed runtime execution
    limits (a >60 s single call was observed to fault the tunneled TPU
    runtime at 64 chains x 2500 iterations). This driver runs the same key
    schedule as ``run_chains`` (iteration i uses fold_in(k_run_chain, i)) in
    bounded pieces, so results match up to compile-level float associativity:

      * a burn/alignment phase of ~``chunk_iterations``-sweep device calls
        with no outputs, then
      * a record-structured sampling phase — each scan step records one
        thinned draw then advances ``thin - 1`` sweeps (run_chain's
        sample_step), so chunks emit exactly the thinned draws. No post-hoc
        gathers, no overrun past the requested total, and at most two
        compiled programs per phase (full chunk + final partial).

    Recorded draws stay device-resident (concatenated device buffers); fetch
    or reduce them with device-side diagnostics to avoid host-transfer costs.

    ``on_progress(sweeps_done, sweeps_total)`` is invoked after every device
    call — the analog of the reference's per-iteration progress printout
    (src/gpirtMCMC.cpp:257-264), at chunk granularity so the hot loop stays
    on device.

    ``initial_states`` (lane-stacked GPIRTState) replaces the prior-draw
    initialization — e.g. an SMC-annealed ensemble (parallel/smc.py).
    """
    progs = ChunkedPrograms(
        keys, y, thresholds_init, consts, config,
        sample_iterations=sample_iterations, burn_iterations=burn_iterations,
        thin=thin, store_f=store_f, store_fstar=store_fstar,
    )
    state = initial_states if initial_states is not None else progs.init(theta_init)
    total = progs.total

    # burn/alignment phase
    done = 0
    while done < progs.sched.pre_iterations:
        c = min(chunk_iterations, progs.sched.pre_iterations - done)
        state = progs.advance(state, done, c)
        done += c
        if on_progress is not None:
            on_progress(done, total)

    # sampling phase, in records
    recs_per_chunk = max(chunk_iterations // thin, 1)
    acc: Dict[str, list] = {}
    rec = 0
    while rec < progs.sched.n_samples:
        c = min(recs_per_chunk, progs.sched.n_samples - rec)
        state, outs = progs.records(state, rec, c)
        for name, arr in outs.items():
            acc.setdefault(name, []).append(arr)
        rec += c
        if on_progress is not None:
            on_progress(min(progs.sched.pre_iterations + rec * thin, total), total)

    if not acc:
        return {}
    return {name: jnp.concatenate(v, axis=1) for name, v in acc.items()}


class ChunkedPrograms:
    """Compiled building blocks for chunked multi-chain execution.

    Wraps the vmapped init / advance-`count`-sweeps / emit-`count`-records
    programs with a per-count compile cache (at most two counts per phase:
    the full chunk and the final partial). Shared by ``run_chains_chunked``
    and the checkpointed drivers (gpirt_tpu.utils.checkpoint) so both run
    the exact run_chain key schedule.
    """

    def __init__(self, keys, y, thresholds_init, consts, config, *,
                 sample_iterations, burn_iterations, thin,
                 store_f=False, store_fstar=False):
        from gpirt_tpu.models.sampler import sample_schedule

        self.y = y
        self.consts = consts
        self.config = config
        self.thin = thin
        self.store_f = store_f
        self.store_fstar = store_fstar
        self.thresholds_init = jnp.asarray(thresholds_init, config.jdtype)
        self.sched = sample_schedule(sample_iterations, burn_iterations, thin)
        self.total = sample_iterations + burn_iterations
        split = jax.vmap(jax.random.split)(keys)  # (K, 2, ...)
        self.k_init = split[:, 0]
        self.k_run = split[:, 1]
        self._compiled: Dict[tuple, Any] = {}

    def init(self, theta_init):
        theta_init = jnp.asarray(theta_init, self.config.jdtype)
        init_axis = 0 if theta_init.ndim == 3 else None

        def one(key, ti):
            return init_state(key, ti, self.thresholds_init, self.y,
                              self.consts, self.config)

        return jax.jit(jax.vmap(one, in_axes=(0, init_axis)))(
            self.k_init, theta_init
        )

    def _record(self, s, ll):
        from gpirt_tpu.models.gibbs import compute_mu_star

        out = {
            "theta": theta_from_indices(s.theta_idx, self.consts),
            "beta": s.beta,
            "threshold": s.thresholds,
            "ll": ll,
        }
        if self.store_f:
            out["f"] = s.f
        if self.store_fstar:
            ms = compute_mu_star(self.consts, s.beta)
            if self.config.constant_IRF:
                ms = jnp.broadcast_to(ms[:1], ms.shape)
            out["fstar"] = s.fstar + ms
        return out

    def advance(self, state, start, count):
        """Advance all chains `count` sweeps from absolute iteration `start`."""
        fn = self._compiled.get(("advance", count))
        if fn is None:
            y, consts, config = self.y, self.consts, self.config

            def one(s, kr, st):
                def body(carry, j):
                    carry, _ = gibbs_sweep(
                        carry, jax.random.fold_in(kr, st + j), y, consts, config
                    )
                    return carry, None
                s, _ = jax.lax.scan(body, s, jnp.arange(count))
                return s

            fn = jax.jit(jax.vmap(one, in_axes=(0, 0, None)))
            self._compiled[("advance", count)] = fn
        return fn(state, self.k_run, start)

    def records(self, state, start_rec, count):
        """Emit `count` thinned records starting at record index `start_rec`."""
        fn = self._compiled.get(("records", count))
        if fn is None:
            y, consts, config = self.y, self.consts, self.config
            thin, pre = self.thin, self.sched.pre_iterations
            record = self._record

            def one(s, kr, r0):
                # run_chain records after sweep `start`, then advances the
                # remaining thin-1 sweeps; reproduce that exactly:
                def step(carry, r):
                    start = pre + (r0 + r) * thin
                    carry, ll = gibbs_sweep(
                        carry, jax.random.fold_in(kr, start), y, consts, config
                    )
                    out = record(carry, ll)
                    def body(c, j):
                        c, _ = gibbs_sweep(
                            c, jax.random.fold_in(kr, start + 1 + j), y,
                            consts, config,
                        )
                        return c, None
                    carry, _ = jax.lax.scan(
                        body, carry, jnp.arange(max(thin - 1, 0))
                    )
                    return carry, out
                return jax.lax.scan(step, s, jnp.arange(count))

            fn = jax.jit(jax.vmap(one, in_axes=(0, 0, None)))
            self._compiled[("records", count)] = fn
        return fn(state, self.k_run, start_rec)
