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

__all__ = ["run_chains", "run_chains_chunked", "make_chain_mesh", "chain_keys"]


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
) -> Dict[str, jnp.ndarray]:
    """``run_chains`` split into bounded device executions.

    One monolithic XLA execution of a long scan can exceed runtime execution
    limits (a >60 s single call was observed to fault the tunneled TPU
    runtime at 64 chains x 2500 iterations). This driver advances all chains
    ``chunk_iterations`` sweeps per device call and assembles the thinned
    draws on the host — the same key schedule as ``run_chains`` (iteration i
    uses fold_in(k_run_chain, i)), so results match up to compile-level float
    associativity.

    Output layouts match ``run_chains`` (leading chains axis) and stay on
    device (recorded draws are gathered into device buffers; fetch or reduce
    them with device-side diagnostics to avoid host-transfer costs).
    """
    from gpirt_tpu.models.gibbs import compute_mu_star

    theta_init = jnp.asarray(theta_init, config.jdtype)
    thresholds_init = jnp.asarray(thresholds_init, config.jdtype)
    init_axis = 0 if theta_init.ndim == 3 else None
    total = sample_iterations + burn_iterations

    split = jax.vmap(jax.random.split)(keys)  # (K, 2, ...)
    k_init = split[:, 0]
    k_run = split[:, 1]

    def _init_one(key, theta_init):
        return init_state(key, theta_init, thresholds_init, y, consts, config)

    def _advance_one(state, k_run, start):
        def body(s, it):
            s, ll = gibbs_sweep(s, jax.random.fold_in(k_run, it), y, consts, config)
            out = {
                "theta": theta_from_indices(s.theta_idx, consts),
                "beta": s.beta,
                "threshold": s.thresholds,
                "ll": ll,
            }
            if store_f:
                out["f"] = s.f
            if store_fstar:
                ms = compute_mu_star(consts, s.beta)
                if config.constant_IRF:
                    ms = jnp.broadcast_to(ms[:1], ms.shape)
                out["fstar"] = s.fstar + ms
            return s, out

        its = start + jnp.arange(chunk_iterations)
        return jax.lax.scan(body, state, its)

    init_v = jax.jit(jax.vmap(_init_one, in_axes=(0, init_axis)))
    advance_v = jax.jit(jax.vmap(_advance_one, in_axes=(0, 0, None)))

    state = init_v(k_init, theta_init)
    acc: Dict[str, list] = {}
    it = 0
    while it < total:
        k = min(chunk_iterations, total - it)
        state, outs = advance_v(state, k_run, it)
        # select recorded iterations of this chunk in one device gather
        rec = [j for j in range(k)
               if (it + j) >= burn_iterations and (it + j) % thin == 0]
        if rec:
            idx = jnp.asarray(rec)
            for name, arr in outs.items():
                acc.setdefault(name, []).append(jnp.take(arr, idx, axis=1))
        it += k
    return {name: jnp.concatenate(v, axis=1) for name, v in acc.items()}
