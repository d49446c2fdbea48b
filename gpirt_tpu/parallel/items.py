"""Item-axis model parallelism: shard the ITEM dimension over a device mesh.

The reference fans its per-item work (draw_f, draw_fstar, draw_beta,
draw_threshold) out over OpenMP threads inside one address space
(src/draw-f.cpp:67-69, src/draw-fstar.cpp:43-45, src/draw-beta.cpp:63-65,
src/draw_threshold.cpp:183-185). This module is that axis mapped onto a TPU
mesh: each device owns an item shard — its slice of y, f, f*, beta,
cutpoints and latent z — and runs every per-item Gibbs block locally. The
sweep's ONLY cross-item coupling is the theta likelihood table
(draw_theta sums item log-probs per respondent), which becomes one
``psum`` of the (H, N, n) table per theta draw, plus one scalar psum for
the ll trace. Everything else — the Albert-Chib z draw, the conjugate
f*/beta draws (the rank-(q+3) capacitance factors depend on theta only and
are replicated-computed), the cutpoint ESS — is embarrassingly item-local,
so the collective traffic per sweep is O(N·n) floats regardless of m.

Why this axis: the state and the sweep's memory traffic scale with m
(f* is (H, N, m) — the largest array in the framework), so item sharding
divides both device memory and HBM pressure by the item-shard count,
scaling GP-IRT to item banks far past one chip's HBM. The dual sharding
(respondents) would instead shard the table's n axis at the cost of
gathering theta-site bases; items need the single psum only.

Composes with chain parallelism as a 2-D mesh (chains x items): chains
stay fully independent (zero cross-chain traffic, parallel/chains.py),
items psum within each chain's item group only — shard_map's named-axis
psum over ``item_axis`` is automatically group-local on the 2-D mesh.

RNG discipline (see gibbs_sweep): item-local blocks fold the device's
item-shard index into their keys (independent streams per shard — the
draws are NOT bitwise those of an unsharded run, which is fine: any key
assignment gives a valid sampler, exactly like chains getting different
seeds); the theta draw uses the replicated key on the psum'd table, so
every shard holds the identical replicated theta trajectory.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from gpirt_tpu.models.config import GPIRTConfig, GPIRTConstants

try:  # jax>=0.4.35 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

__all__ = ["run_chains_itemsharded", "make_item_mesh", "consts_item_specs"]


def make_item_mesh(n_item_shards: int, n_chain_shards: int = 1,
                   chain_axis: str = "chains", item_axis: str = "items") -> Mesh:
    """A (chains, items) 2-D mesh over the first ``n_chain * n_item`` devices."""
    devs = np.asarray(jax.devices()[: n_chain_shards * n_item_shards])
    return Mesh(devs.reshape(n_chain_shards, n_item_shards),
                (chain_axis, item_axis))


def consts_item_specs(consts: GPIRTConstants, item_axis: str):
    """PartitionSpecs for GPIRTConstants under item sharding: the per-item
    prior arrays (3, m) shard; every grid/respondent/time constant is
    replicated (the grid-side arrays are m-free by construction)."""
    sharded = {"beta_prior_means", "beta_prior_sds"}
    specs = {}
    for f in consts.__dataclass_fields__:
        v = getattr(consts, f)
        if v is None:
            specs[f] = None
        elif f in sharded:
            specs[f] = P(None, item_axis)
        else:
            specs[f] = P()
    return type(consts)(**specs)


def run_chains_itemsharded(
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
    mesh: Mesh,
    chain_axis: str = "chains",
    item_axis: str = "items",
    initial_states=None,
) -> Dict[str, jnp.ndarray]:
    """Run ``len(keys)`` chains with the item dimension sharded over
    ``mesh[item_axis]`` (and chains over ``mesh[chain_axis]`` when present).

    Returns the same draw dict as run_chains — per-item outputs (beta,
    threshold, f, fstar) come back as GLOBAL arrays reassembled from the
    item shards; theta and ll are identical on every item shard by
    construction and returned once.

    ``initial_states`` (lane-stacked GPIRTState, e.g. an item-sharded SMC
    ensemble from anneal_init(item_axis=...)) skips the prior init.

    Requires f_method='conjugate' (gibbs_sweep's item_axis support) and
    m % mesh.shape[item_axis] == 0.
    """
    from gpirt_tpu.models.gibbs import GPIRTState
    from gpirt_tpu.models.sampler import run_chain

    if item_axis not in mesh.shape:
        raise ValueError(f"mesh has no axis named {item_axis!r}")
    n_item = mesh.shape[item_axis]
    n_chain_dev = mesh.shape.get(chain_axis, 1)
    n_chains = keys.shape[0]
    H, n, m = y.shape
    if m % n_item != 0:
        raise ValueError(f"m={m} does not divide over {n_item} item shards")
    if n_chains % n_chain_dev != 0:
        raise ValueError(
            f"{n_chains} chains do not divide over {n_chain_dev} chain shards"
        )

    theta_init = jnp.asarray(theta_init, config.jdtype)
    thresholds_init = jnp.asarray(thresholds_init, config.jdtype)
    per_chain_init = theta_init.ndim == 3
    chain_p = chain_axis if chain_axis in mesh.shape else None
    init_spec = P(chain_p) if per_chain_init else P()

    def body(keys_loc, y_loc, ti_loc, thr_loc, consts_loc, states_loc):
        def one_chain(k, ti, s0):
            return run_chain(
                k, y_loc, ti, thr_loc, consts_loc, config,
                sample_iterations=sample_iterations,
                burn_iterations=burn_iterations, thin=thin,
                store_f=store_f, store_fstar=store_fstar,
                item_axis=item_axis, initial_state=s0,
            )
        return jax.vmap(
            one_chain,
            in_axes=(0, 0 if per_chain_init else None,
                     None if initial_states is None else 0),
        )(keys_loc, ti_loc, states_loc)

    # per-item draw outputs reassemble over the item axis; theta/ll are
    # replicated across item shards (identical by the psum'd-table + shared
    # theta-key construction) and returned once
    out_specs = {
        "theta": P(chain_p),
        "ll": P(chain_p),
        "beta": P(chain_p, None, None, None, item_axis),
        "threshold": P(chain_p, None, None, item_axis, None),
    }
    if store_f:
        out_specs["f"] = P(chain_p, None, None, None, item_axis)
    if store_fstar:
        out_specs["fstar"] = P(chain_p, None, None, None, item_axis)

    # lane-stacked (K, ...) initial states: chains on chain_p, per-item
    # leaves on item_axis (tree_map over None yields the empty subtree)
    state_spec = None
    if initial_states is not None:
        state_spec = GPIRTState(
            theta_idx=P(chain_p),
            f=P(chain_p, None, None, item_axis),
            beta=P(chain_p, None, None, item_axis),
            thresholds=P(chain_p, None, item_axis, None),
            fstar=P(chain_p, None, None, item_axis),
        )

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(chain_p),
            P(None, None, item_axis),
            init_spec,
            P(None, item_axis, None),
            consts_item_specs(consts, item_axis),
            state_spec,
        ),
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(fn)(keys, y, theta_init, thresholds_init, consts,
                       initial_states)
