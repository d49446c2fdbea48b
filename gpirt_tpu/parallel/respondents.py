"""Respondent-axis model parallelism: shard the RESPONDENT dimension n.

The dual of parallel/items.py — together they map BOTH of the reference's
OpenMP fan-outs onto a TPU mesh (items: src/draw-f.cpp:67-69 etc.;
respondents: src/draw-theta.cpp:120-122/176-178/208-211). Each device owns
a respondent shard — its rows of y, theta, f and the Albert-Chib latents z
— and runs the per-respondent blocks (the theta draw on its table columns,
the z draw) entirely locally. The per-item arrays (beta, cutpoints, fstar)
are REPLICATED; their conditional draws depend on the respondents only
through small sufficient statistics, each completed by one psum:

  * f* | z:  the rank-(q+3) capacitance C = T I + U^T U and every U^T-
    projection (lowrank_bsolve / draw_fstar_conjugate) — O((q+3)·m) floats
    per psum regardless of n;
  * beta | z, f:  the 3x3 regression stats X^T X, X^T z and the global
    theta standardization moments — O(m) floats;
  * cutpoints | y:  each ESS round's per-item log-likelihood totals —
    O(m) floats per shrink round (or the z-box pmax/pmin for the collapsed
    draw).

Why this axis: the respondent-scaled arrays (y, z, f are (H, n, m); the
theta table is (H, N, n)) dominate memory and bandwidth when n is large —
the synthetic 5k x 1k config's z/f/y traffic, and any national-electorate
survey scale. Respondent sharding divides all of it by the shard count
while keeping the big (H, N, m) fstar computation replicated-but-
bandwidth-local. The dual trade vs item sharding: items psum ONE (N, n)
table per sweep; respondents psum several (q+3, m)-ish statistics. Both
are tiny next to the local compute; pick the axis matching which dimension
outgrows a chip.

Composes with chain parallelism — and with ITEM sharding — as a
(chains x items x respondents) 3-D mesh: chains stay fully independent,
the theta-table psum rides the item axis, the sufficient-statistic psums
ride the respondent axis, and shard_map's named-axis collectives are
automatically group-local.

RNG discipline (see gibbs_sweep): per-respondent draws (theta rows, z,
the fstar eps noise) fold the respondent shard index into their keys —
independent streams per shard, NOT bitwise an unsharded run (any key
assignment is a valid sampler, exactly like item sharding's per-item
streams); the grid prior draws, beta noise and cutpoint update use the
replicated key on psum-completed statistics, so every shard holds the
identical beta/thresholds/fstar trajectory.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from gpirt_tpu.models.config import GPIRTConfig, GPIRTConstants

try:  # jax>=0.4.35 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

__all__ = ["run_chains_respondentsharded", "make_respondent_mesh",
           "consts_mesh_specs"]


def make_respondent_mesh(n_resp_shards: int, n_chain_shards: int = 1,
                         n_item_shards: int = 1,
                         chain_axis: str = "chains",
                         item_axis: str = "items",
                         respondent_axis: str = "respondents") -> Mesh:
    """A (chains, items, respondents) mesh; axes of size 1 are dropped."""
    total = n_chain_shards * n_item_shards * n_resp_shards
    devs = np.asarray(jax.devices()[:total])
    shape, names = [], []
    for size, name in ((n_chain_shards, chain_axis),
                       (n_item_shards, item_axis),
                       (n_resp_shards, respondent_axis)):
        if size > 1:
            shape.append(size)
            names.append(name)
    if not shape:
        shape, names = [1], [respondent_axis]
    return Mesh(devs.reshape(shape), tuple(names))


def consts_mesh_specs(consts: GPIRTConstants, item_axis: Optional[str],
                      respondent_axis: Optional[str]):
    """PartitionSpecs for GPIRTConstants under item and/or respondent
    sharding: the (3, m) beta priors shard over items, the (2, n) theta
    priors over respondents; every grid/time constant is replicated."""
    item_sharded = {"beta_prior_means", "beta_prior_sds"}
    resp_sharded = {"theta_prior_means", "theta_prior_sds"}
    specs = {}
    for f in consts.__dataclass_fields__:
        v = getattr(consts, f)
        if v is None:
            specs[f] = None
        elif f in item_sharded and item_axis is not None:
            specs[f] = P(None, item_axis)
        elif f in resp_sharded and respondent_axis is not None:
            specs[f] = P(None, respondent_axis)
        else:
            specs[f] = P()
    return type(consts)(**specs)


def run_chains_respondentsharded(
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
    item_axis: Optional[str] = None,
    respondent_axis: str = "respondents",
    initial_states=None,
) -> Dict[str, jnp.ndarray]:
    """Run ``len(keys)`` chains with the respondent dimension sharded over
    ``mesh[respondent_axis]`` — and optionally items over ``mesh[item_axis]``
    and chains over ``mesh[chain_axis]`` (the full 3-D mesh).

    Returns the same draw dict as run_chains: per-respondent outputs (theta,
    f's n axis) reassemble from the respondent shards, per-item outputs
    (beta, threshold, f's m axis, fstar) from the item shards; ll is
    identical on every model shard by construction and returned once per
    chain.

    ``initial_states`` (a lane-stacked GPIRTState) skips the prior init;
    its per-respondent leaves must already be respondent shards under this
    mesh (and per-item leaves item shards when item_axis is given).

    Requires f_method='conjugate' and n % mesh.shape[respondent_axis] == 0
    (and m % mesh.shape[item_axis] when items are sharded too).
    """
    from gpirt_tpu.models.gibbs import GPIRTState
    from gpirt_tpu.models.sampler import run_chain

    if respondent_axis not in mesh.shape:
        raise ValueError(f"mesh has no axis named {respondent_axis!r}")
    if item_axis is not None and item_axis not in mesh.shape:
        raise ValueError(f"mesh has no axis named {item_axis!r}")
    n_resp = mesh.shape[respondent_axis]
    n_item = mesh.shape.get(item_axis, 1) if item_axis is not None else 1
    n_chain_dev = mesh.shape.get(chain_axis, 1)
    n_chains = keys.shape[0]
    H, n, m = y.shape
    if n % n_resp != 0:
        raise ValueError(
            f"n={n} does not divide over {n_resp} respondent shards"
        )
    if item_axis is not None and m % n_item != 0:
        raise ValueError(f"m={m} does not divide over {n_item} item shards")
    if n_chains % n_chain_dev != 0:
        raise ValueError(
            f"{n_chains} chains do not divide over {n_chain_dev} chain shards"
        )

    theta_init = jnp.asarray(theta_init, config.jdtype)
    thresholds_init = jnp.asarray(thresholds_init, config.jdtype)
    per_chain_init = theta_init.ndim == 3
    chain_p = chain_axis if chain_axis in mesh.shape else None
    rax, iax = respondent_axis, item_axis
    init_spec = P(chain_p, None, rax) if per_chain_init else P(None, rax)

    def body(keys_loc, y_loc, ti_loc, thr_loc, consts_loc, states_loc):
        def one_chain(k, ti, s0):
            return run_chain(
                k, y_loc, ti, thr_loc, consts_loc, config,
                sample_iterations=sample_iterations,
                burn_iterations=burn_iterations, thin=thin,
                store_f=store_f, store_fstar=store_fstar,
                item_axis=iax, respondent_axis=rax, initial_state=s0,
            )
        return jax.vmap(
            one_chain,
            in_axes=(0, 0 if per_chain_init else None,
                     None if initial_states is None else 0),
        )(keys_loc, ti_loc, states_loc)

    out_specs = {
        "theta": P(chain_p, None, None, rax),
        "ll": P(chain_p),
        "beta": P(chain_p, None, None, None, iax),
        "threshold": P(chain_p, None, None, iax, None),
    }
    if store_f:
        out_specs["f"] = P(chain_p, None, None, rax, iax)
    if store_fstar:
        out_specs["fstar"] = P(chain_p, None, None, None, iax)

    state_spec = None
    if initial_states is not None:
        state_spec = GPIRTState(
            theta_idx=P(chain_p, None, rax),
            f=P(chain_p, None, rax, iax),
            beta=P(chain_p, None, None, iax),
            thresholds=P(chain_p, None, iax, None),
            fstar=P(chain_p, None, None, iax),
        )

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(chain_p),
            P(None, rax, iax),
            init_spec,
            P(None, iax, None),
            consts_mesh_specs(consts, iax, rax),
            state_spec,
        ),
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(fn)(keys, y, theta_init, thresholds_init, consts,
                       initial_states)
