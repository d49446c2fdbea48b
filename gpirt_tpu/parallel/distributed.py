"""Multi-host execution: process-local chain sharding over a global mesh.

The reference is a single-process OpenMP program (SURVEY.md section 2.4); the
TPU-native scale-out axis is chains over devices — within one host via
``run_chains(mesh=...)``, and across hosts via this module:

  * ``initialize_distributed()`` — guarded ``jax.distributed.initialize``
    (no-op when single-process or already initialized).
  * ``run_chains_multihost()`` — builds a global 1-D mesh over every device
    of every process, materializes each process's shard of the per-chain
    inputs locally (no cross-host data movement: chain k's key/init are
    recomputed from SEED on whichever host owns chain k), runs the
    ``shard_map`` chain program, and returns the GLOBAL draws array
    (process-local shards addressable via ``.addressable_shards``).
  * ``pooled_ess_multihost()`` — chain-pooled ESS computed device-side from
    the distributed draws (cross-chain moments ride ICI/DCN collectives
    inside one jit; only (P,)-sized results land on hosts).

MCMC chains need zero cross-device traffic during sampling, so the only
collectives are in the diagnostics — the design scales to any pod slice
without code changes. Exercised in CI on a virtual 8-device CPU mesh
(process_count == 1); real multi-host runs only need
``initialize_distributed()`` first.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gpirt_tpu.models.config import GPIRTConfig, GPIRTConstants

__all__ = [
    "initialize_distributed",
    "global_chain_mesh",
    "run_chains_multihost",
    "pooled_ess_multihost",
]


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialize jax.distributed when running multi-process; returns
    process_count. Safe to call unconditionally: single-process runs and
    already-initialized runtimes are left untouched."""
    if jax.process_count() > 1:
        return jax.process_count()  # already initialized by the launcher
    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_count()


def global_chain_mesh(axis: str = "chains") -> Mesh:
    """1-D mesh over EVERY device of every process (jax.devices() is global)."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def _local_shard_bounds(mesh: Mesh, n_chains: int):
    """[lo, hi) chain indices owned by this process under P('chains')."""
    devs = list(mesh.devices.ravel())
    n_dev = len(devs)
    if n_chains % n_dev != 0:
        raise ValueError(f"{n_chains} chains do not divide over {n_dev} devices")
    per_dev = n_chains // n_dev
    local = [i for i, d in enumerate(devs) if d.process_index == jax.process_index()]
    return [(i * per_dev, (i + 1) * per_dev, devs[i]) for i in local]


def run_chains_multihost(
    seed: int,
    n_chains: int,
    y: np.ndarray,
    theta_init: np.ndarray,
    thresholds_init: np.ndarray,
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
) -> Dict[str, jax.Array]:
    """Run ``n_chains`` chains sharded over the global device mesh.

    Chain k uses key(seed + k) (the run_chains semantics); each process
    builds only ITS chains' keys and theta inits as single-device arrays and
    assembles the global sharded inputs with
    ``jax.make_array_from_single_device_arrays`` — no host gathers, no
    cross-process data dependencies before the compiled program.

    ``theta_init``: (H, n) shared across chains, or (n_chains, H, n)
    per-chain (only the local rows are touched).
    """
    from gpirt_tpu.parallel.chains import run_chains

    if mesh is None:
        mesh = global_chain_mesh(axis)
    theta_init = np.asarray(theta_init)
    per_chain_init = theta_init.ndim == 3

    key_shards, init_shards = [], []
    for lo, hi, dev in _local_shard_bounds(mesh, n_chains):
        with jax.default_device(dev):
            ks = jax.vmap(
                lambda s: jax.random.key(s, impl=config.resolved_prng_impl)
            )(seed + jnp.arange(lo, hi))
            key_shards.append(jax.device_put(ks, dev))
            if per_chain_init:
                init_shards.append(
                    jax.device_put(
                        jnp.asarray(theta_init[lo:hi], config.jdtype), dev
                    )
                )

    key_sharding = NamedSharding(mesh, P(axis))
    probe = jax.eval_shape(lambda: jax.vmap(
        lambda s: jax.random.key(s, impl=config.resolved_prng_impl)
    )(jnp.arange(n_chains)))
    keys = jax.make_array_from_single_device_arrays(
        (n_chains,), key_sharding, key_shards, dtype=probe.dtype
    )
    if per_chain_init:
        gshape = (n_chains,) + theta_init.shape[1:]
        theta_init_g = jax.make_array_from_single_device_arrays(
            gshape, key_sharding, init_shards
        )
    else:
        theta_init_g = jnp.asarray(theta_init, config.jdtype)

    return run_chains(
        keys, jnp.asarray(y), theta_init_g, thresholds_init, consts, config,
        sample_iterations=sample_iterations, burn_iterations=burn_iterations,
        thin=thin, store_f=store_f, store_fstar=store_fstar,
        mesh=mesh, axis=axis,
    )


def pooled_ess_multihost(theta_draws: jax.Array, axis: str = "chains"):
    """Chain-pooled ESS of distributed theta draws, computed device-side.

    theta_draws: (K, S, ...) global array sharded over chains. The pooled
    estimator needs cross-chain means/variances — cheap collectives next to
    the per-chain FFT autocovariances, which stay local to each shard. One
    jit; only the (P,)-sized ESS vector is replicated back.
    """
    from gpirt_tpu.utils.diagnostics import effective_sample_size_device

    @jax.jit
    def _ess(x):
        return effective_sample_size_device(x.reshape(x.shape[0], x.shape[1], -1))

    return _ess(theta_draws)
