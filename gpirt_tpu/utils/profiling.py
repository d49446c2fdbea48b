"""Block-level device profiling for the Gibbs sweep.

The reference's only observability is a progress percentage and an upfront
memory table (src/gpirtMCMC.cpp:60-82, 257-263). This module times each Gibbs
block ON DEVICE by scanning it K times inside a single compiled program
(one dispatch per block, so per-call host overhead doesn't pollute the
numbers), plus the fused full sweep.
"""

from __future__ import annotations

import time
from typing import Dict

import jax
import jax.numpy as jnp

from gpirt_tpu.models.config import GPIRTConfig, GPIRTConstants
from gpirt_tpu.models import gibbs as G

__all__ = ["profile_sweep", "device_time", "fetch_sync"]


def _scalar_probe(tree):
    """A cheap scalar that data-depends on every numeric leaf of ``tree``
    (first element of each raveled leaf; key/extended dtypes skipped)."""
    total = jnp.zeros((), jnp.float32)
    for leaf in jax.tree_util.tree_leaves(tree):
        if not hasattr(leaf, "dtype"):
            continue
        if jax.dtypes.issubdtype(leaf.dtype, jax.dtypes.extended):
            continue
        total = total + jnp.ravel(leaf)[0].astype(jnp.float32)
    return total


def fetch_sync(tree) -> None:
    """Force EXECUTION of everything ``tree`` depends on.

    On this image's tunneled (axon) runtime, ``jax.block_until_ready`` only
    flushes the enqueue — execution is lazy until a device->host FETCH
    (measured: a 0.5 s program "completes" block_until_ready in 0.1 ms; the
    first fetch then blocks 0.5 s). Every wall-clock measurement must end
    with a fetch of a value that data-depends on the timed computation, or
    the execution cost leaks into whoever fetches next."""
    float(jax.jit(_scalar_probe)(tree))


def device_time(step_fn, init, reps: int = 20, attempts: int = 4,
                captures=None) -> float:
    """Seconds per application of ``step_fn`` (carry, i) -> carry.

    ``captures``: optional pytree of large device arrays the step reads.
    When given, ``step_fn`` is called as ``(carry, i, captures)`` and the
    tree is passed as a jit ARGUMENT. Closing over big concrete arrays
    instead would inline them as HLO literals — at 5k-respondent shapes
    that multi-hundred-MB module blows the tunneled compile service's
    request-size limit (HTTP 413) and bloats compile time everywhere.

    Measured as the SLOPE between a ``reps``-step and a ``5*reps``-step
    scan (each a single jit dispatch): per-dispatch fixed cost — ~24 ms of
    round-trip latency on this image's tunneled runtime, enough to swamp a
    sub-ms block at any affordable rep count — cancels exactly, leaving
    the marginal per-step device time. Each program is run ``attempts``
    times and the fastest wall kept: tunnel stalls only ever ADD time
    (measured up to ~1 ms/step of phantom cost at best-of-2), so min is
    the right statistic and 4 attempts make a stall surviving into the
    slope unlikely.

    The scan reduces its carry to ONE scalar inside the program and the
    wall ends with the scalar's fetch: on the tunneled runtime execution
    is lazy until a fetch (see :func:`fetch_sync`), and a fetch of the
    full carry would add multi-MB tunnel-transfer time to the wall."""

    has_cap = captures is not None

    def build(k):
        @jax.jit
        def run(init, cap):
            def body(c, i):
                return (step_fn(c, i, cap) if has_cap else step_fn(c, i)), ()

            c, _ = jax.lax.scan(body, init, jnp.arange(k))
            return _scalar_probe(c)

        return run

    run_lo, run_hi = build(reps), build(5 * reps)

    def wall(run):
        float(run(init, captures))  # compile + warm
        best = float("inf")
        for _ in range(attempts):
            t0 = time.time()
            float(run(init, captures))
            best = min(best, time.time() - t0)
        return best

    return max(wall(run_hi) - wall(run_lo), 0.0) / (4 * reps)


def profile_sweep(
    state: "G.GPIRTState",
    y: jnp.ndarray,
    consts: GPIRTConstants,
    config: GPIRTConfig,
    reps: int = 20,
) -> Dict[str, float]:
    """Per-block and full-sweep seconds on the current default device."""
    key = jax.random.key(0)
    theta = G.theta_from_indices(state.theta_idx, consts)
    mu = G.compute_mu(theta, state.beta)
    mu_star = G.compute_mu_star(consts, state.beta)
    jax.block_until_ready((mu, mu_star))

    out = {}
    out["full_sweep"] = device_time(
        lambda s, i: G.gibbs_sweep(s, jax.random.fold_in(key, i), y, consts, config)[0],
        state, reps,
    )
    out["draw_f"] = device_time(
        lambda f, i: G.draw_f(jax.random.fold_in(key, i), state._replace(f=f), mu, y, consts, config),
        state.f, reps,
    )
    out["draw_fstar"] = device_time(
        lambda fs, i: G.draw_fstar(jax.random.fold_in(key, i), state.f, state.theta_idx, consts, config),
        state.fstar, reps,
    )
    out["draw_theta"] = device_time(
        lambda ti, i: G.draw_theta(jax.random.fold_in(key, i), state._replace(theta_idx=ti), mu_star, y, consts, config),
        state.theta_idx, reps,
    )
    out["draw_beta"] = device_time(
        lambda b, i: G.draw_beta(jax.random.fold_in(key, i), b, theta, state.f, state.thresholds, y, consts, config),
        state.beta, reps,
    )
    out["draw_threshold"] = device_time(
        lambda t, i: G.draw_threshold(jax.random.fold_in(key, i), t, state.f, mu, y, config),
        state.thresholds, reps,
    )
    return out
