"""Pallas TPU kernel: the ENTIRE binary cutpoint ESS update in VMEM.

The binary threshold block is the senate sweep's top cost (1.72 ms of
4.94 at 64 chains, RESULTS.md anatomy): an elliptical-slice update of the
single interior cutpoint t_1 per (horizon, item) lane whose shrink loop
re-evaluates

    ll(t) = sum_i obs[i,l] * log(0.5*(1 + erf(sgn[i,l]*(t_l - g[i,l])*c)) + 1e-6)

every round. Under XLA each round is a separate fused pass that re-streams
g/sgn/obs from HBM (~0.75 MB x 64 chains per round, ~7 effective rounds
after the two-phase compaction), and every round pays the full batch even
though the mean lane accepts in ~3 rounds while the max takes 12-17.

This kernel runs the WHOLE shrink loop inside one pallas_call: each
(site-rows x lane-tile) block loads g/sgn/obs into VMEM ONCE and iterates
its lanes' brackets to acceptance locally — HBM traffic drops from
O(rounds) passes to exactly one, and each lane TILE exits at its own max
round instead of the global max (the straggler effect the two-phase
XLA path approximates with compacted gathers, obtained here for free).

Sampler semantics are identical to ops.ess.ess_update specialized to this
likelihood — same slice threshold, same bracket shrink, same identity
fallback at the round cap — with the per-round shrink uniforms precomputed
as one (R, L) array instead of sequential in-loop splits (a different but
equally valid uniform stream; tests/test_ops.py proves the kernel equals a
pure-JAX replica consuming the same uniforms, and the A/B gate is
statistical equivalence on posterior draws).

MEASURED VERDICT (round 4, real v5e chip, scripts/ab_pallas_threshold.py):
numerics exact (compiled == interpret bitwise, solo and vmapped), posterior
match z = -0.06, but the full 64-chain senate sweep is 5.36 ms under this
kernel vs 5.12 ms under the XLA two-phase path — the kernel loses 4.6%.
Why: at senate scale the block is TRANSCENDENTAL-compute-bound, not
HBM-bound (per-round streaming is ~60 us vs ~2 ms of erf/log VPU work), so
the HBM win this kernel exists for doesn't pay, while the XLA path's
active-lane compaction (~7 effective full-width rounds vs the kernel's
lockstep ~15 to the per-chain max) does. config.threshold_backend="auto"
therefore resolves to "xla"; the kernel stays available ("pallas"),
correctness-tested, as the measured record — same keep-or-kill discipline
as the r3 threshold-method alternatives.

Used by models.gibbs.draw_threshold when config.threshold_backend resolves
to "pallas" (binary, unsharded, untempered path). Reference for the block
it accelerates: src/draw_threshold.cpp:99-169 (single-horizon cutpoint
ESS) — the reference runs one lane per OpenMP task; here all lanes of a
tile advance lockstep on the VPU with per-lane freeze masks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["binary_threshold_ess_pallas", "PALLAS_THRESHOLD_ROUNDS"]


def _erf(x):
    """erf via Abramowitz & Stegun 7.1.26 (|error| <= 1.5e-7, i.e. float32
    exact) — Mosaic has no erf primitive, so we lower it ourselves with one
    exp and a degree-5 polynomial on the VPU. (Moved here from the retired
    ops/pallas_ll.py — see RESULTS.md "Pallas A/Bs" for that module's
    measurements and retirement record.)"""
    dt = x.dtype
    sign = jnp.where(x < 0, jnp.asarray(-1.0, dt), jnp.asarray(1.0, dt))
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + jnp.asarray(0.3275911, dt) * ax)
    poly = t * (
        jnp.asarray(0.254829592, dt)
        + t * (
            jnp.asarray(-0.284496736, dt)
            + t * (
                jnp.asarray(1.421413741, dt)
                + t * (
                    jnp.asarray(-1.453152027, dt)
                    + t * jnp.asarray(1.061405429, dt)
                )
            )
        )
    )
    return sign * (1.0 - poly * jnp.exp(-ax * ax))

_TWO_PI = 6.283185307179586
# Round cap inside the kernel. Measured senate lane-max is 12-17; capped
# lanes keep their current value (an identity MCMC move, exactly
# ess_update's max_rounds bail-out).
PALLAS_THRESHOLD_ROUNDS = 24
# VMEM budget for one (rows x tile) block set: g/sgn/obs f32 + double
# buffering. Caps the auto lane tile.
_VMEM_BLOCK_BUDGET = 6 * 2**20


def _auto_lane_tile(n_rows: int, n_lanes: int) -> int:
    """Widest 128-multiple lane tile that fits the VMEM budget.

    The TPU grid is SEQUENTIAL, and under vmap over chains it becomes
    (chains, lane_tiles): every tile pays its own while-loop round
    overhead, which dominates this kernel's cost at senate shapes (the
    per-round compute is a few hundred kflops of VPU work). One
    full-width tile per chain (senate: 640 lanes x 104 rows = 0.8 MB)
    runs ONE loop per chain instead of five — measured on-chip: sweep
    5.52 ms at tile=128 -> 5.36 ms at full width, vs XLA 5.12 ms
    (scripts/ab_pallas_threshold, RESULTS.md "pallas threshold A/B").
    """
    rows = -(-n_rows // 8) * 8
    max_tile = _VMEM_BLOCK_BUDGET // (rows * 4 * 3 * 2)
    tile = min(-(-n_lanes // 128) * 128, (max_tile // 128) * 128)
    return max(tile, 128)


def _kernel(c_ref, g_ref, sgn_ref, obs_ref, t_ref, nu_ref, logu_ref,
            eps_ref, rs_ref, out_ref):
    dt = g_ref.dtype
    g = g_ref[:]
    s = sgn_ref[:]
    o = obs_ref[:]
    c = c_ref[0, 0]
    floor = jnp.asarray(1e-6, dt)

    def ll(t):  # (1, TL) -> (1, TL): per-lane masked site reduction
        x = s * (t - g) * c
        p = 0.5 * (1.0 + _erf(x))
        return jnp.sum(jnp.log(p + floor) * o, axis=0, keepdims=True)

    t0 = t_ref[:]
    nu = nu_ref[:]
    log_y = ll(t0) + logu_ref[:]
    eps = eps_ref[:]
    eps_min = eps - jnp.asarray(_TWO_PI, dt)
    eps_max = jnp.full_like(eps, _TWO_PI)
    # The active mask is carried as dt (1.0/0.0), not bool: Mosaic cannot
    # legalize a vector<i1> while-loop carry. Bools are still fine as
    # loop-local intermediates.
    active = jnp.ones(eps.shape, dt)

    def cond(carry):
        r, _, _, _, _, active = carry
        return jnp.logical_and(r < PALLAS_THRESHOLD_ROUNDS,
                               jnp.max(active) > 0)

    def body(carry):
        r, x_out, eps, eps_min, eps_max, active = carry
        prop = t0 * jnp.cos(eps) + nu * jnp.sin(eps)
        accept = ll(prop) > log_y
        newly = jnp.logical_and(active > 0, accept)
        x_out = jnp.where(newly, prop, x_out)
        still = jnp.logical_and(active > 0, jnp.logical_not(accept))
        eps_min = jnp.where(jnp.logical_and(still, eps < 0), eps, eps_min)
        eps_max = jnp.where(jnp.logical_and(still, eps >= 0), eps, eps_max)
        rr = rs_ref[pl.ds(r, 1), :]
        eps = jnp.where(still, eps_min + rr * (eps_max - eps_min), eps)
        return r + 1, x_out, eps, eps_min, eps_max, still.astype(dt)

    _, x_new, _, _, _, _ = jax.lax.while_loop(
        cond, body,
        (jnp.zeros((), jnp.int32), t0, eps, eps_min, eps_max, active),
    )
    out_ref[:] = x_new


@functools.partial(jax.jit, static_argnames=("interpret", "lane_tile"))
def binary_threshold_ess_pallas(
    key: jax.Array,
    t1: jnp.ndarray,
    nu: jnp.ndarray,
    g: jnp.ndarray,
    sgn: jnp.ndarray,
    obs: jnp.ndarray,
    c,
    *,
    interpret: bool = False,
    lane_tile: int | None = None,
) -> jnp.ndarray:
    """One full ESS update of the binary interior cutpoint, fused in VMEM.

    Args:
      key: PRNG key (consumed for the slice level, bracket start, and the
        per-round shrink uniforms).
      t1: (L,) current interior cutpoint per lane (lane = horizon x item).
      nu: (L,) N(0, 1) prior draw per lane (identity prior covariance in
        delta space, src/draw_threshold.cpp:109).
      g, sgn, obs: (n, L) site-major likelihood inputs: latent g = f + mu,
        response sign (+1 for y=1, -1 for y=2, anything for missing), and
        the observation mask.
      c: scalar 1/sqrt(2) (times 1/sqrt(T) under tempering).
    Returns:
      (L,) updated cutpoints.
    """
    n, L = g.shape
    dt = g.dtype
    k_u, k_eps, k_loop = jax.random.split(key, 3)
    logu = jnp.log(jax.random.uniform(k_u, (L,), dtype=dt))
    eps0 = jax.random.uniform(k_eps, (L,), dtype=dt, maxval=_TWO_PI)
    rs = jax.random.uniform(k_loop, (PALLAS_THRESHOLD_ROUNDS, L), dtype=dt)

    tile = lane_tile or _auto_lane_tile(n, L)
    Lp = -(-L // tile) * tile
    np_ = -(-n // 8) * 8  # f32 sublane multiple
    pad2 = ((0, 0), (0, Lp - L))
    padr = ((0, np_ - n), (0, Lp - L))

    def _lane(x):  # (L,) -> (1, Lp)
        return jnp.pad(x[None], pad2)

    gp = jnp.pad(g, padr)
    sgnp = jnp.pad(sgn, padr)
    obsp = jnp.pad(obs.astype(dt), padr)  # zero rows mask padded sites out
    rsp = jnp.pad(rs, pad2)

    grid = (Lp // tile,)
    row_spec = pl.BlockSpec((np_, tile), lambda j: (0, j),
                            memory_space=pltpu.VMEM)
    lane_spec = pl.BlockSpec((1, tile), lambda j: (0, j),
                             memory_space=pltpu.VMEM)
    rs_spec = pl.BlockSpec((PALLAS_THRESHOLD_ROUNDS, tile),
                           lambda j: (0, j), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # c, shape (1, 1)
            row_spec, row_spec, row_spec,
            lane_spec, lane_spec, lane_spec, lane_spec,
            rs_spec,
        ],
        out_specs=lane_spec,
        out_shape=jax.ShapeDtypeStruct((1, Lp), dt),
        interpret=interpret,
    )(jnp.asarray(c, dt).reshape(1, 1), gp, sgnp, obsp,
      _lane(t1), _lane(nu), _lane(logu), _lane(eps0), rsp)
    return out[0, :L]
