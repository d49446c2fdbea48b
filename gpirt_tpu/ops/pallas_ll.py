"""Pallas TPU kernel: fused ordinal-probit log-likelihood lane reduction.

The innermost op of every ESS shrink round is
    out[l] = sum_i mask[i,l] * log(Phi(z_hi[i,l] - g[i,l])
                                   - Phi(z_lo[i,l] - g[i,l]) + 1e-6)
over lanes l (items x horizons) and sites i (respondents). This kernel fuses
the two erf evaluations, the log, the masking and the site reduction into a
single VMEM pass per (site-block, lane-tile), accumulating partial sums in
the output tile across the site-block grid dimension.

Where this fits: measured head-to-head on a v5e chip, XLA's automatic
elementwise+reduce fusion matches or beats this hand-written kernel
(n=100/L=418: 1.9us XLA vs 2.8us Pallas; n=1000/L=1024: 597 vs 623us;
n=5000/L=1024: 578 vs 825us; results agree to 2e-6). The kernel is kept as a
validated alternative backend and as the template for future fused variants
(e.g. folding the f*[theta_idx] row gather of the grid-native sampler into
the likelihood pass), not wired into the default hot path — hand-scheduling
what the compiler already fuses is a loss here.

A note on the reference's "hot kernel": its dominant cost is a 1001x1001
per-iteration Cholesky (src/draw-fstar.cpp:26-36). This framework removes
that factorization entirely (Matheron pathwise draws + grid-native f
sampling), so the remaining hot ops are exactly these fused likelihood
reductions and MXU matmuls — there is deliberately no Pallas Cholesky
because the better kernel is no Cholesky at all.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["ordinal_ll_lanes"]

_INV_SQRT2 = 0.7071067811865476
_LANE_TILE = 512
_SITE_BLOCK = 256


def _erf(x):
    """erf via Abramowitz & Stegun 7.1.26 (|error| <= 1.5e-7, i.e. float32
    exact) — Mosaic has no erf primitive, so we lower it ourselves with one
    exp and a degree-5 polynomial on the VPU."""
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


def _kernel(g_ref, zlo_ref, zhi_ref, mask_ref, out_ref):
    i = pl.program_id(1)  # site-block index

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    g = g_ref[:]
    dt = g.dtype
    c = jnp.asarray(_INV_SQRT2, dt)
    p_hi = _erf((zhi_ref[:] - g) * c)
    p_lo = _erf((zlo_ref[:] - g) * c)
    # Phi(b)-Phi(a) = (erf(b/sqrt2)-erf(a/sqrt2))/2
    p = 0.5 * (p_hi - p_lo)
    terms = jnp.log(p + jnp.asarray(1e-6, dt)) * mask_ref[:]
    out_ref[:] += jnp.sum(terms, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("interpret",))
def ordinal_ll_lanes(
    g: jnp.ndarray,
    z_lo: jnp.ndarray,
    z_hi: jnp.ndarray,
    mask: jnp.ndarray,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused masked ordinal log-likelihood summed over sites.

    Args:
      g, z_lo, z_hi: (n, L) float arrays (sites x lanes).
      mask: (n, L) float (1.0 observed / 0.0 missing).
    Returns:
      (L,) per-lane sums.
    """
    n, L = g.shape
    dt = g.dtype
    # pad to tile multiples; padded region is masked out
    Lp = -(-L // _LANE_TILE) * _LANE_TILE
    np_ = -(-n // _SITE_BLOCK) * _SITE_BLOCK

    def _pad(x, fill):
        return jnp.pad(x, ((0, np_ - n), (0, Lp - L)), constant_values=fill)

    gp = _pad(g, 0.0)
    zlop = _pad(z_lo, 0.0)
    zhip = _pad(z_hi, 1.0)
    maskp = _pad(mask.astype(dt), 0.0)

    grid = (Lp // _LANE_TILE, np_ // _SITE_BLOCK)
    spec_in = pl.BlockSpec(
        (_SITE_BLOCK, _LANE_TILE),
        lambda j, i: (i, j),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[spec_in] * 4,
        out_specs=pl.BlockSpec(
            (1, _LANE_TILE), lambda j, i: (0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, Lp), dt),
        interpret=interpret,
    )(gp, zlop, zhip, maskp)
    return out[0, :L]
