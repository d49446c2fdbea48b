"""Decompose the post-push-through draw_fstar_conjugate block (round 5).

VERDICT r4 item 2 asked for fstar <= 0.7 ms at senate/64 or a roofline
argument with measurements. The push-through smoother (U^T B^{-1} rhs =
C^{-1} U^T rhs) deleted lowrank_bsolve and the alpha materialization;
anatomy then measured 1.20 -> 1.02 ms at senate/64 and 5.49 -> 2.79 ms at
5k x 1k / 8. This probe times the block's remaining pieces in isolation —
each through utils.profiling.device_time (carry-poisoned scan inside one
jit, slope between a reps- and 5*reps-step program, so the tunnel's ~24 ms
per-dispatch latency cancels) — to locate the residual senate millisecond:

  rng    the three prior-draw RNG tensors (z_q, z_p, z_n — z_n is the
         (H, N, m) grid nugget, 107 MB at senate/64) materialized
  site   U_theta gather + u_theta einsum + eps (rank-k site math)
  cap    g_k contraction + capacitance build/factor/solve + refinement
  grid   the final U_grid (N, k) x (k, m) matmul + sj*z_n + f gather,
         at HIGHEST (bf16x3, the production setting) and DEFAULT (bf16)
  full   the whole draw (= anatomy's block)

Usage: python scripts/probe_fstar_pushthrough.py [--chains 64]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
from gpirt_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=64)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    from gpirt_tpu.api import default_thresholds
    from gpirt_tpu.models import GPIRTConfig, make_constants
    from gpirt_tpu.models.gibbs import (
        draw_fstar_conjugate, init_state, theta_site_basis, _normal2d,
    )
    from gpirt_tpu.utils.datasets import senate116_response_matrix
    from gpirt_tpu.utils.profiling import device_time
    from gpirt_tpu.utils.response import encode_categories
    from gpirt_tpu.ops.linalg import tri_solve

    rm, _, _ = senate116_response_matrix()
    y, C, _ = encode_categories(np.asarray(rm))
    H, n, m = y.shape
    config = GPIRTConfig(n=n, m=m, horizon=H, C=C, dtype="float32",
                         f_method="conjugate")
    consts = make_constants(
        config,
        beta_prior_means=np.zeros((3, m)),
        beta_prior_sds=np.full((3, m), 1.5),
        theta_prior_means=np.zeros((2, n)),
        theta_prior_sds=np.full((2, n), 0.0),
    )
    B = args.chains
    N = config.grid_size
    q = np.asarray(consts.U_se).shape[1]
    k_dim = q + 3
    dt = jnp.float32
    print(f"senate x {B} chains: n={n} m={m} N={N} k={k_dim}", flush=True)

    rng = np.random.default_rng(0)
    impl = config.resolved_prng_impl  # rbg on TPU — the production stream
    keys = jax.vmap(lambda s: jax.random.key(s, impl=impl))(jnp.arange(B))
    thr = jnp.asarray(default_thresholds(C, m, H), dt)
    ti = jnp.asarray(np.tile(np.linspace(-2, 2, n)[None], (H, 1)), dt)
    state = jax.jit(jax.vmap(
        lambda k: init_state(k, ti, thr, jnp.asarray(y), consts, config)
    ))(keys)
    z_resid = jnp.asarray(rng.normal(size=(B, H, n, m)), dt)
    state = jax.block_until_ready(state)

    sj = jnp.sqrt(jnp.asarray(config.jitter, dt))
    hi = jax.lax.Precision.HIGHEST

    def eps(c):  # data-dependent zero: defeats loop-invariant hoisting
        return jnp.ravel(c)[0].astype(dt) * 0

    def _prior_rng(key):
        k_u, k_e = jax.random.split(key)
        k_q, k_p, k_n = jax.random.split(k_u, 3)
        z_q = _normal2d(k_q, (H, q, m), dt)
        z_p = _normal2d(k_p, (H, 3, m), dt)
        z_n = _normal2d(k_n, (H, N, m), dt)
        ep = _normal2d(k_e, (H, n, m), dt)
        return jnp.concatenate([z_q, z_p], axis=1), z_n, ep

    # concrete intermediates for the captures
    zc0, zn0, eps0 = jax.jit(jax.vmap(_prior_rng))(keys)
    U0 = jax.jit(jax.vmap(lambda s: theta_site_basis(s.theta_idx, consts)))(
        state)
    ue0 = jax.block_until_ready(
        jnp.einsum("bhnk,bhkm->bhnm", U0, zc0) + eps0)
    cap_tree = dict(state=state, z_resid=z_resid, keys=keys, zc=zc0, zn=zn0,
                    eps=eps0, U=U0, ue=ue0, consts=consts)

    t = {}

    # full block, BOTH outputs live (fstar is carried in state and the
    # theta table reads all N grid rows next sweep, so the 107 MB fstar
    # materialization is a real per-sweep cost)
    fs_init = jnp.zeros((B, H, N, m), dt)
    t["full"] = device_time(
        lambda fs_, i, cp: jax.vmap(
            lambda s, zr, k: draw_fstar_conjugate(
                jax.random.fold_in(k, i), s, zr, config, cp["consts"])[0]
        )(cp["state"]._replace(
            theta_idx=cp["state"].theta_idx
            + jnp.ravel(fs_)[0].astype(jnp.int32) * 0,
        ), cp["z_resid"] + eps(fs_), cp["keys"]),
        fs_init, args.reps, captures=cap_tree)

    # anatomy's variant: only f = fstar[theta_idx] kept (lets XLA drop or
    # narrow the full-grid materialization — quantifies how much the block
    # anatomy table undercounts)
    t["full_fonly"] = device_time(
        lambda f_, i, cp: jax.vmap(
            lambda s, zr, k: draw_fstar_conjugate(
                jax.random.fold_in(k, i), s, zr, config, cp["consts"])[1]
        )(cp["state"]._replace(
            f=f_,
            theta_idx=cp["state"].theta_idx
            + jnp.ravel(f_)[0].astype(jnp.int32) * 0,
        ), cp["z_resid"] + eps(f_), cp["keys"]),
        state.f, args.reps, captures=cap_tree)

    # rng: generate + materialize all four tensors (z_n dominates: 107 MB)
    def rng_step(c, i, cp):
        zn_c, _ = c
        zc, zn, ep = jax.vmap(
            lambda k: _prior_rng(jax.random.fold_in(k, i)))(cp["keys"])
        return zn + eps(zn_c), jnp.sum(zc) + jnp.sum(ep)

    t["rng"] = device_time(rng_step, (zn0, jnp.zeros((), dt)), args.reps,
                           captures=cap_tree)

    # site math: U_theta gather + u_theta einsum + eps add
    def site_step(c, i, cp):
        s = cp["state"]
        def one(idx, zc, zn, ep):
            U = theta_site_basis(idx, cp["consts"])
            return (jnp.einsum("hnk,hkm->hnm", U, zc, precision=hi)
                    + sj * jnp.take_along_axis(zn, idx[:, :, None], axis=1)
                    + ep)
        return jax.vmap(one)(
            s.theta_idx + jnp.ravel(c)[0].astype(jnp.int32) * 0,
            cp["zc"], cp["zn"], cp["eps"])

    t["site"] = device_time(site_step, ue0, args.reps, captures=cap_tree)

    # capacitance: g_k + C build/factor + equilibrated solve + refinement
    def cap_step(c, i, cp):
        def one(Ut, z, u):
            g_k = jnp.einsum("hnk,hnm->hkm", Ut, z - u, precision=hi)
            Cm = jnp.eye(k_dim, dtype=dt) + jnp.einsum(
                "hnk,hnl->hkl", Ut, Ut, precision=hi)
            sc = jnp.sqrt(jnp.diagonal(Cm, axis1=-2, axis2=-1))
            inv = 1.0 / sc
            Lc = jnp.linalg.cholesky(
                Cm * (inv[..., :, None] * inv[..., None, :]))

            def c_solve(rhs):
                w = tri_solve(Lc, rhs * inv[..., None])
                return tri_solve(Lc, w, trans=True) * inv[..., None]

            ua = c_solve(g_k)
            return ua + c_solve(g_k - jnp.einsum(
                "hkl,hlm->hkm", Cm, ua, precision=hi))
        return jax.vmap(one)(cp["U"] + eps(c), cp["z_resid"],
                             cp["ue"] + eps(c))

    ua0 = jax.block_until_ready(jax.jit(
        lambda: cap_step(jnp.zeros((B, H, k_dim, m), dt), 0, cap_tree))())
    cap_tree["ua"] = ua0
    t["cap"] = device_time(cap_step, ua0, args.reps, captures=cap_tree)

    # final grid matmul + nugget add + gather, both precisions
    U_grid = jnp.concatenate([consts.U_se, consts.Psi_grid], axis=-1)

    def grid_step(prec):
        def step(c, i, cp):
            def one(zc, a, zn, idx):
                fs = jnp.einsum("ak,hkm->ham", U_grid, zc + a,
                                precision=prec) + sj * zn
                return fs
            return jax.vmap(one)(
                cp["zc"], cp["ua"] + eps(c), cp["zn"],
                cp["state"].theta_idx)
        return step

    fs0 = jnp.zeros((B, H, N, m), dt)
    t["grid_hi"] = device_time(grid_step(hi), fs0, args.reps,
                               captures=cap_tree)
    t["grid_def"] = device_time(grid_step(jax.lax.Precision.DEFAULT), fs0,
                                args.reps, captures=cap_tree)

    ms = {k: v * 1e3 for k, v in t.items()}
    print(f"full block        : {ms['full']:7.3f} ms   (fstar + f live)")
    print(f"full, f-only out  : {ms['full_fonly']:7.3f} ms   (anatomy's "
          f"measurement basis)")
    print(f"  rng (zc/zn/eps) : {ms['rng']:7.3f} ms   (z_n = "
          f"{B * H * N * m * 4 / 1e6:.0f} MB)")
    print(f"  site math       : {ms['site']:7.3f} ms")
    print(f"  capacitance     : {ms['cap']:7.3f} ms")
    print(f"  grid matmul HI  : {ms['grid_hi']:7.3f} ms   (bf16x3)")
    print(f"  grid matmul DEF : {ms['grid_def']:7.3f} ms   (bf16, f32 acc)")
    print(f"  sum of pieces   : "
          f"{ms['rng'] + ms['site'] + ms['cap'] + ms['grid_hi']:7.3f} ms")
    gf = 2 * B * H * N * k_dim * m / 1e9
    print(f"grid matmul flops : {gf:.2f} GF -> HI "
          f"{gf / ms['grid_hi']:,.1f} TF/s, DEF {gf / ms['grid_def']:,.1f} "
          f"TF/s (K={k_dim} pads: MXU ceiling ~{66 * k_dim / 128:.0f} TF "
          f"f32 / ~{197 * k_dim / 128:.0f} TF bf16); grid write+nugget "
          f"floor {2 * B * H * N * m * 4 / 1e6:.0f} MB -> "
          f"{2 * B * H * N * m * 4 / 819e9 * 1e3:.3f} ms at the HBM roof")


if __name__ == "__main__":
    main()
