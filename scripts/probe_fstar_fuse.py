"""Bound the win of fusing the (H, N, m) grid-nugget draw into the fstar
projection (ROADMAP r3 item 2).

The current draw_fstar_conjugate must MATERIALIZE z_n ~ N(0,1)^(H,N,m)
(~107 MB at 64 senate chains) because it has two consumers with a data
dependency between them: the theta-site gather feeding alpha, then the
final `+ sj * z_n`. Variants measured here:

  current  the shipped draw (z_n materialized)
  indep    site nugget drawn independently of the grid nugget — WRONG
           distribution (the Matheron site values must equal the grid
           draw's rows) but gives z_n a single consumer, so XLA can fuse
           the generation into the final add: an upper bound on any
           fusion win (Pallas or otherwise)
  nonug    z_n term dropped entirely — bounds rng + HBM cost of the
           nugget path

All variants share every other op, inputs poisoned through the scan carry
(perf_anatomy pattern) so nothing hoists.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)

import numpy as np
import jax
from gpirt_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()  # env var alone is read too early; see utils/cache.py
import jax.numpy as jnp

from gpirt_tpu.models import gibbs as G
from gpirt_tpu.models.gibbs import gibbs_sweep, init_state
from gpirt_tpu.utils.profiling import device_time
from scripts.perf_anatomy import build


def fstar_variant(key, state, z_resid, config, consts, mode):
    H, n, m = z_resid.shape
    N = config.grid_size
    dt = z_resid.dtype
    q = consts.U_se.shape[1]
    idx = state.theta_idx
    k_u, k_e = jax.random.split(key)
    hi = jax.lax.Precision.HIGHEST

    k_q, k_p, k_n = jax.random.split(k_u, 3)
    z_q = G._normal2d(k_q, (H, q, m), dt)
    z_p = G._normal2d(k_p, (H, 3, m), dt)
    zc = jnp.concatenate([z_q, z_p], axis=1)
    sj = jnp.sqrt(jnp.asarray(config.jitter, dt))
    U_theta = G.theta_site_basis(idx, consts)
    if mode == "current":
        z_n = G._normal2d(k_n, (H, N, m), dt)
        site_nug = sj * jnp.take_along_axis(z_n, idx[:, :, None], axis=1)
    elif mode == "indep":
        z_n = G._normal2d(k_n, (H, N, m), dt)
        site_nug = sj * G._normal2d(jax.random.fold_in(k_n, 1), (H, n, m), dt)
    else:  # nonug
        z_n = None
        site_nug = 0.0
    u_theta = jnp.einsum("hnk,hkm->hnm", U_theta, zc, precision=hi) + site_nug
    eps = G._normal2d(k_e, (H, n, m), dt)
    alpha, _ = G.lowrank_bsolve(idx, consts, z_resid - u_theta - eps)
    ua = jnp.einsum("hnk,hnm->hkm", U_theta, alpha, precision=hi)
    U_grid = jnp.concatenate([consts.U_se, consts.Psi_grid], axis=-1)
    fstar = jnp.einsum("ak,hkm->ham", U_grid, zc + ua, precision=hi)
    if z_n is not None:
        fstar = fstar + sj * z_n
    f = jnp.take_along_axis(fstar, idx[:, :, None], axis=1)
    # force production of every fstar row (a gather alone could let XLA
    # skip ungathered rows); 1e-30 scaling keeps it numerically inert
    # without being dead code. Applied identically to all variants.
    f = f + 1e-30 * jnp.sum(fstar, axis=1)[:, None, :]
    return fstar, f


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=64)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    y, thr, ti, consts, config = build("senate", args.chains, "float32")
    K = args.chains
    impl = config.resolved_prng_impl
    keys = jax.vmap(lambda s: jax.random.key(s, impl=impl))(jnp.arange(K))
    state = jax.jit(jax.vmap(
        lambda k, t: init_state(k, t, jnp.asarray(thr, config.jdtype), y,
                                consts, config)
    ))(keys, jnp.asarray(ti, config.jdtype))

    @jax.jit
    def warm(s):
        def body(c, i):
            c, _ = jax.vmap(
                lambda cs, k: gibbs_sweep(cs, k, y, consts, config)
            )(c, jax.vmap(lambda kk: jax.random.fold_in(kk, i))(keys))
            return c, ()
        s, _ = jax.lax.scan(body, s, jnp.arange(20))
        return s
    state = jax.block_until_ready(warm(state))
    print("warm done", file=sys.stderr)

    key = jax.random.key(7, impl=impl)
    theta = jax.vmap(lambda i: G.theta_from_indices(i, consts))(state.theta_idx)
    mu = jax.vmap(G.compute_mu)(theta, state.beta)
    z = jax.jit(jax.vmap(
        lambda g, t: G.draw_z_truncnorm(key, g, y, t)
    ))(state.f + mu, state.thresholds)
    zr = z - mu
    jax.block_until_ready(zr)

    def eps_p(c):
        return jnp.ravel(c)[0].astype(config.jdtype) * 0

    # sub-piece timings: the low-rank capacitance solve alone, and the
    # grid-side tail (final einsum + nugget add + gathers) alone
    t = device_time(
        lambda f_, i: jax.vmap(
            lambda ix, zz: G.lowrank_bsolve(ix, consts, zz)[0]
        )(state.theta_idx + jnp.ravel(f_)[0].astype(jnp.int32) * 0,
          zr + eps_p(f_) + f_ * 0),
        state.f, args.reps)
    print(f"{'bsolve':<8} {t*1e3:7.3f} ms")

    U_grid = jnp.concatenate([consts.U_se, consts.Psi_grid], axis=-1)
    q3 = U_grid.shape[1]
    w0 = jnp.zeros((K, 1, q3, y.shape[2]), config.jdtype)

    def tail(w_, i):
        k_n = jax.random.fold_in(key, i)
        def one(w, ix):
            z_n = G._normal2d(k_n, (1, config.grid_size, y.shape[2]),
                              config.jdtype)
            fs = jnp.einsum("ak,hkm->ham", U_grid, w,
                            precision=jax.lax.Precision.HIGHEST)
            fs = fs + 0.01 * z_n
            f = jnp.take_along_axis(fs, ix[:, :, None], axis=1)
            return f + 1e-30 * jnp.sum(fs, axis=1)[:, None, :]
        f = jax.vmap(one)(w_, state.theta_idx
                          + jnp.ravel(w_)[0].astype(jnp.int32) * 0)
        # carry must match w_'s shape: fold f back into a (1, q3, m) stat
        return w_ + 1e-30 * jnp.sum(f, axis=2, keepdims=True)[:, :, :1, :]

    t = device_time(tail, w0, args.reps)
    print(f"{'tail':<8} {t*1e3:7.3f} ms")

    for mode in ("current", "indep", "nonug"):
        t = device_time(
            lambda f_, i, mode=mode: jax.vmap(
                lambda s, zz: fstar_variant(
                    jax.random.fold_in(key, i), s, zz, config, consts, mode
                )[1]
            )(state._replace(
                f=f_,
                theta_idx=state.theta_idx
                + jnp.ravel(f_)[0].astype(jnp.int32) * 0,
            ), zr + eps_p(f_)),
            state.f, args.reps)
        print(f"{mode:<8} {t*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
