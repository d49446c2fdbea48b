"""Probe affine-move behavior AT EQUILIBRIUM.

Questions (from the r2 mixing diagnostic: chains converge in ll but disagree
in location/scale/shape, R-hat ~6):
  1. Does the z-marginal actually pull a shifted chain toward the center,
     or is it flat / peaked at the chain's current location?
  2. What are the shift/dilation acceptance rates at equilibrium, and what
     net drift do accepted moves produce?
  3. Do two chains equilibrated at different locations see deltas that
     favor agreement?
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
import jax, jax.numpy as jnp, numpy as np
from gpirt_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()  # env var alone is read too early; see utils/cache.py

from gpirt_tpu.models import GPIRTConfig, make_constants
from gpirt_tpu.models.gibbs import (
    gibbs_sweep, init_state, theta_from_indices, draw_z_truncnorm, compute_mu,
    _z_marginal_parts, _z_marginal_delta, affine_theta_moves,
)
from gpirt_tpu.api import default_thresholds
from gpirt_tpu.utils.datasets import senate116_response_matrix
from gpirt_tpu.utils.response import encode_categories

rm, _, _ = senate116_response_matrix()
y, C, _ = encode_categories(np.asarray(rm))
H, n, m = y.shape
config = GPIRTConfig(n=n, m=m, horizon=H, C=C, dtype='float32', jitter=1e-4,
                     f_method='conjugate')
consts = make_constants(config, np.zeros((3,m)), np.full((3,m),3.0),
                        np.zeros((2,n)), np.zeros((2,n)))
thr = default_thresholds(C, m, H)
yj = jnp.asarray(y)
K = 4
rng = np.random.default_rng(0)
ti = np.stack([rng.permutation(np.linspace(-2, 2, n))[None] for _ in range(K)])
keys = jax.vmap(jax.random.key)(jnp.arange(K))
st = jax.jit(jax.vmap(lambda k, t: init_state(k, t, jnp.asarray(thr, jnp.float32),
                                              yj, consts, config)))(
    keys, jnp.asarray(ti, jnp.float32))

from functools import partial

@partial(jax.jit, static_argnums=2)
def sweeps(st, i0, count):
    def body(c, j):
        c, _ = jax.vmap(lambda cs, kk: gibbs_sweep(
            cs, jax.random.fold_in(kk, i0 + j), yj, consts, config))(c, keys)
        return c, ()
    c, _ = jax.lax.scan(body, st, jnp.arange(count))
    return c

t0 = time.time()
for blk in range(6):
    st = jax.block_until_ready(sweeps(st, blk * 100, 100))
print(f"equilibrated {K} chains x 600 sweeps in {time.time()-t0:.0f}s")

theta = jax.vmap(lambda i: theta_from_indices(i, consts))(st.theta_idx)
print("chain mean(theta):", np.asarray(theta.mean(axis=(1, 2))).round(3))
print("chain sd(theta):  ", np.asarray(theta.std(axis=(1, 2))).round(3))

zk = jax.random.key(1234)
mu = jax.vmap(compute_mu)(theta, st.beta)
z = jax.jit(jax.vmap(lambda g, t: draw_z_truncnorm(zk, g, yj, t)))(
    st.f + mu, st.thresholds)

# 1/3: delta landscape along shifts, per chain
@jax.jit
def delta_shift(idx, z1, b1, k):
    p0 = _z_marginal_parts(idx, z1, b1, consts, config)
    p1 = _z_marginal_parts(jnp.clip(idx + k, 0, 1000), z1, b1, consts, config)
    return _z_marginal_delta(p1, p0)

shifts = [-100, -50, -25, -10, -5, 5, 10, 25, 50, 100]
print("\nz-marginal delta vs shift (rows = chains; >0 favors move):")
print("        " + "".join(f"{s:>9d}" for s in shifts))
for c in range(K):
    row = [float(delta_shift(st.theta_idx[c], z[c], st.beta[c], s))
           for s in shifts]
    print(f"chain{c} " + "".join(f"{v:>9.1f}" for v in row))

@jax.jit
def delta_dilate(idx, z1, b1, a):
    d = idx.astype(jnp.float32) - 500.0
    idx1 = jnp.clip(jnp.round(500.0 + a * d).astype(jnp.int32), 0, 1000)
    p0 = _z_marginal_parts(idx, z1, b1, consts, config)
    p1 = _z_marginal_parts(idx1, z1, b1, consts, config)
    return _z_marginal_delta(p1, p0)

dils = [0.8, 0.9, 0.95, 1.05, 1.1, 1.25]
print("\nz-marginal delta vs dilation:")
print("        " + "".join(f"{a:>9.2f}" for a in dils))
for c in range(K):
    row = [float(delta_dilate(st.theta_idx[c], z[c], st.beta[c], a))
           for a in dils]
    print(f"chain{c} " + "".join(f"{v:>9.1f}" for v in row))

# 2: acceptance rate over fresh keys at equilibrium (full move incl. z draw
# as the sweep does it: z is redrawn each sweep before the moves)
@jax.jit
def probe_moves(st, i):
    theta = jax.vmap(lambda ix: theta_from_indices(ix, consts))(st.theta_idx)
    mu = jax.vmap(compute_mu)(theta, st.beta)
    kz = jax.random.fold_in(jax.random.key(77), i)
    z = jax.vmap(lambda g, t: draw_z_truncnorm(kz, g, yj, t))(st.f + mu,
                                                              st.thresholds)
    ka = jax.random.fold_in(jax.random.key(88), i)
    idx1, _ = jax.vmap(lambda ix, z1, b1: affine_theta_moves(
        ka, ix, z1, b1, consts, config))(st.theta_idx, z, st.beta)
    moved = jnp.sum(jnp.abs(idx1 - st.theta_idx), axis=(1, 2))  # (K,)
    dmean = (jnp.mean(idx1, axis=(1, 2)) - jnp.mean(st.theta_idx, axis=(1, 2)))
    return moved, dmean

moved_tot = np.zeros(K)
dmean_tot = np.zeros(K)
any_moved = np.zeros(K)
R = 50
for i in range(R):
    mv, dm = probe_moves(st, i)
    moved_tot += np.asarray(mv)
    dmean_tot += np.asarray(dm)
    any_moved += (np.asarray(mv) > 0)
print(f"\nper-sweep affine activity over {R} probes "
      f"({config.affine_rounds} rounds each):")
print("  fraction of sweeps with >=1 accepted move:", (any_moved / R).round(2))
print("  mean |idx change| per sweep:", (moved_tot / R / n).round(2),
      "(grid steps per respondent)")
print("  mean drift of mean(idx):", (dmean_tot / R).round(2), "grid steps")
