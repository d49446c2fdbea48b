"""Acceptance profile of small compensated shifts / dilations at equilibrium."""
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
    _z_marginal_parts, _z_marginal_delta,
)
from gpirt_tpu.api import default_thresholds
from gpirt_tpu.utils.datasets import senate116_response_matrix
from gpirt_tpu.utils.response import encode_categories
from functools import partial

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

@partial(jax.jit, static_argnums=2)
def sweeps(st, i0, count):
    def body(c, j):
        c, _ = jax.vmap(lambda cs, kk: gibbs_sweep(
            cs, jax.random.fold_in(kk, i0 + j), yj, consts, config))(c, keys)
        return c, ()
    c, _ = jax.lax.scan(body, st, jnp.arange(count))
    return c

for blk in range(6):
    st = jax.block_until_ready(sweeps(st, blk * 100, 100))
theta = jax.vmap(lambda i: theta_from_indices(i, consts))(st.theta_idx)
print("chain means", np.asarray(theta.mean(axis=(1,2))).round(3))
step = 10.0 / (config.grid_size - 1)

def beta_shift(beta, delta):
    b0, b1, b2 = beta[:, 0], beta[:, 1], beta[:, 2]
    return jnp.stack([b0 - b1 * delta + b2 * delta * delta,
                      b1 - 2.0 * b2 * delta, b2], axis=1)

# average acceptance prob over fresh z draws (expected acceptance at
# stationarity is E_z[min(1, e^delta)])
@jax.jit
def acc_shift(stc_idx, f, beta, thrs, zkey, k):
    th = theta_from_indices(stc_idx, consts)
    mu = compute_mu(th, beta)
    z = draw_z_truncnorm(zkey, f + mu, yj, thrs)
    b2 = beta_shift(beta, k * step)
    p0 = _z_marginal_parts(stc_idx, z, beta, consts, config)
    p1 = _z_marginal_parts(jnp.clip(stc_idx + k, 0, 1000), z, b2, consts, config)
    return jnp.minimum(1.0, jnp.exp(_z_marginal_delta(p1, p0)))

@jax.jit
def acc_shift_raw(stc_idx, f, beta, thrs, zkey, k):
    th = theta_from_indices(stc_idx, consts)
    mu = compute_mu(th, beta)
    z = draw_z_truncnorm(zkey, f + mu, yj, thrs)
    p0 = _z_marginal_parts(stc_idx, z, beta, consts, config)
    p1 = _z_marginal_parts(jnp.clip(stc_idx + k, 0, 1000), z, beta, consts, config)
    return jnp.minimum(1.0, jnp.exp(_z_marginal_delta(p1, p0)))

R = 20
print("\nmean acceptance of shift by +-k (compensated / raw), over "
      f"{R} z-draws x {K} chains:")
for k in [1, 2, 3, 5, 8, 12]:
    vals_c, vals_r = [], []
    for i in range(R):
        zkey = jax.random.fold_in(jax.random.key(99), i)
        for c in range(K):
            for s in (k, -k):
                vals_c.append(float(acc_shift(st.theta_idx[c], st.f[c],
                                              st.beta[c], st.thresholds[c],
                                              zkey, s)))
                vals_r.append(float(acc_shift_raw(st.theta_idx[c], st.f[c],
                                                  st.beta[c], st.thresholds[c],
                                                  zkey, s)))
    print(f"  k={k:>3d}: comp {np.mean(vals_c):.3f}   raw {np.mean(vals_r):.3f}")

@jax.jit
def acc_dilate(stc_idx, f, beta, thrs, zkey, a):
    th = theta_from_indices(stc_idx, consts)
    mu = compute_mu(th, beta)
    z = draw_z_truncnorm(zkey, f + mu, yj, thrs)
    d = stc_idx.astype(jnp.float32) - 500.0
    idx1 = jnp.clip(jnp.round(500.0 + a * d).astype(jnp.int32), 0, 1000)
    p0 = _z_marginal_parts(stc_idx, z, beta, consts, config)
    p1 = _z_marginal_parts(idx1, z, beta, consts, config)
    return jnp.minimum(1.0, jnp.exp(_z_marginal_delta(p1, p0)))

print(f"\nmean acceptance of dilation by a (raw, no q-correction):")
for da in [0.005, 0.01, 0.02, 0.04]:
    vals = []
    for i in range(R):
        zkey = jax.random.fold_in(jax.random.key(99), i)
        for c in range(K):
            for a in (1.0 + da, 1.0 - da):
                vals.append(float(acc_dilate(st.theta_idx[c], st.f[c],
                                             st.beta[c], st.thresholds[c],
                                             zkey, a)))
    print(f"  a=1+-{da}: {np.mean(vals):.3f}")
