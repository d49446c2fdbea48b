"""Probe two candidate collective-shift moves at equilibrium.

A. beta-compensated shift against the z-marginal: theta -> theta + delta,
   beta -> T_delta(beta) keeping mu pointwise invariant (unit-Jacobian
   triangular map). Removes the mu-mismatch penalty; remaining delta is the
   rank-3 kernel part + logdet.

B. joint (theta, f*, beta) translation against the OBSERVED likelihood:
   theta_idx += k, f* rolled k grid steps (edge-clamped), beta compensated.
   g = f*(theta) + mu(theta) is exactly invariant where no clamping hits,
   so the y-likelihood delta ~ 0 and acceptance is set by the priors
   (GP grid prior of the rolled f*, theta prior).
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
    _z_marginal_parts, _z_marginal_delta, ordinal_ll_terms,
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

t0 = time.time()
for blk in range(6):
    st = jax.block_until_ready(sweeps(st, blk * 100, 100))
theta = jax.vmap(lambda i: theta_from_indices(i, consts))(st.theta_idx)
print(f"equilibrated in {time.time()-t0:.0f}s; chain means "
      f"{np.asarray(theta.mean(axis=(1,2))).round(3)}")

step = 10.0 / (config.grid_size - 1)  # grid step in theta units


def beta_shift(beta, delta):
    """T_delta(beta): mu_{beta'}(theta + delta) == mu_beta(theta)."""
    b0, b1, b2 = beta[:, 0], beta[:, 1], beta[:, 2]
    return jnp.stack([b0 - b1 * delta + b2 * delta * delta,
                      b1 - 2.0 * b2 * delta,
                      b2], axis=1)


# --- A: compensated z-marginal delta ---
zk = jax.random.key(1234)
mu = jax.vmap(compute_mu)(theta, st.beta)
z = jax.jit(jax.vmap(lambda g, t: draw_z_truncnorm(zk, g, yj, t)))(
    st.f + mu, st.thresholds)

@jax.jit
def delta_A(idx, z1, b1, k):
    delta = k * step
    b2 = beta_shift(b1, delta)
    p0 = _z_marginal_parts(idx, z1, b1, consts, config)
    p1 = _z_marginal_parts(jnp.clip(idx + k, 0, 1000), z1, b2, consts, config)
    return _z_marginal_delta(p1, p0)

shifts = [-100, -50, -25, -10, -5, 5, 10, 25, 50, 100]
print("\nA: compensated z-marginal delta vs shift:")
print("        " + "".join(f"{s:>9d}" for s in shifts))
for c in range(K):
    row = [float(delta_A(st.theta_idx[c], z[c], st.beta[c], s)) for s in shifts]
    print(f"chain{c} " + "".join(f"{v:>9.1f}" for v in row))

# --- B: joint translation against observed likelihood ---
Kinv_chol = consts.L_grid  # chol(K_grid + jitter I)

@jax.jit
def delta_B(idx, fstar, b1, t1, k):
    delta = k * step
    idx1 = idx + k
    ok = (jnp.min(idx1) >= 0) & (jnp.max(idx1) <= 1000)
    idx1 = jnp.clip(idx1, 0, 1000)
    # roll f* so the function moves WITH theta: f*'(x) = f*(x - delta)
    src = jnp.clip(jnp.arange(config.grid_size) - k, 0, 1000)
    fs1 = fstar[:, src, :]
    b2 = beta_shift(b1, delta)
    th0 = theta_from_indices(idx, consts)
    th1 = theta_from_indices(idx1, consts)
    g0 = jnp.take_along_axis(fstar, idx[:, :, None], axis=1) + compute_mu(th0, b1)
    g1 = jnp.take_along_axis(fs1, idx1[:, :, None], axis=1) + compute_mu(th1, b2)
    dll = jnp.sum(ordinal_ll_terms(g1, yj, t1) - ordinal_ll_terms(g0, yj, t1))
    # GP grid prior: -0.5 f^T (K+jI)^{-1} f per item
    def energy(fs):
        w = jax.lax.linalg.triangular_solve(
            Kinv_chol[None], fs, left_side=True, lower=True)
        return -0.5 * jnp.sum(jnp.square(w))
    dgp = energy(fs1) - energy(fstar)
    # theta prior (CST)
    dth = -0.5 * (jnp.sum(jnp.square(th1[0])) - jnp.sum(jnp.square(th0[0])))
    # beta prior N(0, sds^2 + 1e-6)
    var_b = jnp.square(consts.beta_prior_sds) + 1e-6
    dbe = -0.5 * (jnp.sum(jnp.square(b2) / var_b) - jnp.sum(jnp.square(b1) / var_b))
    return jnp.where(ok, dll + dgp + dth + dbe, -jnp.inf), dll, dgp, dth, dbe

print("\nB: joint (theta, f*, beta) translation delta vs shift"
      " [total | ll, gp, theta, beta]:")
for c in range(K):
    parts = [delta_B(st.theta_idx[c], st.fstar[c], st.beta[c],
                     st.thresholds[c], s) for s in shifts]
    tot = "".join(f"{float(p[0]):>9.1f}" for p in parts)
    print(f"chain{c} " + tot)
    if c == 0:
        for nm, j in [("ll", 1), ("gp", 2), ("th", 3), ("be", 4)]:
            print(f"   {nm}   " + "".join(f"{float(p[j]):>9.1f}" for p in parts))
