"""Probe the affine-move z-marginal against float64 numpy brute force."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from gpirt_tpu.models import GPIRTConfig, make_constants
from gpirt_tpu.models.gibbs import (
    gibbs_sweep, init_state, theta_from_indices, draw_z_truncnorm, compute_mu,
    _z_marginal_parts, _z_marginal_delta, _dilation_interval_logq,
)
from gpirt_tpu.api import default_thresholds
from gpirt_tpu.utils.datasets import senate116_response_matrix
from gpirt_tpu.utils.response import encode_categories
from gpirt_tpu.ops.kernels import icc_gram_np

rm, _, _ = senate116_response_matrix()
y, C, _ = encode_categories(np.asarray(rm))
H, n, m = y.shape
config = GPIRTConfig(n=n, m=m, horizon=H, C=C, dtype='float32', jitter=1e-4,
                     f_method='conjugate', affine_rounds=0)
consts = make_constants(config, np.zeros((3,m)), np.full((3,m),3.0),
                        np.zeros((2,n)), np.zeros((2,n)))
thr = default_thresholds(C, m, H)
ti = np.random.default_rng(0).permutation(np.linspace(-2,2,n))[None]
yj = jnp.asarray(y)
st = init_state(jax.random.key(5), jnp.asarray(ti, jnp.float32),
                jnp.asarray(thr, jnp.float32), yj, consts, config)

@jax.jit
def sweep(st, i):
    return gibbs_sweep(st, jax.random.fold_in(jax.random.key(7), i), yj, consts, config)

for i in range(10):
    st, ll = sweep(st, i)

theta = theta_from_indices(st.theta_idx, consts)
mu = compute_mu(theta, st.beta)
z = draw_z_truncnorm(jax.random.key(42), st.f + mu, yj, st.thresholds)
print("state: mean", float(theta.mean()), "sd", float(theta.std()),
      "beta_max", float(jnp.max(jnp.abs(st.beta))))

grid64 = np.linspace(-5, 5, config.grid_size)
gram64 = icc_gram_np(grid64, grid64, np.full(3, 3.0))
z64 = np.asarray(z, np.float64)
beta64 = np.asarray(st.beta, np.float64)

def brute_lp(idx):
    idx = np.asarray(idx)
    th = grid64[idx]  # (H, n)
    X = np.stack([np.ones_like(th), th, th*th], -1)  # (H, n, 3)
    mu = np.einsum("hnp,hpm->hnm", X, beta64)
    lp = 0.0
    for h in range(H):
        B = gram64[np.ix_(idx[h], idx[h])] + np.eye(n)
        sign, logdet = np.linalg.slogdet(B)
        r = z64[h] - mu[h]
        quad = np.sum(r * np.linalg.solve(B, r))
        lp += -0.5*quad - 0.5*m*logdet
    lp += -0.5*np.sum(th[0]**2)
    return lp

idx0 = np.asarray(st.theta_idx)
p0 = _z_marginal_parts(st.theta_idx, z, st.beta, consts, config)
lp0_np = brute_lp(idx0)
for name, idx1 in [
    ("shift+25", np.clip(idx0+25, 0, 1000)),
    ("shift+100", np.clip(idx0+100, 0, 1000)),
    ("shift+350", np.clip(idx0+350, 0, 1000)),
    ("dilate1.2", np.clip(np.round(500 + 1.2*(idx0-500)).astype(np.int32), 0, 1000)),
    ("dilate0.8", np.clip(np.round(500 + 0.8*(idx0-500)).astype(np.int32), 0, 1000)),
    ("dilate2.0", np.clip(np.round(500 + 2.0*(idx0-500)).astype(np.int32), 0, 1000)),
]:
    p1 = _z_marginal_parts(jnp.asarray(idx1), z, st.beta, consts, config)
    d_jax = float(_z_marginal_delta(p1, p0))
    d_np = brute_lp(idx1) - lp0_np
    print(f"{name:10s} delta_jax {d_jax:14.2f}  delta_np64 {d_np:14.2f}")
