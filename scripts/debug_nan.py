"""Find the first NaN-producing block in the f32 conjugate sweep (TPU/CPU)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from gpirt_tpu.models import GPIRTConfig, make_constants
from gpirt_tpu.models import gibbs as G
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
ti = np.random.default_rng(0).permutation(np.linspace(-2,2,n))[None]
yj = jnp.asarray(y)
st = G.init_state(jax.random.key(5), jnp.asarray(ti, jnp.float32),
                  jnp.asarray(thr, jnp.float32), yj, consts, config)

def fin(x):
    return bool(jnp.all(jnp.isfinite(x)))

@jax.jit
def stepwise(state, key):
    """The conjugate sweep, emitting per-block finiteness + summaries."""
    k_f, k_fs, k_th, k_b, k_t = jax.random.split(key, 5)
    mu_star = G.compute_mu_star(consts, state.beta)
    dbg = {}
    s = 0
    theta_idx = G.draw_theta(jax.random.fold_in(k_th, s), state, mu_star, yj, consts, config)
    f = jnp.take_along_axis(state.fstar, theta_idx[:, :, None], axis=1)
    state = state._replace(theta_idx=theta_idx, f=f)
    theta = G.theta_from_indices(theta_idx, consts)
    mu = G.compute_mu(theta, state.beta)
    z = G.draw_z_truncnorm(jax.random.fold_in(k_f, 3*s), f + mu, yj, state.thresholds)
    dbg['z_max'] = jnp.max(jnp.abs(z))
    dbg['theta_sd'] = jnp.std(theta)
    dbg['theta_mean'] = jnp.mean(theta)
    idx2 = G.affine_theta_moves(jax.random.fold_in(k_f, 3*s+1), theta_idx, z, state.beta, consts, config)
    dbg['affine_moved'] = jnp.sum(jnp.abs(idx2 - theta_idx))
    state = state._replace(theta_idx=idx2)
    theta = G.theta_from_indices(idx2, consts)
    dbg['theta_sd2'] = jnp.std(theta)
    dbg['theta_mean2'] = jnp.mean(theta)
    mu = G.compute_mu(theta, state.beta)
    fstar, f = G.draw_fstar_conjugate(jax.random.fold_in(k_f, 3*s+2), state, z - mu, config, consts)
    dbg['fstar_max'] = jnp.max(jnp.abs(fstar))
    state = state._replace(fstar=fstar, f=f)
    beta = G.draw_beta_conjugate(k_b, theta, z - f, consts, config)
    dbg['beta_max'] = jnp.max(jnp.abs(beta))
    state = state._replace(beta=beta)
    mu = G.compute_mu(theta, beta)
    thresholds = G.draw_threshold(k_t, state.thresholds, f, mu, yj, config)
    dbg['thr_max'] = jnp.max(jnp.abs(jnp.where(jnp.isfinite(thresholds), thresholds, 0)))
    state = state._replace(thresholds=thresholds)
    from gpirt_tpu.ops.likelihood import ordinal_ll_terms
    ll = jnp.sum(ordinal_ll_terms(f + mu, yj, thresholds))
    return state, ll, dbg

for i in range(200):
    st, ll, dbg = stepwise(st, jax.random.fold_in(jax.random.key(7), i))
    d = {k: float(v) for k, v in dbg.items()}
    bad = (not np.isfinite(float(ll))) or any(not np.isfinite(v) for v in d.values())
    if i % 10 == 0 or bad:
        print(i, 'll', round(float(ll), 1),
              {k: round(v, 3) for k, v in d.items()}, flush=True)
    if bad:
        print('FIRST BAD SWEEP', i, flush=True)
        break
else:
    print('ALL FINITE', flush=True)
