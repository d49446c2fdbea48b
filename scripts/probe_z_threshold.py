"""Bisect draw_z and the binary draw_threshold ESS at the senate116 bench
shape: which sub-operation actually costs the measured ~1.1 / ~2.2 ms?

Each candidate is timed with the slope method (utils.profiling.device_time:
marginal per-step device time between a 20- and a 100-step scan, dispatch
latency cancelled) with the carry poisoning every expensive input so XLA
cannot hoist loop-invariant work.

Run on the real chip:
  JAX_COMPILATION_CACHE_DIR=.jax_cache python scripts/probe_z_threshold.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import jax
from gpirt_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()  # env var alone is read too early; see utils/cache.py
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import ndtri

from gpirt_tpu.utils.profiling import device_time

K, H, n, m = 64, 1, 100, 418
DT = jnp.float32


def main():
    impl = "rbg" if jax.default_backend() == "tpu" else "threefry2x32"
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.normal(size=(K, H, n, m)), DT)
    y = jnp.asarray(rng.integers(0, 3, size=(H, n, m)), jnp.int32)
    t1 = jnp.asarray(rng.normal(size=(K, H, m)) * 0.1, DT)
    key = jax.random.key(7, impl=impl)
    keys = jax.vmap(lambda s: jax.random.key(s, impl=impl))(jnp.arange(K))
    c = jnp.asarray(0.7071067811865476, DT)
    cells = K * H * n * m

    def t(label, fn, init):
        ms = device_time(fn, init, reps=20) * 1e3
        print(f"{label:42s} {ms:8.3f} ms   ({cells / (ms * 1e-3) / 1e9:7.2f} Gelem/s)")

    # --- draw_z pieces ---
    t("erf pass (K,H,n,m)",
      lambda gz, i: 0.5 * (1.0 + jax.lax.erf((gz + 0.1) * c)), g)
    t("erf + wheres (binary bounds)",
      lambda gz, i: (
          jnp.where(y == 2, 0.5 * (1.0 + jax.lax.erf((t1[:, :, None] - gz) * c)), 0.0)
          + jnp.where(y == 1, 1.0, 0.0)
      ), g)
    t("uniform (K,H,n,m)",
      lambda gz, i: gz * 0 + jax.random.uniform(
          jax.random.fold_in(key, i), g.shape, DT), g)
    t("vmapped per-chain uniform",
      lambda gz, i: gz * 0 + jax.vmap(
          lambda k: jax.random.uniform(k, g.shape[1:], DT)
      )(jax.vmap(lambda k: jax.random.fold_in(k, i))(keys)), g)
    t("ndtri pass (K,H,n,m)",
      lambda gz, i: ndtri(jnp.clip(gz * 0.1 + 0.5, 1e-7, 1 - 1e-7)), g)
    t("erf+uniform+ndtri fused (z inverse-cdf)",
      lambda gz, i: (
          gz + ndtri(jnp.clip(
              0.5 * (1.0 + jax.lax.erf((t1[:, :, None] - gz) * c))
              * jax.random.uniform(jax.random.fold_in(key, i), g.shape, DT)
              + 1e-7, 1e-7, 1 - 1e-7))
      ), g)

    from gpirt_tpu.models import gibbs as G
    big = jnp.asarray(1e30, DT)
    thr3 = jnp.stack(
        [jnp.full_like(t1, -big), t1, jnp.full_like(t1, big)], axis=-1
    )  # (K, H, m, 3) binary thresholds
    t("draw_z_truncnorm (full, shared key)",
      lambda gz, i: jax.vmap(
          lambda gg, tt: G.draw_z_truncnorm(jax.random.fold_in(key, i), gg, y, tt)
      )(gz, thr3 + 0 * gz[:, :, :1, :1]), g)

    # --- binary threshold ll pieces ---
    sgn = (jnp.where(y == 1, 1.0, -1.0) * (y > 0)).astype(DT)

    def binary_ll(tt, gz):
        x = sgn * (tt[..., None, :] - gz) * c
        term = jnp.log(0.5 * (1.0 + jax.lax.erf(x)) + 1e-6) * (y > 0)
        return jnp.sum(term, axis=2)

    t("binary threshold ll (1 eval)",
      lambda gz, i: gz + binary_ll(t1 + 0.001 * i, gz).sum() * 1e-30, g)

    from gpirt_tpu.ops.ess import ess_update
    d0 = t1[..., None]  # (K, H, m, 1): lanes (K, H, m), d = 1

    def thr_ess(gz, i, r=32):
        kk = jax.random.fold_in(key, i)
        nu = jax.random.normal(jax.random.fold_in(kk, 1), d0.shape, DT)
        res = ess_update(jax.random.fold_in(kk, 2), d0 + 0 * gz[:, :, :1, :1], nu,
                         lambda dd: binary_ll(dd[..., 0], gz), max_rounds=r)
        # 1e-30 keeps the dependence (not dead-code-elimitable) while the
        # add rounds to gz exactly — the carry stays numerically fixed
        return gz + res[..., 0][:, :, None, :] * 1e-30

    t("binary threshold ESS (full update)", thr_ess, g)
    for r in (1, 2, 4, 8, 16):
        t(f"binary threshold ESS (max_rounds={r})",
          lambda gz, i, r=r: thr_ess(gz, i, r), g)


if __name__ == "__main__":
    main()
