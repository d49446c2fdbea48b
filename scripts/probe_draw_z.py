"""Decompose draw_z's cost at the bench shape: PRNG vs erf vs ndtri.

Also A/Bs the inverse normal CDF: jax.scipy.special.ndtri (Cephes, all
branches evaluated then selected) vs sqrt(2) * lax.erf_inv(2p - 1) (native
HLO, one log). Both are exact inverse CDFs; if erf_inv is faster AND
matches ndtri to f32 tolerance on the clipped domain, draw_z can switch.

Usage: python scripts/probe_draw_z.py
"""

import os
import sys
import time

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

K, H, n, m = 64, 1, 100, 418
SHAPE = (K, H, n, m)
REPS = 50


def timeit(fn, x):
    """ms per rep of fn, scanned REPS times inside one jit (carry-dependent
    input so XLA cannot hoist the body out of the scan)."""

    @jax.jit
    def run(x0):
        def body(c, _):
            return fn(x0 + c).sum(), None

        out, _ = jax.lax.scan(body, jnp.zeros((), x0.dtype), None, length=REPS)
        return out

    run(x).block_until_ready()
    t0 = time.time()
    run(x).block_until_ready()
    return (time.time() - t0) / REPS * 1e3


def timeit_prng(shape):
    @jax.jit
    def run(seed):
        def body(c, i):
            u = jax.random.uniform(jax.random.fold_in(jax.random.key(seed), i),
                                   shape, jnp.float32)
            return c + u.sum(), None

        out, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(REPS))
        return out

    run(0).block_until_ready()
    t0 = time.time()
    run(0).block_until_ready()
    return (time.time() - t0) / REPS * 1e3


def main():
    key = jax.random.key(0)
    g = jax.random.normal(key, SHAPE, jnp.float32)
    p01 = jax.random.uniform(jax.random.fold_in(key, 1), SHAPE) * 0.0  # base

    from jax.scipy.special import ndtri

    clip = lambda x: jnp.clip(0.5 + 0.3 * jnp.sin(x), 1e-6, 1 - 1e-6)

    t_unif = timeit_prng(SHAPE)
    t_erf = timeit(lambda x: jax.lax.erf(x), g)
    t_ndtri = timeit(lambda x: ndtri(clip(x)), g)
    t_erfinv = timeit(
        lambda x: jnp.sqrt(2.0) * jax.lax.erf_inv(2.0 * clip(x) - 1.0), g)

    print(f"shape {SHAPE} = {np.prod(SHAPE)/1e6:.1f}M elems, {REPS} reps")
    print(f"uniform (threefry): {t_unif:.3f} ms")
    print(f"erf:                {t_erf:.3f} ms")
    print(f"ndtri (incl clip):  {t_ndtri:.3f} ms")
    print(f"erf_inv (incl clip):{t_erfinv:.3f} ms")

    # accuracy: f64 reference on host
    pv = np.clip(np.random.default_rng(0).uniform(size=200000), 1e-6, 1 - 1e-6)
    from scipy.special import ndtri as ndtri64
    ref = ndtri64(pv)
    a = np.asarray(jax.jit(ndtri)(jnp.asarray(pv, jnp.float32)))
    b = np.asarray(jax.jit(
        lambda x: jnp.sqrt(2.0) * jax.lax.erf_inv(2.0 * x - 1.0)
    )(jnp.asarray(pv, jnp.float32)))
    print(f"ndtri   f32 max abs err vs f64: {np.abs(a - ref).max():.3e}")
    print(f"erf_inv f32 max abs err vs f64: {np.abs(b - ref).max():.3e}")


if __name__ == "__main__":
    main()
