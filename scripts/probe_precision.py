"""Measure TPU f32 error of the conjugate-path linear algebra at wide theta.

Compares woodbury_solve and the kstar contraction on the TPU (default matmul
precision, then explicit HIGHEST) against float64 numpy ground truth.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from functools import partial
from gpirt_tpu.models import GPIRTConfig, make_constants
from gpirt_tpu.models.gibbs import woodbury_factors, woodbury_solve
from gpirt_tpu.ops.kernels import icc_gram_np

n, m, N = 102, 600, 1001
config = GPIRTConfig(n=n, m=m, horizon=1, C=2, dtype="float32")
consts = make_constants(config, np.zeros((3, m)), np.full((3, m), 3.0),
                        np.zeros((2, n)), np.zeros((2, n)))
rng = np.random.default_rng(0)
grid = np.linspace(-5, 5, N)
# wide configuration: the regime where round-2 f32 runs exploded
theta = np.clip(rng.normal(-1.0, 1.8, n), -4.99, 4.99)
idx = np.round((theta + 5) / 0.01).astype(np.int32)[None]
r = rng.standard_normal((1, n, m)) * 3.0

# float64 ground truth
th = grid[idx[0]]
K = icc_gram_np(th, th, np.full(3, 3.0))
B = K + np.eye(n)
alpha64 = np.linalg.solve(B, r[0])
kstar64 = icc_gram_np(grid, th, np.full(3, 3.0))  # (N, n)
fpart64 = kstar64 @ alpha64  # (N, m)

idx_j = jnp.asarray(idx)
r_j = jnp.asarray(r, jnp.float32)

@jax.jit
def solve_default(idx, r):
    wb = woodbury_factors(idx, consts)
    a = woodbury_solve(wb, r)
    ks = consts.grid_gram[idx]  # (1, n, N)
    return a, jnp.einsum("hna,hnm->ham", ks, a)

@jax.jit
def solve_hi(idx, r):
    wb = woodbury_factors(idx, consts)
    a = woodbury_solve(wb, r)
    ks = consts.grid_gram[idx]
    return a, jnp.einsum("hna,hnm->ham", ks, a,
                         precision=jax.lax.Precision.HIGHEST)

for name, fn in [("default", solve_default), ("HIGHEST-einsum", solve_hi)]:
    a, f = fn(idx_j, r_j)
    a = np.asarray(a)[0]; f = np.asarray(f)[0]
    ea = np.abs(a - alpha64)
    ef = np.abs(f - fpart64)
    print(f"{name:16s} alpha err max {ea.max():.3e} rel {ea.max()/np.abs(alpha64).max():.3e}"
          f" | kstar@alpha err max {ef.max():.3e} (true max {np.abs(fpart64).max():.1f})",
          flush=True)
