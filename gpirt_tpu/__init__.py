"""gpirt-tpu: a TPU-native JAX framework for Gaussian Process IRT sampling.

Built from scratch with the capabilities of the reference R/Rcpp ``gpirt``
package (GP item response theory MCMC, UAI 2020), redesigned for TPU:
batched XLA linear algebra, one fused elliptical-slice-sampling primitive,
Matheron-rule pathwise GP conditioning on the fixed theta* grid, ``lax.scan``
for the sequential Gibbs loop, and ``shard_map`` chain parallelism over a
device mesh.
"""

__version__ = "0.1.0"

from gpirt_tpu import ops

__all__ = ["ops", "__version__"]
