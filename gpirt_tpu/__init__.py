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

__all__ = [
    "ops",
    "__version__",
    "gpirt_mcmc",
    "gpirt_campaigns",
    "recover_fstar",
    "response_matrix",
    "is_response_matrix",
    "as_response_matrix",
]


def __getattr__(name):
    # Lazy imports keep `import gpirt_tpu` light (no model/api modules until
    # first use) while exposing the full reference-parity surface.
    if name in ("gpirt_mcmc", "recover_fstar", "recover_fstar_batch",
                "default_thresholds"):
        from gpirt_tpu import api

        return getattr(api, name)
    if name in ("gpirt_campaigns", "campaign_schedule"):
        from gpirt_tpu import campaigns

        return getattr(campaigns, name)
    if name in ("response_matrix", "is_response_matrix", "as_response_matrix",
                "ResponseMatrix", "encode_categories"):
        from gpirt_tpu.utils import response

        return getattr(response, name)
    if name in ("models", "utils", "parallel", "api"):
        import importlib

        return importlib.import_module(f"gpirt_tpu.{name}")
    raise AttributeError(f"module 'gpirt_tpu' has no attribute {name!r}")
