"""Pure-function numerics: kernels, likelihoods, ESS, linear algebra."""

from gpirt_tpu.ops.kernels import icc_gram, time_gram, add_jitter
from gpirt_tpu.ops.likelihood import (
    LL_FLOOR,
    ordinal_ll,
    ordinal_ll_terms,
    delta_to_threshold,
    threshold_to_delta,
)
from gpirt_tpu.ops.ess import ess_update
from gpirt_tpu.ops.linalg import (
    chol_with_jitter,
    tri_solve,
    double_solve,
    host_cholesky_f64,
)

__all__ = [
    "icc_gram",
    "time_gram",
    "add_jitter",
    "LL_FLOOR",
    "ordinal_ll",
    "ordinal_ll_terms",
    "delta_to_threshold",
    "threshold_to_delta",
    "ess_update",
    "chol_with_jitter",
    "tri_solve",
    "double_solve",
    "host_cholesky_f64",
]
