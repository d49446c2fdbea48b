"""Utilities: response ingestion, datasets, RData reader, diagnostics."""

from gpirt_tpu.utils.response import (
    ResponseMatrix,
    response_matrix,
    is_response_matrix,
    as_response_matrix,
    encode_categories,
    DEFAULT_VOTE_CODES,
)
from gpirt_tpu.utils.diagnostics import split_rhat, effective_sample_size, summarize
from gpirt_tpu.utils.rdata import load_rda
from gpirt_tpu.utils.cache import enable_persistent_cache

__all__ = [
    "enable_persistent_cache",
    "ResponseMatrix",
    "response_matrix",
    "is_response_matrix",
    "as_response_matrix",
    "encode_categories",
    "DEFAULT_VOTE_CODES",
    "split_rhat",
    "effective_sample_size",
    "summarize",
    "load_rda",
]
