"""Model layer: config, Gibbs blocks, and the scan-driven sampler."""

from gpirt_tpu.models.config import GPIRTConfig, GPIRTConstants, make_constants
from gpirt_tpu.models.gibbs import GPIRTState, gibbs_sweep, init_state, draw_fstar
from gpirt_tpu.models.sampler import run_chain, sample_schedule, memory_estimate_mb
from gpirt_tpu.models.generate import (
    sample_prior_state,
    sample_responses,
    posterior_predictive,
)

__all__ = [
    "GPIRTConfig",
    "GPIRTConstants",
    "make_constants",
    "GPIRTState",
    "gibbs_sweep",
    "init_state",
    "draw_fstar",
    "run_chain",
    "sample_schedule",
    "memory_estimate_mb",
    "sample_prior_state",
    "sample_responses",
    "posterior_predictive",
]
