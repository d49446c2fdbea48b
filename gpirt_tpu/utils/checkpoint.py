"""Checkpoint / resume for long MCMC runs.

The reference has no checkpointing: an interrupt loses the entire run
(Rcpp::checkUserInterrupt aborts with all draws in process memory,
src/gpirtMCMC.cpp:264, SURVEY.md section 5.3-5.4). Here the chain state,
progress counter and accumulated thinned draws are persisted atomically every
``checkpoint_every`` iterations; a resumed run continues the identical
deterministic key schedule, so (interrupt + resume) is bitwise equal to an
uninterrupted run (tested).
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gpirt_tpu.models.config import GPIRTConfig, GPIRTConstants
from gpirt_tpu.models.gibbs import (
    GPIRTState,
    compute_mu_star,
    gibbs_sweep,
    init_state,
    theta_from_indices,
)

__all__ = ["CheckpointManager", "run_chain_checkpointed"]

_STATE_FIELDS = GPIRTState._fields


class CheckpointManager:
    """Atomic .npz checkpoints of (state, meta, accumulated draws)."""

    def __init__(self, path: str):
        self.path = path

    def exists(self) -> bool:
        return os.path.exists(self.path)

    def save(self, state: GPIRTState, meta: dict, draws: Dict[str, np.ndarray]):
        payload = {f"state_{k}": np.asarray(v) for k, v in state._asdict().items()}
        for k, v in draws.items():
            payload[f"draws_{k}"] = np.asarray(v)
        payload["meta_json"] = np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8
        )
        d = os.path.dirname(os.path.abspath(self.path)) or "."
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz.tmp")
        os.close(fd)
        try:
            with open(tmp, "wb") as fh:
                np.savez(fh, **payload)
            os.replace(tmp, self.path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    def load(self) -> Optional[Tuple[GPIRTState, dict, Dict[str, np.ndarray]]]:
        if not self.exists():
            return None
        with np.load(self.path) as z:
            meta = json.loads(bytes(z["meta_json"]).decode())
            state = GPIRTState(
                **{k: jnp.asarray(z[f"state_{k}"]) for k in _STATE_FIELDS}
            )
            draws = {
                k[len("draws_"):]: z[k] for k in z.files if k.startswith("draws_")
            }
        return state, meta, draws


def run_chain_checkpointed(
    key: jax.Array,
    y: jnp.ndarray,
    theta_init,
    thresholds_init,
    consts: GPIRTConstants,
    config: GPIRTConfig,
    *,
    sample_iterations: int,
    burn_iterations: int,
    thin: int = 1,
    store_f: bool = False,
    store_fstar: bool = False,
    manager: CheckpointManager,
    checkpoint_every: int = 200,
) -> Dict[str, np.ndarray]:
    """Chunked, resumable chain with the same deterministic key schedule as
    ``run_chain`` (iteration i uses fold_in(k_run, i)).

    Returns host numpy draws with the same layouts as run_chain.
    """
    total = sample_iterations + burn_iterations
    k_init, k_run = jax.random.split(key)

    resumed = manager.load()
    if resumed is not None:
        state, meta, stored = resumed
        it = int(meta["iteration"])
        acc = {k: [row for row in v] for k, v in stored.items()}
    else:
        state = init_state(k_init, theta_init, thresholds_init, y, consts, config)
        it = 0
        acc = {}

    @jax.jit
    def chunk(state, start, length_dummy):
        del length_dummy
        def body(s, i):
            s, ll = gibbs_sweep(s, jax.random.fold_in(k_run, i), y, consts, config)
            out = {
                "theta": theta_from_indices(s.theta_idx, consts),
                "beta": s.beta,
                "threshold": s.thresholds,
                "ll": ll,
            }
            if store_f:
                out["f"] = s.f
            if store_fstar:
                ms = compute_mu_star(consts, s.beta)
                if config.constant_IRF:
                    ms = jnp.broadcast_to(ms[:1], ms.shape)
                out["fstar"] = s.fstar + ms
            return s, out

        its = start + jnp.arange(checkpoint_every)
        return jax.lax.scan(body, state, its)

    while it < total:
        k = min(checkpoint_every, total - it)
        state, outs = chunk(state, jnp.asarray(it), None)
        outs = jax.tree_util.tree_map(np.asarray, outs)
        for j in range(k):  # only the first k entries are within range
            ii = it + j
            if ii >= burn_iterations and ii % thin == 0:
                for name, arr in outs.items():
                    acc.setdefault(name, []).append(arr[j])
        it += k
        manager.save(
            state,
            {"iteration": it, "total": total},
            {name: np.stack(v) for name, v in acc.items() if v},
        )

    return {name: np.stack(v) for name, v in acc.items() if v}
