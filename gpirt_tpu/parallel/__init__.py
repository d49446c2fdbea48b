"""Device-mesh parallelism: many-chain, item- and respondent-sharded
shard_map execution."""

from gpirt_tpu.parallel.chains import run_chains, run_chains_chunked, make_chain_mesh, chain_keys
from gpirt_tpu.parallel.items import (
    run_chains_itemsharded,
    make_item_mesh,
)
from gpirt_tpu.parallel.respondents import (
    run_chains_respondentsharded,
    make_respondent_mesh,
)

__all__ = [
    "run_chains",
    "run_chains_chunked",
    "make_chain_mesh",
    "chain_keys",
    "run_chains_itemsharded",
    "make_item_mesh",
    "run_chains_respondentsharded",
    "make_respondent_mesh",
]
