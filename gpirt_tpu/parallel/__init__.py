"""Device-mesh parallelism: many-chain and item-sharded shard_map execution."""

from gpirt_tpu.parallel.chains import run_chains, run_chains_chunked, make_chain_mesh, chain_keys
from gpirt_tpu.parallel.items import (
    run_chains_itemsharded,
    make_item_mesh,
)

__all__ = [
    "run_chains",
    "run_chains_chunked",
    "make_chain_mesh",
    "chain_keys",
    "run_chains_itemsharded",
    "make_item_mesh",
]
