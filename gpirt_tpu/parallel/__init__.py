"""Device-mesh parallelism: many-chain shard_map execution."""

from gpirt_tpu.parallel.chains import run_chains, run_chains_chunked, make_chain_mesh, chain_keys

__all__ = ["run_chains", "run_chains_chunked", "make_chain_mesh", "chain_keys"]
