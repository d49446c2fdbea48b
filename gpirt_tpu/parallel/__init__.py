"""Device-mesh parallelism: many-chain shard_map execution."""

from gpirt_tpu.parallel.chains import run_chains, make_chain_mesh, chain_keys

__all__ = ["run_chains", "make_chain_mesh", "chain_keys"]
