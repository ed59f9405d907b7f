from .mesh import chain_mesh, shard_chains, sharded_sample_step

__all__ = ["chain_mesh", "shard_chains", "sharded_sample_step"]
