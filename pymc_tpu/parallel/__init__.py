from .mesh import chain_mesh, init_distributed, shard_chains, sharded_sample_step

__all__ = ["chain_mesh", "shard_chains", "sharded_sample_step",
           "init_distributed"]
