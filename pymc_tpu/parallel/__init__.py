from .mesh import (chain_mesh, data_mesh, data_sharded, init_distributed,
                   shard_chains, sharded_sample_step)

__all__ = ["chain_mesh", "data_mesh", "data_sharded", "shard_chains",
           "sharded_sample_step", "init_distributed"]
