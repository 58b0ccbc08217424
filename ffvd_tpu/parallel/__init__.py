from ffvd_tpu.parallel.distributed import (initialize_multihost,
                                           multihost_mesh)
from ffvd_tpu.parallel.sharding import (MultiChainTrainer, make_mesh,
                                        params_pspec, shard_chain_state)

__all__ = ["MultiChainTrainer", "make_mesh", "params_pspec",
           "shard_chain_state", "initialize_multihost", "multihost_mesh"]
