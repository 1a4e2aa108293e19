from gpt_tpu.parallel.mesh import make_mesh, chain_sharding, replicated_sharding
from gpt_tpu.parallel.chains import (
    make_multichip_sgld_step,
    run_sharded_chains,
    cross_chain_moments,
)

__all__ = [
    "make_mesh",
    "chain_sharding",
    "replicated_sharding",
    "make_multichip_sgld_step",
    "run_sharded_chains",
    "cross_chain_moments",
]
