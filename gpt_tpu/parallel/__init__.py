from gpt_tpu.parallel.mesh import (
    make_mesh,
    make_feature_mesh,
    make_chain_feature_mesh,
    chain_sharding,
    replicated_sharding,
)
from gpt_tpu.parallel.chains import (
    make_multichip_sgld_step,
    run_sgld_megafused_sharded,
    run_sharded_chains,
    cross_chain_moments,
)
from gpt_tpu.parallel.tp import run_sgld_tp, run_sgld_tp_chains
from gpt_tpu.parallel.fleet import (
    run_chain_fleet,
    run_gibbs_fleet,
    run_gmc_fleet,
    run_manifold_nuts_fleet,
)
from gpt_tpu.parallel.distributed import (
    initialize_distributed,
    make_host_mesh,
    process_local_chains,
)

__all__ = [
    "run_sgld_megafused_sharded",
    "make_mesh",
    "make_feature_mesh",
    "make_chain_feature_mesh",
    "chain_sharding",
    "replicated_sharding",
    "make_multichip_sgld_step",
    "run_sharded_chains",
    "cross_chain_moments",
    "run_sgld_tp",
    "run_sgld_tp_chains",
    "run_chain_fleet",
    "run_gibbs_fleet",
    "run_gmc_fleet",
    "run_manifold_nuts_fleet",
    "initialize_distributed",
    "make_host_mesh",
    "process_local_chains",
]
