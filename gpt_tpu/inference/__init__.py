from gpt_tpu.inference.sgld import (
    SGLDConfig,
    make_sgld_step,
    run_sgld,
    run_sgld_chains,
)
from gpt_tpu.inference.gmc import GMCConfig, run_gmc
from gpt_tpu.inference.gibbs import GibbsConfig, gibbs_sweep, run_gibbs, init_gibbs_params
from gpt_tpu.inference.hyper import (
    StochasticEMConfig,
    gp_nlml,
    optimize_hyperparams,
    rff_nlml,
    se_ard_kernel,
    stochastic_em,
)

__all__ = [
    "GibbsConfig",
    "gibbs_sweep",
    "run_gibbs",
    "init_gibbs_params",
    "StochasticEMConfig",
    "gp_nlml",
    "optimize_hyperparams",
    "rff_nlml",
    "se_ard_kernel",
    "stochastic_em",
    "SGLDConfig",
    "make_sgld_step",
    "run_sgld",
    "run_sgld_chains",
    "GMCConfig",
    "run_gmc",
]
