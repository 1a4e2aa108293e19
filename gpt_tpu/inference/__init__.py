from gpt_tpu.inference.sgld import (
    SGLDConfig,
    collect_nothing,
    make_sgld_step,
    run_sgld,
    run_sgld_chains,
    run_sgld_chains_fused,
    run_sgld_megafused,
)
from gpt_tpu.inference.gmc import GMCConfig, run_gmc
from gpt_tpu.inference.gibbs import GibbsConfig, gibbs_sweep, run_gibbs, init_gibbs_params
from gpt_tpu.inference.cf_gibbs import (
    CFGibbsConfig,
    cf_gibbs_sweep,
    rotated_w_init,
    run_cf_gibbs,
)
from gpt_tpu.inference.cf_sgld import run_cf_sgld_thresh, inclusion_probabilities
from gpt_tpu.inference.ep import EPPosterior, EPState, fit_ep, predict_ep
from gpt_tpu.inference.vi import VIConfig, VIState, init_vi, run_vi, vi_step
from gpt_tpu.inference.hmc import HMCConfig, run_adaptive_hmc
from gpt_tpu.inference.nuts import NUTSConfig, run_nuts
from gpt_tpu.inference.parafac import parafac_posterior_mean, parafac_predict
from gpt_tpu.inference.hyper import (
    StochasticEMConfig,
    gp_nlml,
    optimize_hyperparams,
    optimize_hyperparams_restarts,
    rff_nlml,
    se_ard_kernel,
    stochastic_em,
)

__all__ = [
    "run_sgld_megafused",
    "collect_nothing",
    "CFGibbsConfig",
    "cf_gibbs_sweep",
    "rotated_w_init",
    "run_cf_gibbs",
    "run_cf_sgld_thresh",
    "inclusion_probabilities",
    "VIConfig",
    "VIState",
    "init_vi",
    "run_vi",
    "vi_step",
    "HMCConfig",
    "run_adaptive_hmc",
    "parafac_posterior_mean",
    "parafac_predict",
    "GibbsConfig",
    "gibbs_sweep",
    "run_gibbs",
    "init_gibbs_params",
    "StochasticEMConfig",
    "gp_nlml",
    "NUTSConfig",
    "run_nuts",
    "optimize_hyperparams",
    "optimize_hyperparams_restarts",
    "rff_nlml",
    "se_ard_kernel",
    "stochastic_em",
    "SGLDConfig",
    "make_sgld_step",
    "run_sgld",
    "run_sgld_chains",
    "run_sgld_chains_fused",
    "fit_ep",
    "predict_ep",
    "EPPosterior",
    "EPState",
    "GMCConfig",
    "run_gmc",
]
