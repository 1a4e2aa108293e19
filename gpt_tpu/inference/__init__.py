from gpt_tpu.inference.sgld import (
    SGLDConfig,
    make_sgld_step,
    run_sgld,
    run_sgld_chains,
)
from gpt_tpu.inference.gmc import GMCConfig, run_gmc

__all__ = [
    "SGLDConfig",
    "make_sgld_step",
    "run_sgld",
    "run_sgld_chains",
    "GMCConfig",
    "run_gmc",
]
