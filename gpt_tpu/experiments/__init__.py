from gpt_tpu.experiments import configs
from gpt_tpu.experiments.regression import (
    RegressionRun,
    run_fulltheta_regression,
    run_tensor_regression,
)

__all__ = [
    "configs",
    "RegressionRun",
    "run_fulltheta_regression",
    "run_tensor_regression",
]
