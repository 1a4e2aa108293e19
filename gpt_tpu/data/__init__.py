from gpt_tpu.data.loaders import (
    REFERENCE_ROOT,
    RegressionSplit,
    load_power_plant,
    load_kin40k,
    load_synth10000,
    load_tensor_synth,
    load_segment,
    load_transfusion,
    load_movielens_100k,
    load_mauna,
    standardize_split,
)
from gpt_tpu.data.synth import make_synthetic_ml1m, make_tensor_synth

__all__ = [
    "REFERENCE_ROOT",
    "RegressionSplit",
    "load_power_plant",
    "load_kin40k",
    "load_synth10000",
    "load_tensor_synth",
    "load_segment",
    "load_transfusion",
    "load_movielens_100k",
    "load_mauna",
    "standardize_split",
    "make_tensor_synth",
    "make_synthetic_ml1m",
]
