from gpt_tpu.models.tensor_gp import TensorGP, TensorGPParams, sample_core_indices
from gpt_tpu.models.fulltheta import FullThetaGP
from gpt_tpu.models.classification import TensorGPClassifier, FullThetaClassifier

__all__ = [
    "TensorGP",
    "TensorGPParams",
    "sample_core_indices",
    "FullThetaGP",
    "TensorGPClassifier",
    "FullThetaClassifier",
]
