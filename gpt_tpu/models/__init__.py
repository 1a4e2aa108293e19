from gpt_tpu.models.tensor_gp import TensorGP, TensorGPParams, sample_core_indices
from gpt_tpu.models.fulltheta import FullThetaGP
from gpt_tpu.models.classification import TensorGPClassifier, FullThetaClassifier
from gpt_tpu.models.kron2d import Tensor2D, MatrixTheta, gather_features
from gpt_tpu.models.exact_gp import ExactGP

__all__ = [
    "Tensor2D",
    "MatrixTheta",
    "gather_features",
    "ExactGP",
    "TensorGP",
    "TensorGPParams",
    "sample_core_indices",
    "FullThetaGP",
    "TensorGPClassifier",
    "FullThetaClassifier",
]
