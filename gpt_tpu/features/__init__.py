from gpt_tpu.features.rff import (
    FullRFF,
    TensorRFF,
    full_features,
    full_features_paired,
    grad_full_features,
    sample_full_rff,
    sample_tensor_rff,
    tensor_features,
    tensor_features_paired,
    tensor_phi_scale,
)
from gpt_tpu.features.cf import CFHashing, sample_cf_hashing, cf_features, cf_features_full

__all__ = [
    "FullRFF",
    "TensorRFF",
    "full_features",
    "full_features_paired",
    "grad_full_features",
    "sample_full_rff",
    "sample_tensor_rff",
    "tensor_features",
    "tensor_features_paired",
    "tensor_phi_scale",
    "CFHashing",
    "sample_cf_hashing",
    "cf_features",
    "cf_features_full",
]
