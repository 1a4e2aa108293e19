"""Classification experiment runners (L5).

Re-expresses the reference's classification drivers —
``ImageNoTensorExperiment.jl`` (UCI image segmentation, GPNT_SGLDclass, n=150,
eps=1e-3), ``ImageExperiment.jl`` (tensor classification + stochastic-EM) and
``BloodTransfusionExperiment.jl`` (binary, n=500) — as functions over the
shared sampler engine. Metrics match the reference: test error rate and mean
negative log predictive probability (``ImageNoTensorExperiment.jl:55-62``).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gpt_tpu.data.loaders import ClassificationSplit
from gpt_tpu.features import full_features, sample_full_rff, sample_tensor_rff, tensor_features, tensor_phi_scale
from gpt_tpu.inference import SGLDConfig, run_sgld
from gpt_tpu.models import FullThetaClassifier, TensorGPClassifier, sample_core_indices
from gpt_tpu.models.classification import FullThetaClassParams, TensorClassParams


class ClassificationRun(NamedTuple):
    error_rate: np.ndarray  # (maxepoch,) test error of per-epoch posterior sample
    mean_nlp: np.ndarray  # (maxepoch,) mean negative log predictive prob
    best_error: float
    avg_error: float  # error of the MC-averaged predictive over the run
    rejected: int


def _evaluate(probs_epochs: jnp.ndarray, y_test: jnp.ndarray, rejected) -> ClassificationRun:
    """probs_epochs: (E, Ntest, C) per-epoch predictive probabilities."""
    y = y_test.astype(jnp.int32)
    pred = jnp.argmax(probs_epochs, axis=-1)
    err = jnp.mean(pred != y[None, :], axis=-1)
    p_true = jnp.take_along_axis(probs_epochs, y[None, :, None], axis=-1)[..., 0]
    nlp = -jnp.mean(jnp.log(jnp.maximum(p_true, 1e-12)), axis=-1)
    avg_probs = jnp.mean(probs_epochs, axis=0)
    avg_err = float(jnp.mean(jnp.argmax(avg_probs, -1) != y))
    return ClassificationRun(
        error_rate=np.asarray(err),
        mean_nlp=np.asarray(nlp),
        best_error=float(err.min()),
        avg_error=avg_err,
        rejected=int(np.asarray(rejected)),
    )


def run_fulltheta_classification(
    split: ClassificationSplit,
    key: jax.Array,
    *,
    n: int = 150,
    eps_theta: float = 1e-3,
    length_scale=1.0,
    sigma_RBF: float = 1.0,
    sigma_theta: float = 1.0,
    m: int = 50,
    burnin: int = 0,
    maxepoch: int = 100,
    dtype=jnp.float32,
) -> ClassificationRun:
    """GPNT_SGLDclass workload (``ImageNoTensorExperiment.jl``)."""
    kf, kp, ks = jax.random.split(key, 3)
    D = split.X_train.shape[1]
    rff = sample_full_rff(kf, n, D, dtype=dtype)
    phi_tr = full_features(jnp.asarray(split.X_train, dtype), rff, length_scale, sigma_RBF)
    phi_te = full_features(jnp.asarray(split.X_test, dtype), rff, length_scale, sigma_RBF)
    y_tr = jnp.asarray(split.y_train)

    model = FullThetaClassifier(n=n, num_classes=split.num_classes, sigma_theta=sigma_theta)
    params0 = model.init_params(kp, dtype=dtype)
    config = SGLDConfig(eps=FullThetaClassParams(theta=eps_theta))
    collect = lambda p: model.predict_proba(p, phi_te)
    final, probs = run_sgld(
        model, params0, ks, phi_tr, y_tr,
        m=m, config=config, burnin=burnin, maxepoch=maxepoch, collect_fn=collect,
    )
    return _evaluate(probs, jnp.asarray(split.y_test), final.rejected)


def run_tensor_classification(
    split: ClassificationSplit,
    key: jax.Array,
    *,
    n: int = 5,
    r: int = 10,
    Q: int = 200,
    epsw: float = 1e-4,
    epsU: float = 1e-6,
    length_scale=1.0,
    sigma_RBF: float = 1.0,
    m: int = 50,
    burnin: int = 0,
    maxepoch: int = 100,
    stiefel: bool = True,
    dtype=jnp.float32,
) -> ClassificationRun:
    """GPTclassification workload (``ImageExperiment.jl``, n=5, r=10, Q=200).

    One w/U update per batch — the reference's accidental double update
    (``GPT_SGLD.jl:624-671``) is not reproduced.
    """
    if r > n:
        stiefel = False  # V_{n,r} is empty for r > n; Gaussian factors instead
    kI, kf, kp, ks = jax.random.split(key, 4)
    D = split.X_train.shape[1]
    I = sample_core_indices(kI, r, D, Q)
    rff = sample_tensor_rff(kf, n, D, dtype=dtype)
    scale = tensor_phi_scale(n, Q, D)
    phi_tr = tensor_features(jnp.asarray(split.X_train, dtype), rff, length_scale, sigma_RBF, scale)
    phi_te = tensor_features(jnp.asarray(split.X_test, dtype), rff, length_scale, sigma_RBF, scale)
    y_tr = jnp.asarray(split.y_train)

    model = TensorGPClassifier(
        n=n, r=r, D=D, num_classes=split.num_classes, I=I, stiefel=stiefel
    )
    params0 = model.init_params(kp, dtype=dtype)
    config = SGLDConfig(eps=TensorClassParams(w=epsw, U=epsU))
    collect = lambda p: model.predict_proba(p, phi_te)
    final, probs = run_sgld(
        model, params0, ks, phi_tr, y_tr,
        m=m, config=config, burnin=burnin, maxepoch=maxepoch, collect_fn=collect,
    )
    return _evaluate(probs, jnp.asarray(split.y_test), final.rejected)
