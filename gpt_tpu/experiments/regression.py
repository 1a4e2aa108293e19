"""Regression experiment runners (L5).

Re-expresses the reference's driver scripts (``PowerPlantNoTensorExperiment.jl``,
``kin40kExperiment.jl``, ``SynthDataExperiment.jl``) as functions: build
features, run the sampler with a streamed test-prediction collector (epoch-end
thinning — what the reference's evaluation loops actually consume), report
de-normalised per-epoch test RMSE and MC-averaged-prediction RMSE.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gpt_tpu.data.loaders import RegressionSplit
from gpt_tpu.experiments.configs import FullThetaPreset, TensorPreset
from gpt_tpu.features import (
    full_features,
    sample_full_rff,
    sample_tensor_rff,
    tensor_features,
    tensor_phi_scale,
)
from gpt_tpu.inference import SGLDConfig, run_sgld
from gpt_tpu.models import FullThetaGP, TensorGP, sample_core_indices
from gpt_tpu.models.fulltheta import FullThetaParams
from gpt_tpu.models.tensor_gp import TensorGPParams


class RegressionRun(NamedTuple):
    """Per-epoch streamed evaluation of one training run.

    ``test_rmse[e]`` — de-normalised test RMSE of the epoch-e sample
    (reference: ``PowerPlantNoTensorExperiment.jl:51-59``);
    ``avg_pred_rmse`` — RMSE of the prediction averaged over the preset's
    window (``:62-63`` / ``kin40kExperiment.jl:78-87``);
    ``rejected`` — NaN-rejected manifold transports (0 in healthy runs).
    """

    test_rmse: np.ndarray  # (maxepoch,) or (chains, maxepoch)
    avg_pred_rmse: float | np.ndarray
    final_params: object
    rejected: int | np.ndarray


def run_fulltheta_regression(
    split: RegressionSplit,
    preset: FullThetaPreset,
    key: jax.Array,
    dtype=jnp.float32,
) -> RegressionRun:
    """The minimal end-to-end slice: no-tensor SGLD on a regression split."""
    kf, kp, ks = jax.random.split(key, 3)
    D = split.X_train.shape[1]
    rff = sample_full_rff(kf, preset.n, D, dtype=dtype)
    phi_train = full_features(
        jnp.asarray(split.X_train, dtype), rff, preset.length_scale, preset.sigma_RBF
    )
    phi_test = full_features(
        jnp.asarray(split.X_test, dtype), rff, preset.length_scale, preset.sigma_RBF
    )
    y_train = jnp.asarray(split.y_train, dtype)

    model = FullThetaGP(n=preset.n, signal_var=preset.signal_var,
                        sigma_theta=preset.sigma_theta)
    params0 = model.init_params(kp, dtype=dtype)
    config = SGLDConfig(eps=FullThetaParams(theta=preset.eps_theta), decay=preset.decay)

    collect = lambda p: model.predict(p, phi_test)
    final, fhat_test = run_sgld(
        model, params0, ks, phi_train, y_train,
        m=preset.m, config=config, burnin=preset.burnin, maxepoch=preset.maxepoch,
        collect_fn=collect,
    )
    return _evaluate(fhat_test, split,
                     window=slice(preset.avg_start - 1, preset.maxepoch),
                     final=final)


def run_tensor_regression(
    split: RegressionSplit,
    preset: TensorPreset,
    key: jax.Array,
    *,
    stiefel: bool = True,
    transport: str = "geodesic",
    langevin: bool = True,
    dtype=jnp.float32,
) -> RegressionRun:
    """Tensor-GP SGLD/SGLDERM on a regression split (``kin40kExperiment.jl``)."""
    kI, kf, kp, ks = jax.random.split(key, 4)
    D = split.X_train.shape[1]
    I = sample_core_indices(kI, preset.r, D, preset.Q)
    rff = sample_tensor_rff(kf, preset.n, D, dtype=dtype)
    scale = tensor_phi_scale(preset.n, preset.Q, D)
    phi_train = tensor_features(
        jnp.asarray(split.X_train, dtype), rff,
        jnp.asarray(preset.length_scale, dtype), preset.sigma_RBF, scale,
    )
    phi_test = tensor_features(
        jnp.asarray(split.X_test, dtype), rff,
        jnp.asarray(preset.length_scale, dtype), preset.sigma_RBF, scale,
    )
    y_train = jnp.asarray(split.y_train, dtype)

    model = TensorGP(n=preset.n, r=preset.r, D=D, I=I,
                     signal_var=preset.signal_var, stiefel=stiefel)
    params0 = model.init_params(kp, dtype=dtype)
    config = SGLDConfig(
        eps=TensorGPParams(w=preset.epsw, U=preset.epsU),
        langevin=langevin, transport=transport,
    )

    collect = lambda p: model.predict(p, phi_test)
    final, fhat_test = run_sgld(
        model, params0, ks, phi_train, y_train,
        m=preset.m, config=config, burnin=preset.burnin, maxepoch=preset.maxepoch,
        collect_fn=collect,
    )
    window = slice(max(0, preset.maxepoch - preset.avg_last), preset.maxepoch)
    return _evaluate(fhat_test, split, window=window, final=final)


def _evaluate(fhat_test: jnp.ndarray, split: RegressionSplit, *, window, final) -> RegressionRun:
    """De-normalised per-epoch and window-averaged-prediction test RMSE."""
    y_test = jnp.asarray(split.y_test, fhat_test.dtype)
    err = fhat_test - y_test  # (..., E, Ntest) - broadcast over chains
    per_epoch = split.y_std * jnp.sqrt(jnp.mean(err**2, axis=-1))
    mean_pred = jnp.mean(fhat_test[..., window, :], axis=-2)
    avg_rmse = split.y_std * jnp.sqrt(jnp.mean((mean_pred - y_test) ** 2, axis=-1))
    return RegressionRun(
        test_rmse=np.asarray(per_epoch),
        avg_pred_rmse=np.asarray(avg_rmse),
        final_params=final.params,
        rejected=np.asarray(final.rejected),
    )
