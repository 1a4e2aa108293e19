"""Synthetic-data generation from the tensor-GP prior.

Capability of ``MakeSynthData.jl:6-27``: draw ground-truth (w, U, I) from the
prior, evaluate f on random inputs, add Gaussian noise at several levels —
the posterior-recovery fixture for sampler correctness tests (SURVEY.md §4.4).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gpt_tpu.features import sample_tensor_rff, tensor_features, tensor_phi_scale
from gpt_tpu.models import TensorGP, TensorGPParams, sample_core_indices


class TensorSynthData(NamedTuple):
    X: jnp.ndarray
    phi: jnp.ndarray
    f: jnp.ndarray
    y: dict  # noise sd -> labels
    params: TensorGPParams
    I: jnp.ndarray
    model: TensorGP


def make_tensor_synth(
    key: jax.Array,
    *,
    N: int = 100,
    D: int = 5,
    n: int = 5,
    r: int = 2,
    Q: int = 32,
    length_scale: float = 1.0,
    sigma_RBF: float = 1.0,
    noise_sds=(0.1, 0.01, 0.001),
    signal_var: float = 0.01,
) -> TensorSynthData:
    kI, kp, kx, kf, kn = jax.random.split(key, 5)
    I = sample_core_indices(kI, r, D, Q)
    model = TensorGP(n=n, r=r, D=D, I=I, signal_var=signal_var)
    params = model.init_params(kp)
    X = jax.random.normal(kx, (N, D))
    rff = sample_tensor_rff(kf, n, D)
    phi = tensor_features(X, rff, length_scale, sigma_RBF, tensor_phi_scale(n, Q, D))
    f = model.predict(params, phi)
    noise = jax.random.normal(kn, (N,))
    y = {sd: f + sd * noise for sd in noise_sds}
    return TensorSynthData(X=X, phi=phi, f=f, y=y, params=params, I=I, model=model)
