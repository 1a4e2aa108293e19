"""Random-Fourier-feature families (L1).

Capability parity with the reference's feature layer (``GPT_SGLD.jl:71-177``
and the MATLAB twins ``SEard_RFF1.m``/``SEard_RFF2.m``): tensor (per-dimension)
RFF embeddings for the Tucker model, full-D embeddings for the no-tensor
(full-theta) model, in both cos+phase and paired sin/cos flavours, plus the
analytic hyperparameter gradients of the full-D features.

One canonical API replaces the reference's four incompatible historical
signatures (SURVEY.md §2.1): spectral samples are explicit NamedTuples drawn
once from a PRNG key, and every feature function is a pure, differentiable map
``(X, weights, hyperparams) → φ``.

TPU-first layout: features are **batch-major** — tensor features are
``(N, D, n)`` and full features ``(N, n)`` (the reference stores ``(n, D, N)``
/ ``(n, N)``). The trailing feature axis n maps onto TPU lanes, and the hot
contractions (``phi @ U``, ``phi.T @ theta``) become large MXU matmuls over
the batch axis.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class TensorRFF(NamedTuple):
    """Spectral sample for the tensor (per-dimension) RFF embedding.

    ``Z[j, k] ~ N(0, 1)`` frequency for feature j of input dimension k;
    ``b[j, k] ~ U[0, 2π)`` phase. Reference convention: ``GPT_SGLD.jl:70-84``.
    """

    Z: jnp.ndarray  # (n, D)
    b: jnp.ndarray  # (n, D)


class FullRFF(NamedTuple):
    """Spectral sample for the full-D (no-tensor) RFF embedding.

    ``Z[j, :] ~ N(0, I_D)``, ``b[j] ~ U[0, 2π)``. Reference convention:
    ``GPT_SGLD.jl:107-120``.
    """

    Z: jnp.ndarray  # (n, D)
    b: jnp.ndarray  # (n,)


def sample_tensor_rff(key: jax.Array, n: int, D: int, dtype=jnp.float32) -> TensorRFF:
    kz, kb = jax.random.split(key)
    return TensorRFF(
        Z=jax.random.normal(kz, (n, D), dtype=dtype),
        b=2 * jnp.pi * jax.random.uniform(kb, (n, D), dtype=dtype),
    )


def sample_full_rff(key: jax.Array, n: int, D: int, dtype=jnp.float32) -> FullRFF:
    kz, kb = jax.random.split(key)
    return FullRFF(
        Z=jax.random.normal(kz, (n, D), dtype=dtype),
        b=2 * jnp.pi * jax.random.uniform(kb, (n,), dtype=dtype),
    )


def tensor_phi_scale(n: int, Q: int, D: int) -> float:
    """Default tensor feature scale ``sqrt(n / Q^(1/D))``.

    With this scale and the sparse-core prior, prior draws of the tensor model
    match the target kernel's marginal variance (reference:
    ``GPT_SGLD.jl:306``, comment at ``GPT_SGLD.jl:347``).
    """
    return float(jnp.sqrt(n / (Q ** (1.0 / D))))


def tensor_features(
    X: jnp.ndarray,
    rff: TensorRFF,
    length_scale,
    sigma_RBF,
    phi_scale,
) -> jnp.ndarray:
    """Per-dimension RFF embedding for the Tucker tensor model → ``(N, D, n)``.

    ``φ[i, k, j] = s · cos(X[i,k] · Z[j,k]/ℓ_k + b[j,k])`` with
    ``s = phi_scale · σ_RBF^{1/D} · sqrt(2/n)``
    (reference: ``feature``, ``GPT_SGLD.jl:71-84``).
    """
    n, D = rff.Z.shape
    ls = jnp.broadcast_to(jnp.asarray(length_scale, X.dtype), (D,))
    Zt = rff.Z / ls[None, :]  # (n, D)
    angles = X[:, :, None] * Zt.T[None, :, :] + rff.b.T[None, :, :]  # (N, D, n)
    scale = phi_scale * jnp.asarray(sigma_RBF, X.dtype) ** (1.0 / D) * jnp.sqrt(2.0 / n)
    return scale * jnp.cos(angles)


def tensor_features_paired(
    X: jnp.ndarray,
    Z: jnp.ndarray,
    length_scale,
    sigma_RBF,
    phi_scale,
) -> jnp.ndarray:
    """Paired sin/cos tensor embedding (no phases) → ``(N, D, 2·half_n)``.

    ``φ[i, k, 2j] = sin(X[i,k]·Z[j,k]/ℓ_k)``, ``φ[i, k, 2j+1] = cos(·)``,
    scaled by ``phi_scale · σ_RBF^{1/D} / sqrt(half_n)``
    (reference: ``feature2``, ``GPT_SGLD.jl:86-105``).
    """
    half_n, D = Z.shape
    ls = jnp.broadcast_to(jnp.asarray(length_scale, X.dtype), (D,))
    Zt = Z / ls[None, :]
    angles = X[:, :, None] * Zt.T[None, :, :]  # (N, D, half_n)
    sincos = jnp.stack([jnp.sin(angles), jnp.cos(angles)], axis=-1)  # (N, D, half_n, 2)
    phi = sincos.reshape(*angles.shape[:-1], 2 * half_n)
    scale = phi_scale * jnp.asarray(sigma_RBF, X.dtype) ** (1.0 / D) / jnp.sqrt(float(half_n))
    return scale * phi


def full_features(
    X: jnp.ndarray,
    rff: FullRFF,
    length_scale,
    sigma_RBF,
) -> jnp.ndarray:
    """Full-D RFF embedding of the SE/ARD kernel → ``(N, n)``.

    ``φ[i, j] = σ_RBF · sqrt(2/n) · cos(⟨x_i, z_j/ℓ⟩ + b_j)``
    (reference: ``featureNotensor``, ``GPT_SGLD.jl:107-120``). Differentiable
    in ``length_scale`` and ``sigma_RBF`` for hyperparameter learning.
    """
    n, D = rff.Z.shape
    ls = jnp.broadcast_to(jnp.asarray(length_scale, X.dtype), (D,))
    angles = X @ (rff.Z / ls[None, :]).T + rff.b[None, :]  # (N, n)
    return jnp.asarray(sigma_RBF, X.dtype) * jnp.sqrt(2.0 / n) * jnp.cos(angles)


def full_features_paired(
    X: jnp.ndarray,
    Z: jnp.ndarray,
    length_scale,
    sigma_RBF,
) -> jnp.ndarray:
    """Paired sin/cos full-D embedding → ``(N, 2·half_n)``.

    Reference: ``featureNotensor2``, ``GPT_SGLD.jl:122-137``.
    """
    half_n, D = Z.shape
    ls = jnp.broadcast_to(jnp.asarray(length_scale, X.dtype), (D,))
    angles = X @ (Z / ls[None, :]).T  # (N, half_n)
    sincos = jnp.stack([jnp.sin(angles), jnp.cos(angles)], axis=-1)
    phi = sincos.reshape(X.shape[0], 2 * half_n)
    return jnp.asarray(sigma_RBF, X.dtype) * phi / jnp.sqrt(float(half_n))


def grad_full_features(
    X: jnp.ndarray,
    rff: FullRFF,
    length_scale,
    sigma_RBF,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Analytic (∂φ/∂ℓ, ∂φ/∂σ_RBF) of :func:`full_features`.

    Capability of ``gradfeatureNotensor`` (``GPT_SGLD.jl:139-177``), both the
    scalar-ℓ and ARD-vector-ℓ methods; kept as an explicit function for parity
    tests against ``jax.jacfwd`` — samplers use autodiff instead. Returns
    ``d_ell`` of shape ``(N, n, D)`` (scalar ℓ broadcasts: sum over the last
    axis reproduces the reference's scalar derivative) and ``d_sigma`` of
    shape ``(N, n)``.
    """
    n, D = rff.Z.shape
    ls = jnp.broadcast_to(jnp.asarray(length_scale, X.dtype), (D,))
    Zt = rff.Z / ls[None, :]
    angles = X @ Zt.T + rff.b[None, :]  # (N, n)
    phisin = jnp.asarray(sigma_RBF, X.dtype) * jnp.sqrt(2.0 / n) * jnp.sin(angles)
    # ∂angle/∂ℓ_k = −X[i,k]·Z[j,k]/ℓ_k², so ∂φ/∂ℓ_k = phisin · X[i,k]·Zt[j,k]/ℓ_k
    d_ell = phisin[:, :, None] * (X[:, None, :] * Zt[None, :, :]) / ls[None, None, :]
    d_sigma = jnp.sqrt(2.0 / n) * jnp.cos(angles)
    return d_ell, d_sigma
