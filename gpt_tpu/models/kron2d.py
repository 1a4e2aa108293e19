"""2-D Kronecker / matrix-factor GP models (L2).

Capability parity with the reference's California-housing and UK-temperature
model family (Stan sources):

- **Tensor2D** — ``f(x1, x2) = φU(x1)ᵀ U w Vᵀ φV(x2)`` with factor priors
  ``U, V ~ N(0, 1/r)`` per element and a full r×r core ``w ~ N(0, 1)``
  (``california/tensor2d.stan:14-36``, ``temperature_uk/tensor2d_kron.stan``).
- **MatrixTheta** — the full-rank special case ``f = φUᵀ Θ φV`` with
  ``Θ ~ N(0, 1)`` (``california/fullthetamatrix.stan:12-24``).
- **Kronecker indexed features** — for gridded data (UK temperature), the
  features are rows of the Cholesky/eigen factors of the per-axis Gram
  matrices, looked up by grid index (``temperature_uk/tensor2d_kron.stan:7-13``,
  ``generate_temp_rda.m:12-18``); both models accept either per-datum feature
  matrices or (factor, index) pairs via :func:`gather_features`.

These are the posterior targets for SGLD/GMC/NUTS parity runs against the
Stan gold standards (BASELINE.md California rows).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp


def gather_features(factor: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Indexed Kronecker features: row ``idx[i]`` of the factor matrix.

    ``factor`` is the (transposed) Cholesky/eigen factor of a per-axis Gram
    matrix (``phiU·phiUᵀ = K_u``); gathering rows reproduces the reference's
    ``psiU[indtrainU[i], :]`` lookups inside one XLA gather.
    """
    return factor[idx]


class Tensor2DParams(NamedTuple):
    U: jnp.ndarray  # (..., n1, r)
    V: jnp.ndarray  # (..., n2, r)
    w: jnp.ndarray  # (..., r, r)


@dataclass(frozen=True)
class Tensor2D:
    """Low-rank 2-D model ``f_i = (φU_i U) w (φV_i V)ᵀ``."""

    n1: int
    n2: int
    r: int
    signal_var: float
    sigma_uv: float | None = None  # default √(1/r) (tensor2d.stan:30-33)
    sigma_w: float = 1.0

    @property
    def _sigma_uv(self) -> float:
        import math

        return self.sigma_uv if self.sigma_uv is not None else math.sqrt(1.0 / self.r)

    def init_params(self, key: jax.Array, dtype=jnp.float32) -> Tensor2DParams:
        ku, kv, kw = jax.random.split(key, 3)
        s = self._sigma_uv
        return Tensor2DParams(
            U=s * jax.random.normal(ku, (self.n1, self.r), dtype),
            V=s * jax.random.normal(kv, (self.n2, self.r), dtype),
            w=self.sigma_w * jax.random.normal(kw, (self.r, self.r), dtype),
        )

    @property
    def manifolds(self) -> Tensor2DParams:
        return Tensor2DParams(U="euclidean", V="euclidean", w="euclidean")

    @property
    def event_ndims(self) -> Tensor2DParams:
        """Trailing parameter axes per leaf (leading axes = chains)."""
        return Tensor2DParams(U=2, V=2, w=2)

    def predict(self, params: Tensor2DParams, phi) -> jnp.ndarray:
        """``phi = (phiU (N, n1), phiV (N, n2))`` → ``(..., N)``."""
        phiU, phiV = phi
        psiU = jnp.einsum("in,...nr->...ir", phiU, params.U)
        psiV = jnp.einsum("in,...nr->...ir", phiV, params.V)
        return jnp.einsum("...ir,...rs,...is->...i", psiU, params.w, psiV)

    def log_lik(self, params, phi, y, weight=None) -> jnp.ndarray:
        sq = (y - self.predict(params, phi)) ** 2
        if weight is not None:
            sq = sq * weight
        return -jnp.sum(sq, axis=-1) / (2.0 * self.signal_var)

    def log_prior(self, params: Tensor2DParams) -> jnp.ndarray:
        s = self._sigma_uv
        return (
            -jnp.sum(params.U**2, axis=(-2, -1)) / (2 * s**2)
            - jnp.sum(params.V**2, axis=(-2, -1)) / (2 * s**2)
            - jnp.sum(params.w**2, axis=(-2, -1)) / (2 * self.sigma_w**2)
        )


class MatrixThetaParams(NamedTuple):
    theta: jnp.ndarray  # (..., n1, n2)


@dataclass(frozen=True)
class MatrixTheta:
    """Full-rank matrix model ``f_i = φU_i Θ φV_iᵀ`` with N(0,1) prior on Θ."""

    n1: int
    n2: int
    signal_var: float
    sigma_theta: float = 1.0

    def init_params(self, key: jax.Array, dtype=jnp.float32) -> MatrixThetaParams:
        return MatrixThetaParams(
            theta=self.sigma_theta
            * jax.random.normal(key, (self.n1, self.n2), dtype)
        )

    @property
    def manifolds(self) -> MatrixThetaParams:
        return MatrixThetaParams(theta="euclidean")

    @property
    def event_ndims(self) -> MatrixThetaParams:
        """Trailing parameter axes per leaf (leading axes = chains)."""
        return MatrixThetaParams(theta=2)

    def predict(self, params, phi) -> jnp.ndarray:
        phiU, phiV = phi
        return jnp.einsum("in,...nm,im->...i", phiU, params.theta, phiV)

    def log_lik(self, params, phi, y, weight=None) -> jnp.ndarray:
        sq = (y - self.predict(params, phi)) ** 2
        if weight is not None:
            sq = sq * weight
        return -jnp.sum(sq, axis=-1) / (2.0 * self.signal_var)

    def log_prior(self, params: MatrixThetaParams) -> jnp.ndarray:
        return -jnp.sum(params.theta**2, axis=(-2, -1)) / (2 * self.sigma_theta**2)
