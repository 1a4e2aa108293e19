"""Full-theta (no-tensor) RFF-GP regression model (L2).

Bayesian linear regression in RFF space — the reference's ``GPNT`` family:
``f(x) = φ(x)ᵀθ`` with ``θ ~ N(0, σ_θ² I)`` (``GPT_SGLD.jl:806-847``).
This is the O(n) kernel approximation of an exact GP and the minimal
end-to-end workload (Power Plant, ``PowerPlantNoTensorExperiment.jl``).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp


class FullThetaParams(NamedTuple):
    theta: jnp.ndarray  # (..., n)


@dataclass(frozen=True)
class FullThetaGP:
    n: int
    signal_var: float
    sigma_theta: float = 1.0

    def init_params(self, key: jax.Array, dtype=jnp.float32) -> FullThetaParams:
        """θ ~ N(0, σ_θ²) (reference: ``GPT_SGLD.jl:814-815``)."""
        return FullThetaParams(
            theta=self.sigma_theta * jax.random.normal(key, (self.n,), dtype=dtype)
        )

    @property
    def manifolds(self) -> FullThetaParams:
        return FullThetaParams(theta="euclidean")

    @property
    def event_ndims(self) -> FullThetaParams:
        """Trailing parameter axes per leaf (leading axes = chains)."""
        return FullThetaParams(theta=1)

    def predict(self, params: FullThetaParams, phi: jnp.ndarray) -> jnp.ndarray:
        """``fhat = φ θ`` for ``phi (N, n)`` → ``(..., N)``."""
        return jnp.einsum("in,...n->...i", phi, params.theta)

    def log_lik(self, params: FullThetaParams, phi: jnp.ndarray, y: jnp.ndarray,
                weight: jnp.ndarray | None = None) -> jnp.ndarray:
        fhat = self.predict(params, phi)
        sq = (y - fhat) ** 2
        if weight is not None:
            sq = sq * weight
        return -jnp.sum(sq, axis=-1) / (2.0 * self.signal_var)

    def log_prior(self, params: FullThetaParams) -> jnp.ndarray:
        return -jnp.sum(params.theta**2, axis=-1) / (2.0 * self.sigma_theta**2)
