"""Parafac conjugate posterior mean (L3).

Capability parity with ``TGP.Parafac`` (``TGP.jl:24-34``): the all-dimensions-
product (CP/Parafac) model ``f(x) = Σ_j μ_j Π_k φ^(k)_j(x_k)`` has per-feature
product regressors ``Ψ[j, i] = Π_k φ[i, k, j]``; with a Gaussian prior
``μ ~ N(0, σ_w²)`` the posterior mean is the ridge solution
``(ΨΨᵀ/σ² + I/σ_w²)⁻¹ Ψ y / σ²``.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def parafac_regressors(phi: jnp.ndarray) -> jnp.ndarray:
    """Ψ (N, n): product over dims of per-dim features (``TGP.jl:29``)."""
    return jnp.prod(phi, axis=1)


def parafac_posterior_mean(
    phi: jnp.ndarray,  # (N, D, n)
    y: jnp.ndarray,
    signal_var: float,
    sigma_w: float | None = None,
) -> jnp.ndarray:
    """Conjugate posterior mean of the Parafac weights.

    Default prior scale σ_w = √(n^{D-1}) (``TGP.jl:27``).
    """
    N, D, n = phi.shape
    if sigma_w is None:
        sigma_w = math.sqrt(float(n) ** (D - 1))
    Psi = parafac_regressors(phi)  # (N, n)
    prec = Psi.T @ Psi / signal_var + jnp.eye(n, dtype=phi.dtype) / sigma_w**2
    return jnp.linalg.solve(prec, Psi.T @ y / signal_var)


def parafac_predict(mu: jnp.ndarray, phi: jnp.ndarray) -> jnp.ndarray:
    return parafac_regressors(phi) @ mu
