"""Exact Gaussian-process oracle module (L2/L6).

Capability parity with the reference's two exact-GP libraries — the minimal
closure-based ``GaussianProcess.jl`` (GP type, posterior mean/cov, prior
sampling, log marginal) and the vendored GPML port ``GPkit.jl-master/src``
(covariances SEiso/SEard/Matérn-{1,3,5}/Periodic/RQiso/LIN with Sum/Prod
composition, exact inference, Gaussian likelihood, predictions, NLML with
gradients) — re-expressed as a small functional kernel algebra on top of
batched XLA linear algebra. Used as the correctness oracle for the RFF
approximations (``kin40kExperiment.jl:55-61``, ``DataRecords.txt:19``) and
for hyperparameter parity.

Kernels are closures ``k(X1, X2) -> Gram``; composition via :func:`k_sum` /
:func:`k_prod`. All math is differentiable, so NLML gradients come from
``jax.grad`` (replacing GPkit's hand-coded ``dnlZ``).
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

Kernel = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def _sqdist(X1, X2, ls):
    ls = jnp.broadcast_to(jnp.asarray(ls, X1.dtype), (X1.shape[-1],))
    A, B = X1 / ls, X2 / ls
    d = jnp.sum(A**2, -1)[:, None] + jnp.sum(B**2, -1)[None, :] - 2 * A @ B.T
    return jnp.maximum(d, 0.0)


def se_iso(length_scale, sigma_f) -> Kernel:
    """Squared-exponential, shared ℓ (GPkit ``CovSEiso``, ``covar.jl``)."""
    def k(X1, X2):
        return sigma_f**2 * jnp.exp(-0.5 * _sqdist(X1, X2, length_scale))
    return k


def se_ard(length_scales, sigma_f) -> Kernel:
    """Squared-exponential ARD (GPkit ``CovSEard``)."""
    def k(X1, X2):
        return sigma_f**2 * jnp.exp(-0.5 * _sqdist(X1, X2, length_scales))
    return k


def matern(length_scale, sigma_f, nu: int = 5) -> Kernel:
    """Matérn with ν = d/2, d ∈ {1, 3, 5} (GPkit ``CovMaterniso``)."""
    if nu not in (1, 3, 5):
        raise ValueError("nu must be 1, 3 or 5 (GPML convention: d in Materniso)")

    def k(X1, X2):
        r = jnp.sqrt(_sqdist(X1, X2, length_scale) + 1e-36)
        sr = jnp.sqrt(float(nu)) * r
        if nu == 1:
            poly = 1.0
        elif nu == 3:
            poly = 1.0 + sr
        else:
            poly = 1.0 + sr + sr**2 / 3.0
        return sigma_f**2 * poly * jnp.exp(-sr)
    return k


def periodic(length_scale, period, sigma_f) -> Kernel:
    """1-D periodic (GPkit ``CovPeriodic``): exp(−2 sin²(π r / p)/ℓ²)."""
    def k(X1, X2):
        r = jnp.abs(X1[:, None, :] - X2[None, :, :]).sum(-1)
        s = jnp.sin(jnp.pi * r / period) / length_scale
        return sigma_f**2 * jnp.exp(-2.0 * s**2)
    return k


def rq_iso(length_scale, sigma_f, alpha) -> Kernel:
    """Rational quadratic (GPkit ``CovRQiso``)."""
    def k(X1, X2):
        return sigma_f**2 * (1.0 + _sqdist(X1, X2, length_scale) / (2 * alpha)) ** (-alpha)
    return k


def linear(sigma_f=1.0) -> Kernel:
    """Dot-product kernel (GPkit ``CovLIN``)."""
    def k(X1, X2):
        return sigma_f**2 * (X1 @ X2.T)
    return k


def k_sum(*kernels: Kernel) -> Kernel:
    """Sum composite (GPkit ``CovSum``)."""
    def k(X1, X2):
        out = kernels[0](X1, X2)
        for kk in kernels[1:]:
            out = out + kk(X1, X2)
        return out
    return k


def k_prod(*kernels: Kernel) -> Kernel:
    """Product composite (GPkit ``CovProd``)."""
    def k(X1, X2):
        out = kernels[0](X1, X2)
        for kk in kernels[1:]:
            out = out * kk(X1, X2)
        return out
    return k


class GPPosterior(NamedTuple):
    """Cached exact-inference quantities (GPkit ``Post``: L, alpha, sW)."""

    L: jnp.ndarray  # Cholesky of K + σ²I
    alpha: jnp.ndarray  # (K + σ²I)⁻¹ (y − m)
    X: jnp.ndarray
    nlml: jnp.ndarray


class ExactGP(NamedTuple):
    """Exact-GP model: kernel + constant mean + Gaussian noise.

    The capability of ``GaussianProcess.GP``/``GPpost``/``GPlogmarginal`` and
    GPkit's ``GPmodel`` + ``infExact.doInf`` + ``gp_impl`` predictions.
    """

    kernel: Kernel
    noise_var: float
    mean: float = 0.0

    def fit(self, X: jnp.ndarray, y: jnp.ndarray, jitter: float = 0.0) -> GPPosterior:
        N = y.shape[0]
        K = self.kernel(X, X) + (self.noise_var + jitter) * jnp.eye(N, dtype=X.dtype)
        L = jnp.linalg.cholesky(K)
        alpha = jax.scipy.linalg.cho_solve((L, True), y - self.mean)
        nlml = (
            jnp.sum(jnp.log(jnp.diag(L)))
            + 0.5 * jnp.dot(y - self.mean, alpha)
            + 0.5 * N * jnp.log(2 * jnp.pi)
        )
        return GPPosterior(L=L, alpha=alpha, X=X, nlml=nlml)

    def predict(self, post: GPPosterior, Xs: jnp.ndarray, full_cov: bool = False):
        """Predictive mean and (co)variance of the latent f at ``Xs``."""
        Ks = self.kernel(post.X, Xs)  # (N, M)
        mu = self.mean + Ks.T @ post.alpha
        v = jax.scipy.linalg.solve_triangular(post.L, Ks, lower=True)
        if full_cov:
            cov = self.kernel(Xs, Xs) - v.T @ v
            return mu, cov
        kss = jnp.diagonal(self.kernel(Xs, Xs))
        return mu, kss - jnp.sum(v**2, axis=0)

    def predict_y(self, post: GPPosterior, Xs: jnp.ndarray):
        """Predictive mean/var of observations (adds noise variance)."""
        mu, var = self.predict(post, Xs)
        return mu, var + self.noise_var

    def sample_prior(self, key: jax.Array, X: jnp.ndarray, num: int = 1,
                     jitter: float = 1e-8) -> jnp.ndarray:
        """Prior draws via Cholesky + jitter (``GaussianProcess.jl:66-78``)."""
        K = self.kernel(X, X) + jitter * jnp.eye(X.shape[0], dtype=X.dtype)
        L = jnp.linalg.cholesky(K)
        z = jax.random.normal(key, (X.shape[0], num), dtype=X.dtype)
        return self.mean + (L @ z).T
