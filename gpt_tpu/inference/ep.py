"""Expectation propagation for binary GP classification (probit likelihood).

Capability target: the reference's ``GPkit.jl-master/src/infEP.jl`` (EP
inference, experimental) + ``likErf.jl`` (probit likelihood, incomplete).
The reference never finished this pair; here it is complete: parallel EP with
damping, the standard stable parameterisation of Rasmussen & Williams ch. 3.6
(B = I + S̃^½ K S̃^½), the EP marginal likelihood log Z_EP, and probit
predictive class probabilities.

TPU-first shape: instead of GPML's sequential per-site rank-1 updates (a
data-dependent O(N) Python loop per sweep), every site is moment-matched in
parallel from the current posterior marginals and the posterior is refreshed
with one batched Cholesky — each sweep is two MXU-friendly dense ops, and the
whole run is a ``lax.scan`` over sweeps. Damping keeps parallel EP stable.

Labels are ±1.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.stats import norm


class EPState(NamedTuple):
    nu: jnp.ndarray      # site natural mean parameters ν̃ (N,)
    tau: jnp.ndarray     # site precisions τ̃ (N,) ≥ 0
    mu: jnp.ndarray      # posterior marginal means (N,)
    sigma2: jnp.ndarray  # posterior marginal variances (N,)
    delta: jnp.ndarray   # max site-parameter change of the last sweep


class EPPosterior(NamedTuple):
    """Converged EP posterior + cached prediction quantities."""

    state: EPState
    L: jnp.ndarray        # chol(B), B = I + S̃^½ K S̃^½
    K: jnp.ndarray
    X: jnp.ndarray
    log_z: jnp.ndarray    # EP approximation of log p(y)
    sweeps: int


def _posterior_from_sites(K, nu, tau):
    """Stable (μ, diagΣ, L) given site parameters (R&W eq. 3.53-3.68)."""
    N = nu.shape[0]
    srt = jnp.sqrt(jnp.maximum(tau, 0.0))
    B = jnp.eye(N, dtype=K.dtype) + srt[:, None] * K * srt[None, :]
    L = jnp.linalg.cholesky(B)
    # V = L⁻¹ S̃^½ K ⇒ Σ = K − VᵀV
    V = jax.scipy.linalg.solve_triangular(L, srt[:, None] * K, lower=True)
    sigma2 = jnp.diagonal(K) - jnp.sum(V * V, axis=0)
    mu = K @ nu - V.T @ (V @ nu)
    return mu, sigma2, L


def _probit_moments(y, mu_cav, s2_cav):
    """Moments of Z⁻¹ Φ(y·f) N(f | μ₋, σ²₋) (R&W eq. 3.58)."""
    denom = jnp.sqrt(1.0 + s2_cav)
    z = y * mu_cav / denom
    # N(z)/Φ(z) computed in log space for tail stability
    log_phi = norm.logcdf(z)
    ratio = jnp.exp(norm.logpdf(z) - log_phi)
    mu_hat = mu_cav + y * s2_cav * ratio / denom
    s2_hat = s2_cav - s2_cav**2 * ratio * (z + ratio) / (1.0 + s2_cav)
    return mu_hat, jnp.maximum(s2_hat, 1e-10), log_phi, z


def ep_sweep(K, y, state: EPState, damping: float) -> EPState:
    """One parallel EP sweep: cavity → probit moment match → damped update."""
    tau_cav = 1.0 / jnp.maximum(state.sigma2, 1e-10) - state.tau
    nu_cav = state.mu / jnp.maximum(state.sigma2, 1e-10) - state.nu
    tau_cav = jnp.maximum(tau_cav, 1e-10)
    mu_cav = nu_cav / tau_cav
    s2_cav = 1.0 / tau_cav

    mu_hat, s2_hat, _, _ = _probit_moments(y, mu_cav, s2_cav)

    tau_new = jnp.maximum(1.0 / s2_hat - tau_cav, 0.0)
    nu_new = mu_hat / s2_hat - nu_cav

    tau_d = (1.0 - damping) * state.tau + damping * tau_new
    nu_d = (1.0 - damping) * state.nu + damping * nu_new
    delta = jnp.maximum(
        jnp.max(jnp.abs(tau_d - state.tau)), jnp.max(jnp.abs(nu_d - state.nu))
    )
    mu, sigma2, _ = _posterior_from_sites(K, nu_d, tau_d)
    return EPState(nu=nu_d, tau=tau_d, mu=mu, sigma2=sigma2, delta=delta)


def _ep_log_z(K, y, state: EPState, L) -> jnp.ndarray:
    """log Z_EP (R&W eq. 3.65, 3.73-3.74)."""
    tau_cav = jnp.maximum(1.0 / jnp.maximum(state.sigma2, 1e-10) - state.tau, 1e-10)
    nu_cav = state.mu / jnp.maximum(state.sigma2, 1e-10) - state.nu
    mu_cav = nu_cav / tau_cav
    s2_cav = 1.0 / tau_cav
    _, _, log_phi, _ = _probit_moments(y, mu_cav, s2_cav)

    # 0th/4th terms: ½ Σ log(1 + τ̃/τ₋) − Σ log L_ii
    t0 = 0.5 * jnp.sum(jnp.log1p(state.tau / tau_cav)) - jnp.sum(
        jnp.log(jnp.diagonal(L))
    )
    # quadratic terms (R&W 3.74): ½ ν̃ᵀ(K − K S̃^½ B⁻¹ S̃^½ K − T⁻¹)ν̃ with
    # T = diag(τ₋) ... assembled from the marginal form:
    srt = jnp.sqrt(jnp.maximum(state.tau, 0.0))
    V = jax.scipy.linalg.solve_triangular(L, srt[:, None] * K, lower=True)
    Sigma_nu = K @ state.nu - V.T @ (V @ state.nu)  # Σ ν̃
    t1 = 0.5 * jnp.dot(state.nu, Sigma_nu)
    t2 = 0.5 * jnp.sum(
        (tau_cav / (state.tau + tau_cav))
        * (state.tau * mu_cav**2 - 2.0 * state.nu * mu_cav - state.nu**2 / tau_cav)
    )
    return t0 + t1 + t2 + jnp.sum(log_phi)


def fit_ep(kernel, X: jnp.ndarray, y: jnp.ndarray, *, sweeps: int = 40,
           damping: float = 0.7, jitter: float = 1e-8) -> EPPosterior:
    """Run parallel EP to convergence. ``y`` in {−1, +1}.

    Returns the EP posterior with the log marginal ``log_z`` (differentiable
    wrt kernel hyperparameters through the whole fixed-point iteration, so
    ``jax.grad`` gives the EP evidence gradient GPML computes by hand).
    """
    N = y.shape[0]
    K = kernel(X, X) + jitter * jnp.eye(N, dtype=X.dtype)
    zeros = jnp.zeros((N,), K.dtype)
    state0 = EPState(
        nu=zeros, tau=zeros, mu=zeros, sigma2=jnp.diagonal(K),
        delta=jnp.asarray(jnp.inf, K.dtype),
    )

    def body(st, _):
        return ep_sweep(K, y, st, damping), st.delta

    state, _ = jax.lax.scan(body, state0, None, length=sweeps)
    _, _, L = _posterior_from_sites(K, state.nu, state.tau)
    return EPPosterior(
        state=state, L=L, K=K, X=X, log_z=_ep_log_z(K, y, state, L),
        sweeps=sweeps,
    )


def predict_ep(kernel, post: EPPosterior, Xs: jnp.ndarray):
    """Predictive latent mean/var and class probability P(y*=+1) (R&W 3.60-3.61)."""
    Ks = kernel(post.X, Xs)  # (N, M)
    srt = jnp.sqrt(jnp.maximum(post.state.tau, 0.0))
    # μ* = k*ᵀ (ν̃ − S̃^½ B⁻¹ S̃^½ K ν̃)
    z = jax.scipy.linalg.cho_solve(
        (post.L, True), srt * (post.K @ post.state.nu)
    )
    mu_star = Ks.T @ (post.state.nu - srt * z)
    v = jax.scipy.linalg.solve_triangular(post.L, srt[:, None] * Ks, lower=True)
    # self-covariances only — materialising the full (M, M) test-test Gram
    # just for its diagonal is O(M²) memory for large prediction batches
    kss = jax.vmap(lambda x: kernel(x[None, :], x[None, :])[0, 0])(Xs)
    var_star = jnp.maximum(kss - jnp.sum(v * v, axis=0), 1e-10)
    prob = norm.cdf(mu_star / jnp.sqrt(1.0 + var_star))
    return mu_star, var_star, prob
