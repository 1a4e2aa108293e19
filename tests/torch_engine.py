"""Independent validation engine — pure torch/numpy, ZERO shared code with
gpt_tpu (no jax imports, different autodiff, different RNG, f64 numerics).

Role: the reference validates its posteriors against engines it didn't write
(CmdStan NUTS at ``StanFullTheta.jl:6-51`` / ``california/tensor2d.stan``,
Mamba NUTS at ``ImageExperiment.jl:223-283``). No external PPL ships in this
image, so this module provides the closest equivalent: every model's log
density and the RFF features re-derived *from the math definitions* in a
different framework, plus

- exact closed-form conjugate posteriors (numpy/f64) for the linear-Gaussian
  models (full-theta ``GPT_SGLD.jl:109-137``; matrix-theta
  ``california/fullthetamatrix.stan:12-24`` via the Kronecker vec identity),
- a dual-averaging HMC sampler on torch autograd for the non-Gaussian 2-D
  tensor model (``california/tensor2d.stan:19-36``).

A systematic bug shared across gpt_tpu's features/log-liks/samplers cannot
pass agreement with this module; ``tests/test_external_engine.py`` holds the
assertions.
"""
from __future__ import annotations

import math

import numpy as np
import torch

torch.set_default_dtype(torch.float64)


# ---------------------------------------------------------------------------
# Independent feature re-implementations (from the formulas, not the code)
# ---------------------------------------------------------------------------


def rff_full_features_np(X, Z, b, length_scale, sigma_RBF):
    """``φ[i,j] = σ_RBF √(2/n) cos(⟨x_i, z_j/ℓ⟩ + b_j)`` — the featureNotensor
    definition (``GPT_SGLD.jl:109-120``), written directly in numpy."""
    X = np.asarray(X, np.float64)
    Z = np.asarray(Z, np.float64)
    b = np.asarray(b, np.float64)
    n, D = Z.shape
    ls = np.broadcast_to(np.asarray(length_scale, np.float64), (D,))
    return sigma_RBF * math.sqrt(2.0 / n) * np.cos(X @ (Z / ls).T + b)


def rff_tensor_features_np(X, Z, b, length_scale, sigma_RBF, phi_scale, Q_unused=None):
    """Tensor RFF ``φ[i,k,j] = s·σ^{1/D}·√(2/n)·cos(x_ik z_jk/ℓ_k + b_jk)``
    (``GPT_SGLD.jl:71-84``) → (N, D, n)."""
    X = np.asarray(X, np.float64)
    Z = np.asarray(Z, np.float64)  # (n, D)
    b = np.asarray(b, np.float64)  # (n, D)
    n, D = Z.shape
    ls = np.broadcast_to(np.asarray(length_scale, np.float64), (D,))
    ang = X[:, :, None] * (Z.T / ls[:, None])[None] + b.T[None]  # (N, D, n)
    return phi_scale * sigma_RBF ** (1.0 / D) * math.sqrt(2.0 / n) * np.cos(ang)


# ---------------------------------------------------------------------------
# Exact conjugate posteriors (linear-Gaussian models) — numpy f64
# ---------------------------------------------------------------------------


def fulltheta_posterior(phi, y, signal_var, sigma_theta):
    """θ | y for f = φᵀθ, θ ~ N(0, σ_θ² I), y ~ N(f, σ² I) — exact.

    phi: (N, n) (batch-major). Returns (mean (n,), cov (n, n))."""
    phi = np.asarray(phi, np.float64)
    y = np.asarray(y, np.float64)
    n = phi.shape[1]
    A = phi.T @ phi / signal_var + np.eye(n) / sigma_theta**2
    cov = np.linalg.inv(A)
    mean = cov @ (phi.T @ y) / signal_var
    return mean, cov


def matrixtheta_posterior(phiU, phiV, y, signal_var, sigma_theta):
    """Θ | y for f_i = φU_i Θ φV_iᵀ (``california/fullthetamatrix.stan``).

    Linear in vec(Θ): f_i = (φV_i ⊗ φU_i)ᵀ vec(Θ) with column-major vec.
    Returns (mean (n1, n2), cov ((n1·n2), (n1·n2)) in column-major vec order).
    """
    phiU = np.asarray(phiU, np.float64)
    phiV = np.asarray(phiV, np.float64)
    N = phiU.shape[0]
    # design row i = kron(phiV_i, phiU_i) ⇔ column-major vec(Θ)
    design = (phiV[:, :, None] * phiU[:, None, :]).reshape(N, -1)
    mean_v, cov = fulltheta_posterior(design, y, signal_var, sigma_theta)
    n1, n2 = phiU.shape[1], phiV.shape[1]
    return mean_v.reshape(n2, n1).T, cov


def gaussian_predictive_moments(phi_test, mean, cov):
    """Predictive f* = φ*ᵀθ moments under θ ~ N(mean, cov) (noise-free f)."""
    phi_test = np.asarray(phi_test, np.float64)
    f_mean = phi_test @ mean
    f_var = np.einsum("in,nm,im->i", phi_test, cov, phi_test)
    return f_mean, f_var


# ---------------------------------------------------------------------------
# Torch log-densities (independent re-derivations)
# ---------------------------------------------------------------------------


def make_fulltheta_logprob(phi, y, signal_var, sigma_theta):
    phi_t = torch.as_tensor(np.asarray(phi, np.float64))
    y_t = torch.as_tensor(np.asarray(y, np.float64))

    def log_prob(theta):
        resid = y_t - phi_t @ theta
        return (
            -0.5 * (resid @ resid) / signal_var
            - 0.5 * (theta @ theta) / sigma_theta**2
        )

    return log_prob


def make_tensor2d_logprob(phiU, phiV, y, signal_var, r, sigma_uv, sigma_w=1.0):
    """Flat-vector log joint of the 2-D tensor model
    ``f_i = (φU_i U) w (φV_i V)ᵀ`` with N(0, σ_uv²) factor entries and
    N(0, σ_w²) core (``california/tensor2d.stan:19-36``). The flat layout is
    [vec(U row-major), vec(V row-major), vec(w row-major)]."""
    phiU_t = torch.as_tensor(np.asarray(phiU, np.float64))
    phiV_t = torch.as_tensor(np.asarray(phiV, np.float64))
    y_t = torch.as_tensor(np.asarray(y, np.float64))
    n1, n2 = phiU_t.shape[1], phiV_t.shape[1]

    def log_prob(theta):
        U = theta[: n1 * r].reshape(n1, r)
        V = theta[n1 * r : n1 * r + n2 * r].reshape(n2, r)
        w = theta[n1 * r + n2 * r :].reshape(r, r)
        psiU = phiU_t @ U  # (N, r)
        psiV = phiV_t @ V
        f = ((psiU @ w) * psiV).sum(dim=1)
        resid = y_t - f
        return (
            -0.5 * (resid @ resid) / signal_var
            - 0.5 * (U * U).sum() / sigma_uv**2
            - 0.5 * (V * V).sum() / sigma_uv**2
            - 0.5 * (w * w).sum() / sigma_w**2
        )

    return log_prob, (n1, n2, r)


def tensor2d_predict_np(theta, phiU, phiV, n1, n2, r):
    """Vectorised prediction for a (S, dim) stack of flat draws → (S, N)."""
    theta = np.asarray(theta, np.float64)
    U = theta[:, : n1 * r].reshape(-1, n1, r)
    V = theta[:, n1 * r : n1 * r + n2 * r].reshape(-1, n2, r)
    w = theta[:, n1 * r + n2 * r :].reshape(-1, r, r)
    psiU = np.einsum("in,snr->sir", np.asarray(phiU, np.float64), U)
    psiV = np.einsum("in,snr->sir", np.asarray(phiV, np.float64), V)
    return np.einsum("sir,srt,sit->si", psiU, w, psiV)


# ---------------------------------------------------------------------------
# Dual-averaging HMC on torch autograd
# ---------------------------------------------------------------------------


def torch_hmc(
    log_prob,
    theta0,
    *,
    num_warmup,
    num_samples,
    num_leapfrog=16,
    target_accept=0.8,
    init_step=0.1,
    seed=0,
):
    """Plain HMC with Stan-style dual-averaging warmup (Hoffman & Gelman 2014,
    Alg. 5) and jittered step counts. Returns (samples (S, dim), accept_rate).

    Everything — leapfrog gradients (torch.autograd), the Metropolis test,
    the RNG (torch.Generator) — is independent of jax and of gpt_tpu.
    """
    gen = torch.Generator().manual_seed(seed)
    theta = torch.as_tensor(np.asarray(theta0, np.float64)).clone()
    dim = theta.numel()

    def grad(q):
        q = q.detach().requires_grad_(True)
        lp = log_prob(q)
        (g,) = torch.autograd.grad(lp, q)
        return lp.detach(), g.detach()

    log_eps = math.log(init_step)
    mu = math.log(10.0 * init_step)
    log_eps_bar, h_bar = 0.0, 0.0
    gamma, t0, kappa = 0.05, 10.0, 0.75

    samples = torch.empty((num_samples, dim))
    n_accept = 0
    lp_cur, g_cur = grad(theta)
    for it in range(num_warmup + num_samples):
        eps = math.exp(log_eps if it < num_warmup else log_eps_bar)
        L = int(torch.randint(1, num_leapfrog + 1, (1,), generator=gen))
        p = torch.randn(dim, generator=gen)
        H0 = float(lp_cur) - 0.5 * float(p @ p)
        q, lp_q, g_q = theta.clone(), lp_cur, g_cur
        p = p + 0.5 * eps * g_q
        for step in range(L):
            q = q + eps * p
            lp_q, g_q = grad(q)
            p = p + (0.5 if step == L - 1 else 1.0) * eps * g_q
        H1 = float(lp_q) - 0.5 * float(p @ p)
        dH = H1 - H0
        alpha = min(1.0, math.exp(min(dH, 0.0))) if math.isfinite(dH) else 0.0
        if float(torch.rand(1, generator=gen)) < alpha:
            theta, lp_cur, g_cur = q, lp_q, g_q
            if it >= num_warmup:
                n_accept += 1
        if it < num_warmup:
            m = it + 1
            h_bar = (1 - 1 / (m + t0)) * h_bar + (target_accept - alpha) / (m + t0)
            log_eps = mu - math.sqrt(m) / gamma * h_bar
            w = m ** (-kappa)
            log_eps_bar = w * log_eps + (1 - w) * log_eps_bar
        else:
            samples[it - num_warmup] = theta
    return samples.numpy(), n_accept / max(num_samples, 1)
