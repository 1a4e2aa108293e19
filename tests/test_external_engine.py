"""Independent-engine parity (VERDICT round-1 item #3; reference L6).

The reference validates posteriors with engines it did not write (Stan NUTS:
``StanFullTheta.jl:6-51``, ``california/tensor2d.stan``; Mamba NUTS:
``ImageExperiment.jl:223-283``). These tests play that role for gpt_tpu using
``tests/torch_engine.py`` — exact closed-form conjugate posteriors (numpy f64)
and a torch-autograd HMC sharing zero code, autodiff, or RNG with the JAX
framework. A systematic bug in gpt_tpu's features, log-densities, or samplers
fails these, because the comparison side re-derives everything from the math.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests import torch_engine as eng

from gpt_tpu.features import (
    FullRFF,
    TensorRFF,
    full_features,
    tensor_features,
    tensor_phi_scale,
)
from gpt_tpu.inference.hmc import HMCConfig, run_adaptive_hmc
from gpt_tpu.models.fulltheta import FullThetaGP, FullThetaParams
from gpt_tpu.models.kron2d import Tensor2D, Tensor2DParams


@pytest.fixture(scope="module")
def key():
    return jax.random.PRNGKey(7)


# ---------------------------------------------------------------------------
# Features: independent numpy re-derivation must match the JAX implementation
# ---------------------------------------------------------------------------


def test_full_features_match_independent_numpy(key):
    kx, kz, kb = jax.random.split(key, 3)
    X = jax.random.normal(kx, (40, 3))
    Z = jax.random.normal(kz, (25, 3))
    b = 2 * jnp.pi * jax.random.uniform(kb, (25,))
    ours = full_features(X, FullRFF(Z=Z, b=b), jnp.array([1.1, 0.7, 2.0]), 1.3)
    theirs = eng.rff_full_features_np(
        np.asarray(X), np.asarray(Z), np.asarray(b), np.array([1.1, 0.7, 2.0]), 1.3
    )
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-5, atol=1e-5)


def test_tensor_features_match_independent_numpy(key):
    kx, kz, kb = jax.random.split(key, 3)
    n, D, Q = 15, 4, 20
    X = jax.random.normal(kx, (30, D))
    Z = jax.random.normal(kz, (n, D))
    b = 2 * jnp.pi * jax.random.uniform(kb, (n, D))
    s = tensor_phi_scale(n, Q, D)
    ours = tensor_features(X, TensorRFF(Z=Z, b=b), 0.9, 1.2, s)
    theirs = eng.rff_tensor_features_np(
        np.asarray(X), np.asarray(Z), np.asarray(b), 0.9, 1.2, s
    )
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# Full-theta: our HMC vs the EXACT closed-form Gaussian posterior
# ---------------------------------------------------------------------------


def test_inhouse_hmc_matches_exact_fulltheta_posterior(key):
    """The StanFullTheta.jl capability: the full-theta posterior from our
    adaptive HMC must match the exact conjugate posterior (an oracle no
    in-house bug can corrupt) in mean and marginal sd."""
    kx, kz, kb, ky, kp, kr = jax.random.split(key, 6)
    N, n, D = 200, 16, 3
    X = jax.random.normal(kx, (N, D))
    Z = jax.random.normal(kz, (n, D))
    b = 2 * jnp.pi * jax.random.uniform(kb, (n,))
    phi = full_features(X, FullRFF(Z=Z, b=b), 1.0, 1.0)
    theta_true = jax.random.normal(ky, (n,))
    y = phi @ theta_true + 0.3 * jax.random.normal(kr, (N,))

    signal_var, sigma_theta = 0.09, 1.0
    model = FullThetaGP(n=n, signal_var=signal_var, sigma_theta=sigma_theta)

    def log_prob(params):
        return model.log_lik(params, phi, y) + model.log_prior(params)

    samples, accept, _ = run_adaptive_hmc(
        log_prob,
        FullThetaParams(theta=jnp.zeros((n,))),
        kp,
        num_warmup=500,
        num_samples=2500,
        config=HMCConfig(num_leapfrog=24),
    )
    draws = np.asarray(samples.theta)  # (S, n)
    mean_exact, cov_exact = eng.fulltheta_posterior(
        np.asarray(phi), np.asarray(y), signal_var, sigma_theta
    )
    sd_exact = np.sqrt(np.diag(cov_exact))
    # MC error of a posterior mean ≈ sd/√ESS; bound generously at 6·sd/√(S/5)
    tol = 6.0 * sd_exact / np.sqrt(len(draws) / 5)
    assert float(np.mean(accept)) > 0.5
    np.testing.assert_array_less(np.abs(draws.mean(0) - mean_exact), tol)
    np.testing.assert_allclose(draws.std(0), sd_exact, rtol=0.25)


def test_torch_hmc_matches_exact_fulltheta_posterior(key):
    """Engine cross-check: the independent torch HMC recovers the same exact
    posterior — so both engines are validated against the oracle AND against
    each other through it."""
    kx, kz, kb, kr = jax.random.split(key, 4)
    N, n, D = 120, 8, 2
    X = np.asarray(jax.random.normal(kx, (N, D)), np.float64)
    Z = np.asarray(jax.random.normal(kz, (n, D)), np.float64)
    b = np.asarray(2 * jnp.pi * jax.random.uniform(kb, (n,)), np.float64)
    phi = eng.rff_full_features_np(X, Z, b, 1.0, 1.0)
    rng = np.random.default_rng(3)
    y = phi @ rng.normal(size=n) + 0.3 * rng.normal(size=N)

    mean_exact, cov_exact = eng.fulltheta_posterior(phi, y, 0.09, 1.0)
    lp = eng.make_fulltheta_logprob(phi, y, 0.09, 1.0)
    draws, accept = eng.torch_hmc(
        lp, np.zeros(n), num_warmup=400, num_samples=2000, seed=11
    )
    sd_exact = np.sqrt(np.diag(cov_exact))
    tol = 6.0 * sd_exact / np.sqrt(len(draws) / 5)
    assert accept > 0.5
    np.testing.assert_array_less(np.abs(draws.mean(0) - mean_exact), tol)
    np.testing.assert_allclose(draws.std(0), sd_exact, rtol=0.25)


# ---------------------------------------------------------------------------
# 2-D tensor model (california/tensor2d.stan): ours vs torch HMC, in f-space
# ---------------------------------------------------------------------------


def test_tensor2d_posterior_predictive_matches_torch_engine(key):
    """The non-Gaussian target. Parameters are non-identifiable (sign/rotation
    symmetry), so agreement is asserted in function space: posterior
    predictive mean and sd of f at every training point, our adaptive HMC vs
    the torch engine, within combined MC error."""
    kx1, kx2, kz1, kz2, kb1, kb2, kp, kr, kh = jax.random.split(key, 9)
    N, n1, n2, r = 60, 6, 6, 2
    X1 = jax.random.normal(kx1, (N, 1))
    X2 = jax.random.normal(kx2, (N, 1))
    phiU = full_features(
        X1, FullRFF(Z=jax.random.normal(kz1, (n1, 1)),
                    b=2 * jnp.pi * jax.random.uniform(kb1, (n1,))), 1.0, 1.0
    )
    phiV = full_features(
        X2, FullRFF(Z=jax.random.normal(kz2, (n2, 1)),
                    b=2 * jnp.pi * jax.random.uniform(kb2, (n2,))), 1.0, 1.0
    )
    signal_var = 0.04
    model = Tensor2D(n1=n1, n2=n2, r=r, signal_var=signal_var)
    true_params = model.init_params(kr)
    f_true = model.predict(true_params, (phiU, phiV))
    y = f_true + jnp.sqrt(signal_var) * jax.random.normal(kp, (N,))

    # ours: 2 vmapped adaptive-HMC chains
    def log_prob(params):
        return model.log_lik(params, (phiU, phiV), y) + model.log_prior(params)

    def one_chain(ck):
        ki, ks = jax.random.split(ck)
        p0 = model.init_params(ki)
        samples, accept, _ = run_adaptive_hmc(
            log_prob, p0, ks, num_warmup=600, num_samples=2500,
            config=HMCConfig(num_leapfrog=32),
            collect_fn=lambda p: model.predict(p, (phiU, phiV)),
        )
        return samples, accept

    f_draws, accepts = jax.vmap(one_chain)(jax.random.split(kh, 2))
    f_ours = np.asarray(f_draws).reshape(-1, N)
    assert float(np.mean(np.asarray(accepts))) > 0.5

    # theirs: 2 torch-HMC chains from independent inits
    lp, (tn1, tn2, tr) = eng.make_tensor2d_logprob(
        np.asarray(phiU), np.asarray(phiV), np.asarray(y), signal_var, r,
        sigma_uv=float(model._sigma_uv),
    )
    rng = np.random.default_rng(5)
    f_theirs = []
    for seed in (21, 22):
        theta0 = np.concatenate([
            float(model._sigma_uv) * rng.normal(size=n1 * r),
            float(model._sigma_uv) * rng.normal(size=n2 * r),
            rng.normal(size=r * r),
        ])
        draws, acc = eng.torch_hmc(
            lp, theta0, num_warmup=600, num_samples=2500, num_leapfrog=32,
            seed=seed,
        )
        assert acc > 0.5
        f_theirs.append(eng.tensor2d_predict_np(
            draws, np.asarray(phiU), np.asarray(phiV), tn1, tn2, tr
        ))
    f_theirs = np.concatenate(f_theirs, axis=0)

    m_o, m_t = f_ours.mean(0), f_theirs.mean(0)
    s_o, s_t = f_ours.std(0), f_theirs.std(0)
    # combined conservative MC se per probe point (ESS haircut factor 10)
    se = np.sqrt(s_o**2 / (len(f_ours) / 10) + s_t**2 / (len(f_theirs) / 10))
    frac_ok = np.mean(np.abs(m_o - m_t) <= 6 * se + 0.02)
    assert frac_ok > 0.9, f"predictive means disagree at {1-frac_ok:.0%} of points"
    np.testing.assert_allclose(
        np.median(s_o), np.median(s_t), rtol=0.35,
    )
    # both engines must actually fit the data
    assert float(np.sqrt(np.mean((m_o - np.asarray(f_true)) ** 2))) < 0.3
    assert float(np.sqrt(np.mean((m_t - np.asarray(f_true)) ** 2))) < 0.3
