"""EP binary GP classification vs brute-force Monte-Carlo ground truth.

The reference's EP (`GPkit.jl-master/src/infEP.jl`) was experimental and its
probit likelihood (`likErf.jl`) incomplete; here EP is complete, so we can
test it properly: on a tiny dataset the exact quantities
``Z = E_{f~N(0,K)}[Π Φ(y_i f_i)]`` and ``P(y*=+1) = E[Φ(f*)·Π Φ(y_i f_i)]/Z``
are computable by plain Monte Carlo, and EP must land within MC error + EP
approximation error (EP is near-exact for probit GPC on small N).
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.stats import norm

from gpt_tpu.inference.ep import fit_ep, predict_ep
from gpt_tpu.models.exact_gp import se_iso


def _toy(key, N=8):
    kx, ky = jax.random.split(key)
    X = jax.random.uniform(kx, (N, 1), jnp.float64, -2.0, 2.0)
    f_true = jnp.sin(1.5 * X[:, 0])
    y = jnp.where(f_true + 0.3 * jax.random.normal(ky, (N,)) > 0, 1.0, -1.0)
    return X, y


def test_ep_log_z_matches_monte_carlo(key):
    X, y = _toy(key)
    kernel = se_iso(1.0, 1.2)
    post = fit_ep(kernel, X, y, sweeps=60)
    assert float(post.state.delta) < 1e-8  # converged

    K = kernel(X, X) + 1e-8 * jnp.eye(X.shape[0], dtype=X.dtype)
    L = jnp.linalg.cholesky(K)
    z = jax.random.normal(jax.random.PRNGKey(99), (400_000, X.shape[0]), jnp.float64)
    f = z @ L.T
    log_lik = jnp.sum(norm.logcdf(y[None, :] * f), axis=1)
    log_z_mc = jax.scipy.special.logsumexp(log_lik) - jnp.log(f.shape[0])
    np.testing.assert_allclose(float(post.log_z), float(log_z_mc), atol=0.05)


def test_ep_predictive_matches_monte_carlo(key):
    X, y = _toy(key)
    Xs = jnp.array([[-1.5], [0.0], [1.5]], jnp.float64)
    kernel = se_iso(1.0, 1.2)
    post = fit_ep(kernel, X, y, sweeps=60)
    _, _, prob = predict_ep(kernel, post, Xs)

    # joint-prior importance sampling for the exact predictive
    Xa = jnp.concatenate([X, Xs], axis=0)
    K = kernel(Xa, Xa) + 1e-8 * jnp.eye(Xa.shape[0], dtype=Xa.dtype)
    L = jnp.linalg.cholesky(K)
    z = jax.random.normal(jax.random.PRNGKey(7), (400_000, Xa.shape[0]), jnp.float64)
    f = z @ L.T
    logw = jnp.sum(norm.logcdf(y[None, :] * f[:, : X.shape[0]]), axis=1)
    w = jnp.exp(logw - jnp.max(logw))
    w = w / jnp.sum(w)
    prob_mc = jnp.sum(w[:, None] * norm.cdf(f[:, X.shape[0]:]), axis=0)
    np.testing.assert_allclose(np.asarray(prob), np.asarray(prob_mc), atol=0.03)


def test_ep_separates_classes(key):
    """1-D step data: EP predictive probabilities follow the labels."""
    X = jnp.linspace(-2, 2, 24)[:, None].astype(jnp.float64)
    y = jnp.where(X[:, 0] > 0, 1.0, -1.0)
    kernel = se_iso(0.8, 2.0)
    post = fit_ep(kernel, X, y, sweeps=60)
    _, _, prob = predict_ep(kernel, post, X)
    acc = jnp.mean((prob > 0.5) == (y > 0))
    assert float(acc) == 1.0
    assert float(post.state.delta) < 1e-6


def test_ep_evidence_gradient_is_finite(key):
    """log Z_EP is differentiable wrt hyperparameters through the fixed
    point (replaces GPML's hand-coded dnlZ)."""
    X, y = _toy(key)

    def nlz(log_ls):
        kernel = se_iso(jnp.exp(log_ls), 1.2)
        return -fit_ep(kernel, X, y, sweeps=30).log_z

    g = jax.grad(nlz)(jnp.asarray(0.1, jnp.float64))
    assert np.isfinite(float(g))
    # FD check
    e = 1e-4
    fd = (nlz(jnp.asarray(0.1 + e)) - nlz(jnp.asarray(0.1 - e))) / (2 * e)
    np.testing.assert_allclose(float(g), float(fd), rtol=2e-3, atol=1e-5)
