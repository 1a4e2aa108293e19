"""Exact-GP oracle tests: kernel algebra, inference invariants, NLML parity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpt_tpu.inference import gp_nlml
from gpt_tpu.models.exact_gp import (
    ExactGP,
    k_prod,
    k_sum,
    linear,
    matern,
    periodic,
    rq_iso,
    se_ard,
    se_iso,
)


@pytest.fixture
def data(key):
    kx, ky = jax.random.split(key)
    X = jax.random.normal(kx, (30, 2))
    y = jnp.sin(X[:, 0]) + 0.05 * jax.random.normal(ky, (30,))
    return X, y


@pytest.mark.parametrize("kfn", [
    se_iso(1.0, 1.0),
    se_ard(jnp.array([1.0, 2.0]), 1.3),
    matern(1.0, 1.0, 1),
    matern(1.0, 1.0, 3),
    matern(1.0, 1.0, 5),
    rq_iso(1.0, 1.0, 2.0),
    linear(0.5),
    k_sum(se_iso(1.0, 1.0), linear(0.2)),
    k_prod(se_iso(2.0, 1.0), rq_iso(1.0, 1.0, 1.0)),
])
def test_kernels_psd_and_symmetric(kfn, key):
    X = jax.random.normal(key, (20, 2))
    K = kfn(X, X)
    np.testing.assert_allclose(K, K.T, atol=1e-8)
    vals = jnp.linalg.eigvalsh(K + 1e-8 * jnp.eye(20))
    assert float(vals.min()) > -1e-6


def test_periodic_kernel_period(key):
    X = jnp.linspace(0, 4, 41)[:, None]  # exact 0.1 spacing → 1.0 on the grid
    k = periodic(1.0, 1.0, 1.0)
    K = k(X, X)
    # points one full period apart are perfectly correlated
    i = 0
    j = int(jnp.argmin(jnp.abs(X[:, 0] - (X[0, 0] + 1.0))))
    np.testing.assert_allclose(K[i, j], K[i, i], rtol=1e-6)


def test_posterior_interpolates_low_noise(data):
    X, y = data
    gp = ExactGP(kernel=se_iso(1.0, 1.0), noise_var=1e-4)
    post = gp.fit(X, y)
    mu, var = gp.predict(post, X)
    # residual = σ²(K+σ²I)⁻¹y is bounded by σ²·‖α‖ — with cond(K) ≈ 1e5 the
    # train fit is ~3e-2, far inside the 0.05 observation noise.
    np.testing.assert_allclose(mu, y, atol=0.05)
    assert float(jnp.max(var)) < 2e-4


def test_posterior_variance_reduction(data):
    X, y = data
    gp = ExactGP(kernel=se_iso(1.0, 1.0), noise_var=0.1)
    post = gp.fit(X, y)
    Xs = jax.random.normal(jax.random.PRNGKey(9), (10, 2))
    _, var = gp.predict(post, Xs)
    prior_var = jnp.diagonal(gp.kernel(Xs, Xs))
    assert bool(jnp.all(var < prior_var + 1e-9))
    assert bool(jnp.all(var > 0))


def test_nlml_matches_hyper_module(data):
    X, y = data
    gp = ExactGP(kernel=se_ard(jnp.array([1.0, 2.0]), jnp.sqrt(1.3)), noise_var=0.2)
    post = gp.fit(X, y)
    ref = gp_nlml(X, y, 0.2, 1.3, jnp.array([1.0, 2.0]))
    np.testing.assert_allclose(float(post.nlml), float(ref), rtol=1e-6)


def test_prior_samples_match_kernel_cov(key):
    X = jnp.linspace(-2, 2, 10)[:, None]
    gp = ExactGP(kernel=se_iso(1.0, 1.0), noise_var=0.0)
    draws = gp.sample_prior(key, X, num=4000)
    emp = jnp.cov(draws.T)
    np.testing.assert_allclose(emp, gp.kernel(X, X), atol=0.15)


def test_predict_y_adds_noise(data):
    X, y = data
    gp = ExactGP(kernel=se_iso(1.0, 1.0), noise_var=0.3)
    post = gp.fit(X, y)
    Xs = X[:5]
    _, fvar = gp.predict(post, Xs)
    _, yvar = gp.predict_y(post, Xs)
    np.testing.assert_allclose(yvar - fvar, 0.3 * np.ones(5), rtol=1e-6)


def test_mean_function(data):
    X, y = data
    gp = ExactGP(kernel=se_iso(1.0, 1.0), noise_var=0.1, mean=2.0)
    post = gp.fit(X, y + 2.0)
    far = jnp.array([[50.0, 50.0]])  # far from data → revert to mean
    mu, _ = gp.predict(post, far)
    np.testing.assert_allclose(mu, [2.0], atol=1e-3)


def test_pp_full_nlml_matches_reference_log():
    """Exact-GP ARD NLML on the FULL whitened Power Plant dataset at the
    reference's GPstuff-tuned hyperparameters equals the logged value
    -2239.2172 (``DataRecords.txt:837-840``) — a cross-implementation
    end-to-end check of kernel, whitening, and NLML in one number."""
    import os

    import jax.numpy as jnp

    from gpt_tpu.data.loaders import REFERENCE_ROOT, _load_dense
    from gpt_tpu.inference.hyper import gp_nlml
    from gpt_tpu.utils.math import whiten

    data = _load_dense(
        os.path.join(REFERENCE_ROOT, "Folds5x2_pp.csv"), 5, sep=",", skip_header=1
    )
    X, y = data[:, :4], data[:, 4]
    Xw, _ = whiten(jnp.asarray(X, jnp.float64))
    yw, _ = whiten(jnp.asarray(y, jnp.float64)[:, None])
    ls = jnp.array([1.3978, 0.0028, 2.8966, 7.5565])
    val = float(gp_nlml(Xw, yw[:, 0], 0.0195, 0.8333, ls))
    assert abs(val - (-2239.2172)) < 0.5, val
