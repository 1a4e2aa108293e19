"""RFF feature tests: kernel-approximation convergence + analytic gradients.

The Gram-convergence assertions are the test-ified version of the reference's
kernel-approximation study (``powerplant_hyperparams.m:94-126``,
``PowerPlantDataExperiment.jl:88-95``).
"""
import jax
import jax.numpy as jnp
import numpy as np

from gpt_tpu.features import (
    full_features,
    full_features_paired,
    grad_full_features,
    sample_full_rff,
    sample_tensor_rff,
    tensor_features,
    tensor_features_paired,
)


def _se_ard_kernel(X, length_scale, sigma_RBF):
    ls = jnp.broadcast_to(jnp.asarray(length_scale), (X.shape[1],))
    Xs = X / ls[None, :]
    sq = jnp.sum(Xs**2, 1)[:, None] + jnp.sum(Xs**2, 1)[None, :] - 2 * Xs @ Xs.T
    return sigma_RBF**2 * jnp.exp(-0.5 * sq)


def test_full_rff_gram_converges(key):
    """φφᵀ → SE/ARD Gram as n grows (MC convergence of the RFF estimator)."""
    kx, kf = jax.random.split(key)
    X = jax.random.normal(kx, (40, 3))
    ls, s = jnp.array([1.0, 2.0, 0.7]), 1.3
    K = _se_ard_kernel(X, ls, s)
    errs = []
    for n in [256, 4096]:
        phi = full_features(X, sample_full_rff(kf, n, 3), ls, s)
        errs.append(float(jnp.linalg.norm(phi @ phi.T - K) / jnp.linalg.norm(K)))
    assert errs[1] < errs[0]
    assert errs[1] < 0.15


def test_full_rff_paired_gram_exact_in_expectation(key):
    """Paired sin/cos features have lower variance and also converge."""
    kx, kf = jax.random.split(key)
    X = jax.random.normal(kx, (30, 2))
    K = _se_ard_kernel(X, 1.0, 1.0)
    Z = jax.random.normal(kf, (2048, 2))
    phi = full_features_paired(X, Z, 1.0, 1.0)
    err = float(jnp.linalg.norm(phi @ phi.T - K) / jnp.linalg.norm(K))
    assert err < 0.1


def test_tensor_features_shape_and_scale(key):
    kx, kf = jax.random.split(key)
    X = jax.random.normal(kx, (17, 4))
    rff = sample_tensor_rff(kf, 32, 4)
    phi = tensor_features(X, rff, 1.0, 1.0, phi_scale=2.0)
    assert phi.shape == (17, 4, 32)
    # |φ| ≤ scale · σ^{1/D} · sqrt(2/n)
    bound = 2.0 * jnp.sqrt(2.0 / 32)
    assert float(jnp.max(jnp.abs(phi))) <= float(bound) + 1e-6


def test_tensor_features_per_dim_gram(key):
    """Per-dimension features approximate the 1-D SE kernel of that dim."""
    kx, kf = jax.random.split(key)
    X = jax.random.normal(kx, (25, 2))
    n = 8192
    rff = sample_tensor_rff(kf, n, 2)
    # With phi_scale=1, σ=1: per-dim Gram ≈ exp(-0.5 (x-x')²/ℓ²)
    phi = tensor_features(X, rff, 1.0, 1.0, phi_scale=1.0)
    for k in range(2):
        K1 = jnp.exp(-0.5 * (X[:, k][:, None] - X[:, k][None, :]) ** 2)
        G = phi[:, k, :] @ phi[:, k, :].T
        assert float(jnp.linalg.norm(G - K1) / jnp.linalg.norm(K1)) < 0.1


def test_tensor_features_paired_shape(key):
    kx, kf = jax.random.split(key)
    X = jax.random.normal(kx, (9, 3))
    Z = jax.random.normal(kf, (16, 3))
    phi = tensor_features_paired(X, Z, 1.0, 1.5, phi_scale=1.0)
    assert phi.shape == (9, 3, 32)


def test_grad_full_features_matches_autodiff(key):
    """Analytic ∂φ/∂(ℓ, σ) vs jax.jacfwd — ARD (vector ℓ) case."""
    kx, kf = jax.random.split(key)
    X = jax.random.normal(kx, (7, 3))
    rff = sample_full_rff(kf, 11, 3)
    ls = jnp.array([0.8, 1.2, 2.0])
    s = 1.4

    d_ell, d_sigma = grad_full_features(X, rff, ls, s)
    jac_l = jax.jacfwd(lambda l: full_features(X, rff, l, s))(ls)  # (N, n, D)
    jac_s = jax.jacfwd(lambda sig: full_features(X, rff, ls, sig))(s)

    # Sign note: ∂angle/∂ℓ < 0 so ∂φ/∂ℓ = +sin(angle)·(...)·σ√(2/n); the
    # reference returns phisin·(ZtX)/ℓ with the same sign convention.
    np.testing.assert_allclose(d_ell, jac_l, atol=1e-4)
    np.testing.assert_allclose(d_sigma, jac_s, atol=1e-5)


def test_grad_full_features_scalar_matches_vector_sum(key):
    """Scalar-ℓ derivative equals the sum of ARD components at equal ℓ."""
    kx, kf = jax.random.split(key)
    X = jax.random.normal(kx, (5, 2))
    rff = sample_full_rff(kf, 9, 2)
    d_ell, _ = grad_full_features(X, rff, 1.3, 1.0)
    jac_scalar = jax.jacfwd(lambda l: full_features(X, rff, l, 1.0))(1.3)
    np.testing.assert_allclose(jnp.sum(d_ell, axis=-1), jac_scalar, atol=1e-4)


def test_cf_hashing_features(key):
    """CF hashing-trick features: M distinct ±1 positions per entity, correct
    scaling, and kron-feature layout parity with a naive loop."""
    import jax
    from gpt_tpu.features import CFHashing, cf_features, cf_features_full, sample_cf_hashing

    n, M, Nu, Nm = 16, 3, 5, 4
    ku, km, kd1, kd2 = jax.random.split(key, 4)
    uh = sample_cf_hashing(ku, n, M, Nu)
    mh = sample_cf_hashing(km, n, M, Nm)
    # distinct positions per entity
    for e in range(Nu):
        assert len(set(np.asarray(uh.positions[:, e]))) == M
    assert set(np.unique(uh.signs)) <= {-1.0, 1.0}

    user_data = jax.random.uniform(kd1, (Nu, 2))
    movie_data = jax.random.uniform(kd2, (Nm, 3))
    a, b1, b2 = 0.7, 0.3, 0.4
    pu, pm = cf_features(user_data, movie_data, uh, mh, a, b1, b2)
    assert pu.shape == (Nu, n + 2) and pm.shape == (Nm, n + 3)
    # hashed block scaling: user a/sqrt(M), movie 1/sqrt(M)
    np.testing.assert_allclose(
        np.sort(np.abs(np.asarray(pu[0, :n])))[-M:],
        np.full(M, a / np.sqrt(M)), rtol=1e-6)
    np.testing.assert_allclose(pu[:, n:], b1 * user_data, rtol=1e-6)

    ratings = jnp.array([[0, 0], [3, 2]], jnp.int32)
    full = cf_features_full(ratings, pu, pm)
    assert full.shape == (2, (n + 2) * (n + 3))
    expect = np.outer(np.asarray(pu[3]), np.asarray(pm[2])).ravel()
    np.testing.assert_allclose(full[1], expect, rtol=1e-6)
