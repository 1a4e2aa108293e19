"""Model-layer tests: contraction parity vs naive loops, FD gradient checks.

These are the test-ified versions of the reference's diagnostics:
``Diagnostic_gradients.jl`` (finite-difference checks of the hand-derived
tensor-model gradients) and the naive-R specification of the hot contraction
(``inf.R:37-46``).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpt_tpu.features import sample_tensor_rff, tensor_features, sample_full_rff, full_features
from gpt_tpu.models import TensorGP, FullThetaGP, TensorGPClassifier, sample_core_indices
from gpt_tpu.ops.contraction import core_products, phidot, tensor_predict


def _setup(key, n=6, r=3, D=4, Q=10, N=8):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    I = sample_core_indices(k1, r, D, Q)
    model = TensorGP(n=n, r=r, D=D, I=I, signal_var=0.1)
    params = model.init_params(k2)
    X = jax.random.normal(k3, (N, D))
    rff = sample_tensor_rff(k4, n, D)
    phi = tensor_features(X, rff, 1.0, 1.0, phi_scale=1.0)
    y = jax.random.normal(k1, (N,))
    return model, params, phi, y


def _naive_predict(w, U, I, phi):
    """Direct loop transcription of the model definition: per-point product."""
    N, D, n = phi.shape
    Q = I.shape[0]
    out = np.zeros(N)
    for i in range(N):
        for q in range(Q):
            prod = 1.0
            for k in range(D):
                prod *= float(np.dot(phi[i, k], U[k, :, I[q, k]]))
            out[i] += float(w[q]) * prod
    return out


def test_core_indices_distinct_and_in_range(key):
    I = sample_core_indices(key, 5, 3, 20)
    assert I.shape == (20, 3)
    assert int(I.min()) >= 0 and int(I.max()) < 5
    assert len({tuple(row) for row in np.asarray(I)}) == 20


def test_core_indices_large_lattice(key):
    I = sample_core_indices(key, 20, 8, 200)  # 20^8 lattice — int32-overflow case
    assert I.shape == (200, 8)
    assert len({tuple(row) for row in np.asarray(I)}) == 200


def test_tensor_predict_matches_naive(key):
    model, params, phi, _ = _setup(key)
    fhat = tensor_predict(params.w, params.U, model.I, phi)
    np.testing.assert_allclose(fhat, _naive_predict(params.w, params.U, np.asarray(model.I), phi), rtol=2e-4)


def test_core_products_gather_vs_onehot(key):
    model, params, phi, _ = _setup(key)
    temp = phidot(phi, params.U)
    Vg = core_products(temp, model.I, mode="gather")
    Vo = core_products(temp, model.I, mode="onehot")
    np.testing.assert_allclose(Vg, Vo, rtol=2e-4)


def test_dense_core_predict_matches_tensor_predict(key):
    """The one-hot-folded "dense" chain (MXU-friendly contraction dims) is
    the same math as phidot+onehot, with and without chain axes."""
    from gpt_tpu.ops.contraction import dense_core_predict

    model, params, phi, _ = _setup(key)
    ref = tensor_predict(params.w, params.U, model.I, phi)
    out = dense_core_predict(params.w, params.U, model.I, phi)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=1e-6)

    w = jnp.stack([params.w, 2 * params.w])
    U = jnp.stack([params.U, params.U])
    outc = dense_core_predict(w, U, model.I, phi)
    np.testing.assert_allclose(outc[0], ref, rtol=2e-4, atol=1e-6)

    g1 = jax.grad(lambda u: jnp.sum(dense_core_predict(params.w, u, model.I, phi) ** 2))(params.U)
    g2 = jax.grad(lambda u: jnp.sum(tensor_predict(params.w, u, model.I, phi) ** 2))(params.U)
    np.testing.assert_allclose(g1, g2, rtol=5e-4, atol=1e-5)


def test_tensor_predict_batched_params(key):
    """Leading chain axes on (w, U) broadcast through the whole chain."""
    model, params, phi, _ = _setup(key)
    w = jnp.stack([params.w, 2 * params.w])
    U = jnp.stack([params.U, params.U])
    fhat = tensor_predict(w, U, model.I, phi)
    assert fhat.shape == (2, phi.shape[0])
    np.testing.assert_allclose(fhat[0], tensor_predict(params.w, params.U, model.I, phi), rtol=1e-5)
    np.testing.assert_allclose(fhat[1], 2 * fhat[0], rtol=1e-5)


def test_log_joint_gradient_finite_differences(key):
    """FD check of ∇(log_lik + log_prior) — the Diagnostic_gradients.jl test."""
    model, params, phi, y = _setup(key)
    params = jax.tree.map(lambda a: a.astype(jnp.float64), params)
    phi, y = phi.astype(jnp.float64), y.astype(jnp.float64)

    def logp(p):
        return model.log_lik(p, phi, y) + model.log_prior(p)

    g = jax.grad(logp)(params)
    eps = 1e-6
    rng = np.random.default_rng(0)
    for name, arr, garr in [("w", params.w, g.w), ("U", params.U, g.U)]:
        flat = np.asarray(arr).ravel()
        gflat = np.asarray(garr).ravel()
        for idx in rng.choice(flat.size, size=5, replace=False):
            e = np.zeros_like(flat)
            e[idx] = eps
            pp = jax.tree.map(lambda a: a, params)._replace(
                **{name: jnp.asarray(flat + e).reshape(arr.shape)}
            )
            pm = params._replace(**{name: jnp.asarray(flat - e).reshape(arr.shape)})
            fd = (float(logp(pp)) - float(logp(pm))) / (2 * eps)
            assert abs(fd - gflat[idx]) < 1e-4 * max(1.0, abs(gflat[idx])), (name, idx)


def test_log_lik_weight_masks_padding(key):
    model, params, phi, y = _setup(key)
    w = jnp.array([1.0] * 6 + [0.0] * 2)
    ll_masked = model.log_lik(params, phi, y, weight=w)
    ll_sub = model.log_lik(params, phi[:6], y[:6])
    np.testing.assert_allclose(ll_masked, ll_sub, rtol=1e-5)


def test_fulltheta_predict_and_grad(key):
    k1, k2, k3 = jax.random.split(key, 3)
    model = FullThetaGP(n=16, signal_var=0.5, sigma_theta=1.0)
    params = model.init_params(k1)
    X = jax.random.normal(k2, (10, 2))
    phi = full_features(X, sample_full_rff(k3, 16, 2), 1.0, 1.0)
    y = jax.random.normal(k1, (10,))
    np.testing.assert_allclose(
        model.predict(params, phi), phi @ params.theta, rtol=1e-6
    )
    g = jax.grad(lambda p: model.log_lik(p, phi, y) + model.log_prior(p))(params)
    # analytic: φᵀ(y−φθ)/σ² − θ/σ_θ²
    expected = phi.T @ (y - phi @ params.theta) / 0.5 - params.theta
    np.testing.assert_allclose(g.theta, expected, rtol=1e-4)


def test_classifier_log_lik_is_log_softmax(key):
    from gpt_tpu.models import FullThetaClassifier

    k1, k2, k3 = jax.random.split(key, 3)
    model = FullThetaClassifier(n=8, num_classes=3)
    params = model.init_params(k1)
    phi = jax.random.normal(k2, (5, 8))
    y = jnp.array([0, 2, 1, 1, 0])
    ll = model.log_lik(params, phi, y)
    probs = model.predict_proba(params, phi)
    manual = sum(float(jnp.log(probs[i, int(y[i])])) for i in range(5))
    np.testing.assert_allclose(float(ll), manual, rtol=1e-5)


def test_tensor_classifier_shapes(key):
    k1, k2 = jax.random.split(key)
    I = sample_core_indices(k1, 3, 2, 5)
    model = TensorGPClassifier(n=6, r=3, D=2, num_classes=4, I=I)
    params = model.init_params(k2)
    assert params.w.shape == (4, 5)
    assert params.U.shape == (4, 2, 6, 3)
    phi = jax.random.normal(k1, (7, 2, 6))
    assert model.logits(params, phi).shape == (7, 4)
    probs = model.predict_proba(params, phi)
    np.testing.assert_allclose(jnp.sum(probs, -1), np.ones(7), rtol=1e-5)
