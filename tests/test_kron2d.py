"""2-D Kronecker model tests: prediction identity, SGLD on the model, parity
between Tensor2D at full rank and MatrixTheta."""
import jax
import jax.numpy as jnp
import numpy as np

from gpt_tpu.inference import SGLDConfig, run_sgld
from gpt_tpu.models import MatrixTheta, Tensor2D, gather_features
from gpt_tpu.models.kron2d import MatrixThetaParams, Tensor2DParams
from gpt_tpu.utils.math import rmse


def _data(key, N=200, n1=6, n2=5):
    k1, k2 = jax.random.split(key)
    phiU = jax.random.normal(k1, (N, n1)) / jnp.sqrt(n1)
    phiV = jax.random.normal(k2, (N, n2)) / jnp.sqrt(n2)
    return phiU, phiV


def test_tensor2d_predict_matches_loop(key):
    phiU, phiV = _data(key, N=7)
    model = Tensor2D(n1=6, n2=5, r=3, signal_var=0.1)
    params = model.init_params(key)
    out = model.predict(params, (phiU, phiV))
    for i in range(7):
        expect = float(phiU[i] @ params.U @ params.w @ params.V.T @ phiV[i])
        np.testing.assert_allclose(float(out[i]), expect, rtol=1e-5)


def test_tensor2d_fullrank_equals_matrixtheta(key):
    """Tensor2D with Θ = U w Vᵀ reproduces MatrixTheta predictions."""
    phiU, phiV = _data(key, N=11)
    t2 = Tensor2D(n1=6, n2=5, r=6, signal_var=0.1)
    p = t2.init_params(key)
    theta = p.U @ p.w @ p.V.T
    mt = MatrixTheta(n1=6, n2=5, signal_var=0.1)
    np.testing.assert_allclose(
        t2.predict(p, (phiU, phiV)),
        mt.predict(MatrixThetaParams(theta=theta), (phiU, phiV)),
        rtol=1e-5,
    )


def test_gather_features_indexing(key):
    factor = jax.random.normal(key, (9, 4))
    idx = jnp.array([3, 0, 8])
    np.testing.assert_allclose(gather_features(factor, idx), factor[jnp.array([3, 0, 8])])


def test_tensor2d_sgld_recovers(key):
    """SGLD on Tensor2D data drawn from the model: posterior-mean RMSE ≪ prior.
    This is the California tensor2d workload shape (kron features + SGLD
    replacing Stan NUTS)."""
    kd, kp, kn, ks = jax.random.split(key, 4)
    phiU, phiV = _data(kd, N=300)
    model = Tensor2D(n1=6, n2=5, r=3, signal_var=0.01)
    true = model.init_params(kp)
    f = model.predict(true, (phiU, phiV))
    y = f + 0.1 * jax.random.normal(kn, f.shape)

    params0 = model.init_params(jax.random.fold_in(kp, 1))
    prior = float(rmse(model.predict(params0, (phiU, phiV)), y))
    cfg = SGLDConfig(eps=Tensor2DParams(U=1e-4, V=1e-4, w=1e-4))
    final, collected = run_sgld(
        model, params0, ks, (phiU, phiV), y,
        m=50, config=cfg, burnin=200, maxepoch=100,
    )
    preds = jax.vmap(lambda p: model.predict(p, (phiU, phiV)))(collected)
    post = float(rmse(preds.mean(0), y))
    assert post < 0.5 * prior, (post, prior)
    assert int(final.rejected) == 0
