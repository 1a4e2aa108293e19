"""Tests for Parafac, hyperlearning drivers, records, and checkpointing."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpt_tpu.features import sample_full_rff, sample_tensor_rff, tensor_features, full_features
from gpt_tpu.inference.parafac import parafac_posterior_mean, parafac_predict
from gpt_tpu.experiments.hyperlearning import (
    learn_rff_hyperparams,
    stochastic_em_classification,
)
from gpt_tpu.utils.records import append_record, read_records
from gpt_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def test_parafac_fits_parafac_data(key):
    """Data from the Parafac model itself: posterior mean recovers it."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    N, D, n = 200, 3, 8
    X = jax.random.normal(k1, (N, D))
    rff = sample_tensor_rff(k2, n, D)
    phi = tensor_features(X, rff, 1.0, 1.0, phi_scale=float(np.sqrt(n)))
    mu_true = jax.random.normal(k3, (n,)) * 2
    y = parafac_predict(mu_true, phi) + 0.05 * jax.random.normal(k4, (N,))
    mu = parafac_posterior_mean(phi, y, signal_var=0.05**2)
    resid = parafac_predict(mu, phi) - y
    assert float(jnp.sqrt(jnp.mean(resid**2))) < 0.1


def test_parafac_is_ridge(key):
    """Matches the explicit ridge solution."""
    k1, k2 = jax.random.split(key)
    phi = jax.random.normal(k1, (30, 2, 4))
    y = jax.random.normal(k2, (30,))
    mu = parafac_posterior_mean(phi, y, 0.5, sigma_w=2.0)
    Psi = jnp.prod(phi, axis=1)
    expect = jnp.linalg.solve(Psi.T @ Psi / 0.5 + jnp.eye(4) / 4.0, Psi.T @ y / 0.5)
    np.testing.assert_allclose(mu, expect, rtol=1e-6)


def test_learn_rff_hyperparams_improves_nlml(key):
    kx, kf, kn = jax.random.split(key, 3)
    X = jax.random.normal(kx, (80, 2))
    rff = sample_full_rff(kf, 40, 2)
    y = jnp.sin(1.5 * X[:, 0]) + 0.1 * jax.random.normal(kn, (80,))
    init = jnp.array([1.0, 1.0, 3.0, 3.0])
    res = learn_rff_hyperparams(X, y, rff, init, max_steps=50)
    phi0 = full_features(X, rff, init[2:], init[1])
    from gpt_tpu.inference import rff_nlml

    assert float(res.nlml) < float(rff_nlml(phi0, y, init[0]))
    assert res.hyperparams[0] < 1.0  # noise shrinks toward 0.01


def test_stochastic_em_classification_runs(key):
    kx, kf = jax.random.split(key)
    X = jax.random.normal(kx, (60, 2))
    y = (X[:, 0] > 0).astype(jnp.int32)
    rff = sample_full_rff(kf, 16, 2)
    from gpt_tpu.inference import StochasticEMConfig

    theta, hyper, rounds, _ = stochastic_em_classification(
        jax.random.fold_in(key, 3), X, y, rff, 2, jnp.array([1.0, 1.0]),
        config=StochasticEMConfig(e_steps=30, eps_theta=1e-2, max_rounds=5),
    )
    assert bool(jnp.all(jnp.isfinite(theta)))
    assert bool(jnp.all(hyper > 0))
    assert int(rounds) >= 1


def test_records_roundtrip(tmp_path):
    p = str(tmp_path / "records.jsonl")
    append_record(p, "pp_notensor", {"rmse": 4.08}, {"n": 2000})
    append_record(p, "kin40k", {"rmse": 0.3})
    recs = read_records(p)
    assert len(recs) == 2
    assert read_records(p, "pp_notensor")[0]["metrics"]["rmse"] == 4.08
    assert recs[0]["config"]["n"] == 2000


def test_checkpoint_roundtrip(tmp_path, key):
    from gpt_tpu.inference.sgld import SGLDConfig, sgld_init
    from gpt_tpu.models import FullThetaGP

    model = FullThetaGP(n=8, signal_var=0.1)
    state = sgld_init(model.init_params(key), key, SGLDConfig(eps=1e-4))
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state)
    restored = load_checkpoint(path, state)
    np.testing.assert_allclose(restored.params.theta, state.params.theta)
    assert int(restored.step) == int(state.step)


def test_midrun_resume_exact(key, tmp_path):
    """run(20 epochs) ≡ run(10) → checkpoint → restore → resume(10) bitwise."""
    from gpt_tpu.data.synth import make_tensor_synth
    from gpt_tpu.inference import SGLDConfig, run_sgld
    from gpt_tpu.models.tensor_gp import TensorGPParams

    s = make_tensor_synth(jax.random.PRNGKey(0), N=60, D=3, n=4, r=2, Q=6)
    y = s.y[0.1]
    cfg = SGLDConfig(eps=TensorGPParams(w=1e-5, U=1e-7))
    p0 = s.model.init_params(jax.random.fold_in(key, 1))
    kw = dict(m=20, config=cfg, collect_fn=lambda p: p.w)

    full, col_full = run_sgld(s.model, p0, key, s.phi, y, burnin=0, maxepoch=20, **kw)

    half, _ = run_sgld(s.model, p0, key, s.phi, y, burnin=0, maxepoch=10, **kw)
    path = str(tmp_path / "mid")
    save_checkpoint(path, half)
    restored = load_checkpoint(path, half)
    resumed, col_resumed = run_sgld(
        s.model, p0, key, s.phi, y, burnin=0, maxepoch=10,
        initial_state=restored, **kw
    )
    np.testing.assert_array_equal(resumed.params.w, full.params.w)
    np.testing.assert_array_equal(col_resumed, col_full[10:])


def test_posterior_predictor_serving(key):
    """Serving path: chunked MC posterior-predictive equals direct average."""
    from gpt_tpu.data.synth import make_tensor_synth
    from gpt_tpu.experiments.serving import PosteriorPredictor
    from gpt_tpu.inference import SGLDConfig, run_sgld
    from gpt_tpu.models.tensor_gp import TensorGPParams

    s = make_tensor_synth(jax.random.PRNGKey(0), N=90, D=3, n=4, r=2, Q=8)
    cfg = SGLDConfig(eps=TensorGPParams(w=3e-5, U=3e-7))
    p0 = s.model.init_params(key)
    _, collected = run_sgld(
        s.model, p0, key, s.phi, s.y[0.1], m=30, config=cfg, burnin=5, maxepoch=12
    )
    served = PosteriorPredictor(s.model.predict, collected, chunk=32)(s.phi)
    direct = jax.vmap(lambda p: s.model.predict(p, s.phi))(collected)
    np.testing.assert_allclose(served.mean, direct.mean(0), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(served.var, direct.var(0), rtol=1e-4, atol=1e-6)
    assert served.mean.shape == (90,)


def test_eps_sensitivity_sweep(key):
    """RMSEvsEps harness: diverging step sizes show up as worse RMSE."""
    from gpt_tpu.data.synth import make_tensor_synth
    from gpt_tpu.experiments.sweeps import eps_sensitivity
    from gpt_tpu.models.tensor_gp import TensorGPParams

    s = make_tensor_synth(jax.random.PRNGKey(0), N=80, D=3, n=4, r=2, Q=8)
    y = s.y[0.1]
    p0 = s.model.init_params(key)
    res = eps_sensitivity(
        s.model, p0, key, s.phi, y, s.phi, y,
        make_eps=lambda e: TensorGPParams(w=e, U=e * 1e-2),
        eps_values=[1e-6, 3e-5, 3e-2],
        m=40, burnin=10, maxepoch=20,
    )
    assert res.curves.shape == (3, 20)
    # the mid step size should beat both the too-small and the huge one
    assert res.min_rmse[1] <= res.min_rmse[0] + 1e-6
    assert res.min_rmse[1] < res.min_rmse[2] + 0.5
