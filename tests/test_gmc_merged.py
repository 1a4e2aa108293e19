"""Chain-merged fleet GMC (``run_gmc_chains`` + ``contraction="merged"``).

The merged layout rides all chains' factor columns on the MXU lane axis of
one matmul per dimension (``ops.contraction.fleet_tensor_predict``) — the
full-batch GMC gradient's speed-of-light form (VERDICT r3 ask #2). These
tests pin (a) exact agreement of the merged contraction with the gather
reference for values and gradients, (b) per-chain MH semantics, and (c)
statistical agreement with the vmapped runner on posterior recovery.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpt_tpu.data.synth import make_tensor_synth
from gpt_tpu.inference import GMCConfig, run_gmc
from gpt_tpu.inference.gmc import run_gmc_chains
from gpt_tpu.models.tensor_gp import TensorGP, TensorGPParams
from gpt_tpu.utils.math import rmse


@pytest.fixture(scope="module")
def synth():
    return make_tensor_synth(jax.random.PRNGKey(0), N=150, D=3, n=4, r=2, Q=8)


def _chain_params(model, C, seed=5):
    return jax.vmap(model.init_params)(jax.random.split(jax.random.PRNGKey(seed), C))


@pytest.mark.parametrize("mode", ["merged", "merged_onehot"])
def test_merged_contraction_matches_gather(synth, mode):
    import dataclasses

    C = 4
    m_g = synth.model
    m_m = dataclasses.replace(m_g, contraction=mode)
    params = _chain_params(m_g, C)
    y = synth.y[0.1]

    f_g = m_g.predict(params, synth.phi)
    f_m = m_m.predict(params, synth.phi)
    np.testing.assert_allclose(np.asarray(f_m), np.asarray(f_g),
                               rtol=1e-5, atol=1e-5)

    g_g = jax.grad(lambda p: jnp.sum(m_g.log_lik(p, synth.phi, y)))(params)
    g_m = jax.grad(lambda p: jnp.sum(m_m.log_lik(p, synth.phi, y)))(params)
    np.testing.assert_allclose(np.asarray(g_m.w), np.asarray(g_g.w),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_m.U), np.asarray(g_g.U),
                               rtol=1e-4, atol=1e-4)

    # single-chain (no leading axis) routing works too
    p1 = m_g.init_params(jax.random.PRNGKey(9))
    np.testing.assert_allclose(
        np.asarray(m_m.predict(p1, synth.phi)),
        np.asarray(m_g.predict(p1, synth.phi)), rtol=1e-5, atol=1e-5)


def test_fleet_gmc_recovers_signal_per_chain(synth):
    import dataclasses

    C = 4
    model = dataclasses.replace(synth.model, contraction="merged")
    y = synth.y[0.1]
    params0 = _chain_params(model, C)
    prior = float(rmse(jnp.mean(model.predict(params0, synth.phi), 0), y))
    cfg = GMCConfig(eps=TensorGPParams(w=2e-4, U=2e-6), num_leapfrog=5)
    final, collected, accept = run_gmc_chains(
        model, params0, jax.random.PRNGKey(11), synth.phi, y,
        config=cfg, burnin=40, maxepoch=40,
    )
    assert accept.shape == (80, C)
    # per-chain MH: different chains make different decisions
    assert np.asarray(accept).std(axis=1).max() > 0
    assert float(accept.mean()) > 0.5
    # manifold maintained for every chain
    UtU = jnp.einsum("cdni,cdnj->cdij", final.U, final.U)
    assert float(jnp.max(jnp.abs(UtU - jnp.eye(model.r)))) < 1e-3
    # posterior-mean prediction beats the prior (collected: (epochs, C, ...))
    preds = jax.vmap(lambda p: model.predict(p, synth.phi))(
        jax.tree.map(lambda a: a.reshape((-1,) + a.shape[2:]), collected)
    )
    post = float(rmse(jnp.mean(preds, 0), y))
    assert post < 0.7 * prior, (post, prior)


def test_fleet_gmc_matches_vmapped_statistically(synth):
    """Merged fleet and vmapped per-chain runner sample the same posterior."""
    import dataclasses

    C = 6
    y = synth.y[0.1]
    cfg = GMCConfig(eps=TensorGPParams(w=2e-4, U=2e-6), num_leapfrog=5)
    model_m = dataclasses.replace(synth.model, contraction="merged")
    params0 = _chain_params(synth.model, C)

    _, coll_m, acc_m = run_gmc_chains(
        model_m, params0, jax.random.PRNGKey(13), synth.phi, y,
        config=cfg, burnin=40, maxepoch=60,
    )
    run_v = jax.vmap(
        lambda p, k: run_gmc(synth.model, p, k, synth.phi, y, config=cfg,
                             burnin=40, maxepoch=60)
    )
    _, coll_v, acc_v = run_v(params0, jax.random.split(jax.random.PRNGKey(14), C))

    assert abs(float(acc_m.mean()) - float(acc_v.mean())) < 0.15
    # posterior-mean predictions at the training points agree within MC error
    pm = jnp.mean(jax.vmap(lambda p: model_m.predict(p, synth.phi))(
        jax.tree.map(lambda a: a.reshape((-1,) + a.shape[2:]), coll_m)), 0)
    # vmapped collected: (C, epochs, ...) — flatten both chain+epoch axes
    pv = jnp.mean(jax.vmap(lambda p: synth.model.predict(p, synth.phi))(
        jax.tree.map(lambda a: a.reshape((-1,) + a.shape[2:]), coll_v)), 0)
    assert float(rmse(pm, y)) < 1.3 * float(rmse(pv, y)) + 0.05


def test_fleet_gmc_jitter_and_adaptation(synth):
    import dataclasses

    C = 3
    model = dataclasses.replace(synth.model, contraction="merged")
    y = synth.y[0.1]
    params0 = _chain_params(model, C)
    cfg = GMCConfig(
        eps=TensorGPParams(w=2e-4, U=2e-6), num_leapfrog=4,
        jitter_steps=True, adapt_step_size=True, target_accept=0.8,
    )
    final, collected, accept, eta_bar = run_gmc_chains(
        model, params0, jax.random.PRNGKey(15), synth.phi, y,
        config=cfg, burnin=30, maxepoch=20,
    )
    assert eta_bar.shape == (C,)
    assert np.all(np.isfinite(np.asarray(eta_bar))) and np.all(np.asarray(eta_bar) > 0)
    # adapted step keeps acceptance near the target post-burn-in
    post_acc = float(accept[30:].mean())
    assert 0.45 < post_acc <= 1.0, post_acc
