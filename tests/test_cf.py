"""CF model + sampler tests: selection-matrix semantics vs naive loops,
SGLD/Gibbs posterior recovery on synthetic bilinear data."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpt_tpu.inference import SGLDConfig, run_sgld
from gpt_tpu.inference.cf_gibbs import CFGibbsConfig, run_cf_gibbs
from gpt_tpu.models.cf import CFBatch, CFModel, CFParams, denormalize_and_cutoff, ratings_batch
from gpt_tpu.utils.math import rmse


@pytest.fixture(scope="module")
def cf_setup():
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    n1, n2, r, N = 30, 25, 3, 800
    model = CFModel(n1=n1, n2=n2, r=r, signal_var=0.05, sigma_u=0.5)
    true = model.init_params(k1)
    users = jax.random.randint(k2, (N,), 0, n1)
    movies = jax.random.randint(k3, (N,), 0, n2)
    batch = CFBatch(users=users.astype(jnp.int32), movies=movies.astype(jnp.int32))
    f = model.predict(true, batch)
    y = f + 0.1 * jax.random.normal(k4, (N,))
    return model, true, batch, y


def test_predict_matches_naive_loop(cf_setup):
    model, params, batch, _ = cf_setup
    out = model.predict(params, batch)
    for i in range(5):
        u, m = int(batch.users[i]), int(batch.movies[i])
        expect = float(params.U[u] @ params.w @ params.V[m])
        np.testing.assert_allclose(float(out[i]), expect, rtol=1e-5)


def test_sideinfo_predict_matches_naive(key):
    n1, n2, r, D1, D2 = 10, 8, 2, 4, 3
    ku, km, kp = jax.random.split(key, 3)
    user_data = (jax.random.uniform(ku, (n1, D1)) < 0.4).astype(jnp.float32)
    movie_data = (jax.random.uniform(km, (n2, D2)) < 0.4).astype(jnp.float32)
    model = CFModel(n1=n1, n2=n2, r=r, signal_var=0.1, a=0.5, b=0.25, c=0.5,
                    user_data=user_data, movie_data=movie_data)
    params = model.init_params(kp)
    batch = CFBatch(users=jnp.array([3, 7], jnp.int32), movies=jnp.array([1, 5], jnp.int32))
    out = model.predict(params, batch)
    for i in range(2):
        u, m = int(batch.users[i]), int(batch.movies[i])
        sumU = params.U[u] + 0.25 * user_data[u] @ params.U[n1:]
        sumV = params.V[m] + 0.5 * movie_data[m] @ params.V[n2:]
        expect = 0.5 * float(sumU @ params.w @ sumV)
        np.testing.assert_allclose(float(out[i]), expect, rtol=1e-5)


def test_cf_sgld_recovers(cf_setup):
    model, true, batch, y = cf_setup
    params0 = model.init_params(jax.random.PRNGKey(9))
    prior = float(rmse(model.predict(params0, batch), y))
    cfg = SGLDConfig(eps=CFParams(U=1e-4, V=1e-4, w=1e-4))
    final, collected = run_sgld(
        model, params0, jax.random.PRNGKey(10), batch, y,
        m=100, config=cfg, burnin=150, maxepoch=50,
    )
    preds = jax.vmap(lambda p: model.predict(p, batch))(collected)
    post = float(rmse(preds.mean(0), y))
    assert post < 0.5 * prior, (post, prior)


def test_cf_fixw_freezes_core(cf_setup):
    model, true, batch, y = cf_setup
    import dataclasses

    fmodel = dataclasses.replace(model, fix_w=True)
    params0 = fmodel.init_params(jax.random.PRNGKey(9))
    cfg = SGLDConfig(eps=CFParams(U=1e-4, V=1e-4, w=1e-4))
    final, _ = run_sgld(
        fmodel, params0, jax.random.PRNGKey(10), batch, y,
        m=100, config=cfg, burnin=10, maxepoch=5,
    )
    np.testing.assert_array_equal(final.params.w, params0.w)
    assert float(jnp.max(jnp.abs(final.params.U - params0.U))) > 1e-5


def test_cf_gibbs_recovers_better_than_sgld(cf_setup):
    model, true, batch, y = cf_setup
    ratings = jnp.stack(
        [batch.users.astype(jnp.float32), batch.movies.astype(jnp.float32), y], axis=1
    )
    params0 = model.init_params(jax.random.PRNGKey(11))
    final, collected = run_cf_gibbs(
        model, params0, jax.random.PRNGKey(12), ratings,
        burnin=20, maxepoch=40,
    )
    preds = jax.vmap(lambda p: model.predict(p, batch))(collected)
    post = float(rmse(preds.mean(0), y))
    assert post < 0.25, post  # near the 0.1 noise floor


def test_cf_gibbs_unrated_entities_get_prior_draws(key):
    model = CFModel(n1=5, n2=4, r=2, signal_var=0.1, sigma_u=0.7)
    # only users 0..2 and movies 0..1 appear
    ratings = jnp.array([[0, 0, 1.0], [1, 1, -0.5], [2, 0, 0.3]])
    params0 = model.init_params(key)
    final, collected = run_cf_gibbs(
        model, params0, jax.random.fold_in(key, 1), ratings, burnin=0, maxepoch=300
    )
    # unrated user 4: draws should have ~prior sd
    sd = float(jnp.std(collected.U[:, 4, 0]))
    assert 0.4 < sd < 1.0, sd


def test_cutoff():
    out = denormalize_and_cutoff(jnp.array([-10.0, 0.0, 10.0]), mean=3.5, std=1.0)
    np.testing.assert_allclose(out, [1.0, 3.5, 5.0])
