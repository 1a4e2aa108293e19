"""Thresh-variant CF SGLD tests: sparse noise placement + recovery."""
import jax
import jax.numpy as jnp
import numpy as np

from gpt_tpu.inference.cf_sgld import (
    inclusion_probabilities,
    make_thresh_step,
    run_cf_sgld_thresh,
)
from gpt_tpu.models.cf import CFBatch, CFModel
from gpt_tpu.utils.math import rmse


def test_inclusion_probabilities_limits():
    # an entity in every rating is in every minibatch; freq 0 → never
    p = inclusion_probabilities(np.array([0.0, 1.0, 1000.0]), N=1000, m=50)
    assert p[0] == 0.0
    assert 0.04 < p[1] < 0.06  # ≈ m/N = 0.05
    assert p[2] > 0.999


def test_noise_only_on_touched_rows(key):
    model = CFModel(n1=10, n2=8, r=2, signal_var=1e6, sigma_u=1e6, fix_w=True)
    params = model.init_params(key)
    step = make_thresh_step(model, data_size=100, epsU=1.0)
    batch = CFBatch(users=jnp.array([2, 5], jnp.int32), movies=jnp.array([1, 1], jnp.int32))
    y = jnp.zeros(2)
    new = step(params, jax.random.fold_in(key, 1), batch, y)
    dU = np.abs(np.asarray(new.U - params.U))
    # with huge signal_var/sigma_u the gradient term ~0 ⇒ changes ≈ noise only
    assert dU[2].max() > 1e-3 and dU[5].max() > 1e-3
    untouched = [i for i in range(10) if i not in (2, 5)]
    assert dU[untouched].max() < 1e-6
    dV = np.abs(np.asarray(new.V - params.V))
    assert dV[1].max() > 1e-3
    assert dV[[0, 2, 3, 4, 5, 6, 7]].max() < 1e-6


def test_thresh_run_recovers(key):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    n1, n2, r, N = 20, 15, 2, 600
    model = CFModel(n1=n1, n2=n2, r=r, signal_var=0.05, sigma_u=0.5, fix_w=True)
    true = model.init_params(k1)
    users = jax.random.randint(k2, (N,), 0, n1)
    movies = jax.random.randint(k3, (N,), 0, n2)
    batch = CFBatch(users=users.astype(jnp.int32), movies=movies.astype(jnp.int32))
    y = model.predict(true, batch) + 0.1 * jax.random.normal(k4, (N,))
    ratings = jnp.stack([users.astype(jnp.float32), movies.astype(jnp.float32), y], 1)

    params0 = model.init_params(jax.random.fold_in(key, 9))
    # same w as truth (fixw semantics: w is given)
    params0 = params0._replace(w=true.w)
    prior = float(rmse(model.predict(params0, batch), y))
    for correction in [False, True]:
        final, _ = run_cf_sgld_thresh(
            model, params0, jax.random.fold_in(key, 10), ratings,
            m=60, epsU=3e-4, burnin=0, maxepoch=150,
            bias_correction=correction,
        )
        post = float(rmse(model.predict(final, batch), y))
        assert post < 0.6 * prior, (correction, post, prior)
        np.testing.assert_array_equal(final.w, params0.w)
