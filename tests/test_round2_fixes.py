"""Regression tests for round-2 VERDICT/ADVICE fixes."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpt_tpu.inference.sgld import SGLDConfig, _broadcast_eps


def test_broadcast_eps_expands_prefix_over_nested_subtrees():
    """eps pytree-prefix leaves must replicate over the whole matching
    params SUBTREE, not silently replace it with a scalar (round-1 weak #7)."""
    params = {"a": (jnp.zeros(2), jnp.zeros(3)), "b": jnp.zeros(4)}
    out = _broadcast_eps({"a": 1e-3, "b": 1e-5}, params)
    assert jax.tree.structure(out) == jax.tree.structure(params)
    assert out["a"][0] == 1e-3 and out["a"][1] == 1e-3 and out["b"] == 1e-5
    # scalar eps broadcasts everywhere
    out2 = _broadcast_eps(2e-4, params)
    assert set(jax.tree.leaves(out2)) == {2e-4}
    # a mis-shaped eps tree is an error, not a silent mis-map
    with pytest.raises((TypeError, ValueError)):
        _broadcast_eps(
            {"a": (1e-3, 1e-3), "b": {"oops": 1.0}},
            {"a": (jnp.zeros(1), jnp.zeros(1)), "b": jnp.zeros(1)},
        )


def test_rotated_w_init_preserves_predictions(key):
    """w ← Qw, U ← UQᵀ (100k_movielensExperiment.jl:957-962) must leave
    every prediction U w Vᵀ invariant while actually changing w."""
    from gpt_tpu.inference.cf_gibbs import rotated_w_init
    from gpt_tpu.models.cf import CFBatch, CFModel

    n1, n2, r = 7, 9, 4
    model = CFModel(n1=n1, n2=n2, r=r, signal_var=0.5, sigma_u=1.0)
    params = model.init_params(key)
    rotated = rotated_w_init(jax.random.fold_in(key, 1), params)
    assert not np.allclose(np.asarray(rotated.w), np.asarray(params.w))
    # rotation matrix is orthogonal: UQᵀ stays the same Frobenius norm
    np.testing.assert_allclose(
        float(jnp.linalg.norm(rotated.U)), float(jnp.linalg.norm(params.U)),
        rtol=1e-5,
    )
    batch = CFBatch(
        users=jax.random.randint(jax.random.fold_in(key, 2), (50,), 0, n1),
        movies=jax.random.randint(jax.random.fold_in(key, 3), (50,), 0, n2),
    )
    np.testing.assert_allclose(
        np.asarray(model.predict(rotated, batch)),
        np.asarray(model.predict(params, batch)),
        rtol=1e-5, atol=1e-6,
    )


def test_rotated_w_gibbs_reaches_same_posterior(key):
    """Fixed-w Gibbs from a rotated init must fit as well as unrotated."""
    from gpt_tpu.inference.cf_gibbs import rotated_w_init, run_cf_gibbs
    from gpt_tpu.models.cf import CFBatch, CFModel

    n1, n2, r, N = 20, 15, 3, 800
    kU, kV, ki, kn, ks, kp = jax.random.split(key, 6)
    U = jax.random.normal(kU, (n1, r)) * 0.5
    V = jax.random.normal(kV, (n2, r)) * 0.5
    w = jnp.eye(r, dtype=jnp.float32)
    users = jax.random.randint(ki, (N,), 0, n1)
    movies = jax.random.randint(jax.random.fold_in(ki, 1), (N,), 0, n2)
    y = jnp.einsum("ns,st,nt->n", U[users], w, V[movies]) + 0.1 * jax.random.normal(kn, (N,))
    ratings = jnp.stack([users.astype(jnp.float32), movies.astype(jnp.float32), y], axis=1)

    model = CFModel(n1=n1, n2=n2, r=r, signal_var=0.01, sigma_u=1.0, fix_w=True)
    params0 = model.init_params(kp)
    params0 = params0._replace(w=jnp.eye(r, dtype=params0.w.dtype))
    rmses = {}
    for name, p0 in {
        "plain": params0,
        "rotated": rotated_w_init(jax.random.fold_in(kp, 1), params0),
    }.items():
        final, _ = run_cf_gibbs(model, p0, ks, ratings, burnin=25, maxepoch=1)
        pred = model.predict(final, CFBatch(users=users, movies=movies))
        rmses[name] = float(jnp.sqrt(jnp.mean((pred - y) ** 2)))
    assert rmses["rotated"] < 0.25, rmses
    assert abs(rmses["rotated"] - rmses["plain"]) < 0.1, rmses


def test_pallas_diff_phi_contract(key):
    """TensorGP(contraction='pallas') defaults to diff_phi=True (correct phi
    gradients for public predict); diff_phi=False gives the samplers' fast
    zero-phi-cotangent path (ADVICE round 1, medium)."""
    from gpt_tpu.models import TensorGP, sample_core_indices

    n, r, D, Q, N = 4, 2, 3, 5, 6
    I = sample_core_indices(key, r, D, Q)
    phi = jax.random.normal(jax.random.fold_in(key, 1), (N, D, n)) / np.sqrt(n)
    base = TensorGP(n=n, r=r, D=D, I=I, signal_var=0.1)
    params = base.init_params(jax.random.fold_in(key, 2))
    # add the chain axis the fused kernel expects
    params = jax.tree.map(lambda a: a[None], params)

    def loss(model, ph):
        return jnp.sum(model.predict(params, ph) ** 2)

    ref_model = dataclasses.replace(base, contraction="onehot")
    g_ref = jax.grad(lambda ph: loss(ref_model, ph))(phi)

    pallas_full = dataclasses.replace(base, contraction="pallas")  # default diff_phi=True
    g_full = jax.grad(lambda ph: loss(pallas_full, ph))(phi)
    np.testing.assert_allclose(np.asarray(g_full), np.asarray(g_ref), rtol=1e-4, atol=1e-5)

    pallas_fast = dataclasses.replace(base, contraction="pallas", diff_phi=False)
    g_zero = jax.grad(lambda ph: loss(pallas_fast, ph))(phi)
    assert float(jnp.max(jnp.abs(g_zero))) == 0.0


def test_ep_predict_diag_only(key):
    """predict_ep self-covariances must match the old full-Gram diagonal."""
    from gpt_tpu.inference.ep import fit_ep, predict_ep
    from gpt_tpu.models.exact_gp import se_iso

    N, M = 20, 15
    X = jax.random.normal(key, (N, 2))
    y = jnp.sign(jax.random.normal(jax.random.fold_in(key, 1), (N,)))
    Xs = jax.random.normal(jax.random.fold_in(key, 2), (M, 2))
    kern = se_iso(1.0, 1.0)
    post = fit_ep(kern, X, y, sweeps=10)
    mu, var, prob = predict_ep(kern, post, Xs)
    kss_full = jnp.diagonal(kern(Xs, Xs))
    # the only changed term is kss: check it agrees
    kss_diag = jax.vmap(lambda x: kern(x[None, :], x[None, :])[0, 0])(Xs)
    np.testing.assert_allclose(np.asarray(kss_diag), np.asarray(kss_full), rtol=1e-6)
    assert mu.shape == (M,) and var.shape == (M,) and prob.shape == (M,)
    assert bool(jnp.all(var > 0)) and bool(jnp.all((prob >= 0) & (prob <= 1)))
